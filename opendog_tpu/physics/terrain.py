"""Procedural heightfield terrain — JAX PRNG port of the reference's
per-episode terrain generator (``sim2real/train2.py:203-292``).

Semantics preserved: 50% flat episodes; otherwise a randomized flat spawn
circle (radius U[0.1, 0.4]) around the robot start, per-cell uniform noise +
per-cell random-frequency sinusoid + 20%-probability spikes outside it,
1.5x amplification near the circle boundary, 4 masked 3x3 smoothing passes
(factor 0.3), then min-max normalisation into [0, 1] and scaling into world
height ``base_z + norm * z_extent`` (hfield size 5 x 5 x 0.3 x 0.001,
walking_scene.xml:19).  Flat episodes sit at normalized 0.5 → 0.151 m.

Everything is vectorised and jit-able so a fresh terrain per env per episode
is free inside the batched reset.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .model import Model, Terrain

MAX_ABS_HEIGHT = 1.5      # train2.py:111
SMOOTH_FACTOR = 0.3       # train2.py:112
SMOOTH_PASSES = 4         # train2.py:113
SPIKE_PROB = 0.2          # train2.py:247
FLAT_PROB = 0.5           # train2.py:206


def _smooth_pass(h, mask):
    """One masked 3x3 mean-blend pass (interior cells only)."""
    p = jnp.pad(h, 1, mode="edge")
    acc = jnp.zeros_like(h)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            acc = acc + p[1 + dr : 1 + dr + h.shape[0],
                          1 + dc : 1 + dc + h.shape[1]]
    avg = acc / 9.0
    blended = h * (1 - SMOOTH_FACTOR) + avg * SMOOTH_FACTOR
    out = jnp.where(mask, blended, h)
    # interior only (reference loops r,c in [1, N-2])
    out = out.at[0, :].set(h[0, :]).at[-1, :].set(h[-1, :])
    out = out.at[:, 0].set(h[:, 0]).at[:, -1].set(h[:, -1])
    return out


def generate_terrain(
    key: jax.Array,
    model: Model,
    robot_start_xy=(0.0, 0.0),
) -> Terrain:
    """Sample one episode terrain (heights in meters on the model's hfield
    grid; rows follow world y, columns world x)."""
    nrow, ncol = model.hfield_nrow, model.hfield_ncol
    assert nrow > 0 and ncol > 0, "model has no heightfield scene"
    size = model.hfield_size  # (x_radius, y_radius, z_extent, base_z) numpy
    sx, sy, sz, base = float(size[0]), float(size[1]), float(size[2]), float(size[3])

    keys = jax.random.split(key, 7)
    xs = jnp.linspace(-sx, sx, ncol)
    ys = jnp.linspace(-sy, sy, nrow)
    wx = xs[None, :]  # (1, ncol)
    wy = ys[:, None]  # (nrow, 1)
    dist = jnp.sqrt(
        (wx - robot_start_xy[0]) ** 2 + (wy - robot_start_xy[1]) ** 2
    )  # (nrow, ncol)

    flat_radius = jax.random.uniform(keys[0], minval=0.1, maxval=0.4)
    outside = dist >= flat_radius

    base_h = jax.random.uniform(
        keys[1], (nrow, ncol), minval=-MAX_ABS_HEIGHT, maxval=MAX_ABS_HEIGHT
    )
    freq_x = jax.random.uniform(keys[2], (nrow, ncol), minval=0.2, maxval=0.6)
    freq_y = jax.random.uniform(keys[3], (nrow, ncol), minval=0.2, maxval=0.6)
    position_noise = (
        jnp.sin(wx * freq_x) * jnp.cos(wy * freq_y)
        + jnp.sin(wx * freq_x * 2) * jnp.cos(wy * freq_y * 2)
    ) * (MAX_ABS_HEIGHT * 0.7)
    spike_mask = jax.random.uniform(keys[4], (nrow, ncol)) < SPIKE_PROB
    spikes = spike_mask * jax.random.uniform(
        keys[5], (nrow, ncol),
        minval=-MAX_ABS_HEIGHT * 0.8, maxval=MAX_ABS_HEIGHT * 0.8,
    )
    raw = (base_h + position_noise + spikes) * outside
    boundary = jnp.abs(dist - flat_radius) < 1.0
    raw = jnp.where(outside & boundary, raw * 1.5, raw)

    h = raw
    for _ in range(SMOOTH_PASSES):
        h = _smooth_pass(h, outside)

    mn, mx = jnp.min(h), jnp.max(h)
    norm = jnp.where(mx <= mn + 1e-4, jnp.full_like(h, 0.5), (h - mn) / (mx - mn))

    is_flat = jax.random.uniform(keys[6]) < FLAT_PROB
    norm = jnp.where(is_flat, jnp.full_like(norm, 0.5), norm)
    return Terrain(height=base + norm * sz)


def generate_terrain_fractal(
    key: jax.Array,
    model: Model,
    robot_start_xy=(0.0, 0.0),
) -> Terrain:
    """Second, independent terrain family (VERDICT r4 item 3): spectral
    fBm + terraces + craters, for generator-held-out perception evals.

    Structurally disjoint from :func:`generate_terrain` (the reference's
    per-cell-noise + sinusoid + spike model, train2.py:203-292): heights
    come from power-law-filtered Fourier noise (fractal Brownian
    surface, spectral exponent U[1.6, 2.4]), partially quantized into
    terraced steps, with 1-3 smooth Gaussian craters.  No flat episodes,
    no spike field, no boundary amplification, no box smoothing.  Output
    occupies the same normalized [0, 1] -> world-height range so models
    trained on family 1 see in-range but out-of-family geometry."""
    nrow, ncol = model.hfield_nrow, model.hfield_ncol
    size = model.hfield_size
    sx, sy = float(size[0]), float(size[1])
    sz, base = float(size[2]), float(size[3])
    keys = jax.random.split(key, 8)

    # spectral synthesis: white noise shaped by |k|^-beta
    beta = jax.random.uniform(keys[0], minval=1.6, maxval=2.4)
    spec = (jax.random.normal(keys[1], (nrow, ncol))
            + 1j * jax.random.normal(keys[2], (nrow, ncol)))
    ky = jnp.fft.fftfreq(nrow)[:, None]
    kx = jnp.fft.fftfreq(ncol)[None, :]
    kk = jnp.sqrt(kx ** 2 + ky ** 2)
    filt = jnp.where(kk > 0, kk ** (-beta), 0.0)
    h = jnp.real(jnp.fft.ifft2(spec * filt))

    # terracing: blend toward quantized levels (stepped mesas)
    mn, mx = jnp.min(h), jnp.max(h)
    hn = (h - mn) / (mx - mn + 1e-9)
    n_steps = 4.0 + jnp.floor(jax.random.uniform(keys[6]) * 4.0)
    terr_w = jax.random.uniform(keys[7], minval=0.3, maxval=0.8)
    hn = terr_w * jnp.round(hn * n_steps) / n_steps + (1 - terr_w) * hn

    # craters: smooth Gaussian depressions at random sites
    xs = jnp.linspace(-sx, sx, ncol)[None, :]
    ys = jnp.linspace(-sy, sy, nrow)[:, None]
    sites = jax.random.uniform(keys[4], (3, 2), minval=-0.7 * sx,
                               maxval=0.7 * sx)
    radii = jax.random.uniform(keys[5], (3,), minval=0.3, maxval=1.0)
    for i in range(3):
        d2 = (xs - sites[i, 0]) ** 2 + (ys - sites[i, 1]) ** 2
        hn = hn - 0.35 * jnp.exp(-d2 / (2 * radii[i] ** 2))

    # flat spawn disk (the robot still needs somewhere to stand)
    dist = jnp.sqrt((xs - robot_start_xy[0]) ** 2
                    + (ys - robot_start_xy[1]) ** 2)
    spawn = jnp.clip(dist / 0.35, 0.0, 1.0)
    hn = 0.5 + (hn - 0.5) * spawn
    hn = jnp.clip((hn - jnp.min(hn)) / (jnp.max(hn) - jnp.min(hn) + 1e-9),
                  0.0, 1.0)
    return Terrain(height=base + hn * sz)


def flat_terrain(model: Model) -> Terrain:
    """The 'flat episode' terrain: normalized 0.5 everywhere (0.151 m)."""
    size = model.hfield_size
    h = float(size[3]) + 0.5 * float(size[2])
    return Terrain(
        height=jnp.full((model.hfield_nrow, model.hfield_ncol), h, jnp.float32)
    )
