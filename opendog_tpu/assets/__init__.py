"""Built-in robot descriptions (programmatic, no external asset files)."""
from __future__ import annotations

import functools

from .go1 import go1_xml
from .mini import mini_xml
from .opendog import opendog_xml


@functools.lru_cache(maxsize=None)
def load_opendog(scene: str = "flat", **overrides):
    """OpenDOG 8-DoF model (reference: our_robot.xml).  scene: flat|terrain|none."""
    from ..physics.mjcf import load_model

    return load_model(opendog_xml(scene), **overrides)


@functools.lru_cache(maxsize=None)
def load_go1(scene: str = "flat", **overrides):
    """Go1 12-DoF model (reference: go1.xml).  scene: flat|jump|landing|none."""
    from ..physics.mjcf import load_model

    return load_model(go1_xml(scene), **overrides)


def go1_oracle_contact(model):
    """Oracle-matched contact variant of a loaded Go1 model (cross-engine
    parity, VERDICT r4 item 5).

    The production plant keeps the crisp penalty foot (one fused-kernel
    contact path); this variant enables, on the FOOT pads only, the two
    published contact semantics of the reference model our default
    simplifies away — measured effects on the 6 s / 0.5 m/s open-loop
    trot vs MuJoCo 3.10 (each arm isolated before combining):

      * progressive impedance (go1.xml:62 solimp="0.015 1 0.023"):
        touchdown is soft, full stiffness at 23 mm — 2.875 -> 2.825 m;
      * condim=6 torsional+rolling friction (friction "0.8 0.02 0.01"):
        locks the stance foot's free pivot (a sphere foot otherwise
        rolls like a wheel) — -> 2.727 m;
      * base foot stiffness 26x the soft-pad 2370 N/m (the impedance
        ramp now carries the softness; matches the oracle ride height
        0.254 m) and 10x tangential regularisation (the cone solver's
        breakaway slip) — -> 2.628 m vs oracle 2.518 m.

    Result: trunk-x RMSE 2.74% of distance traveled (was 8.26%), joint
    RMSE 8 mrad (was 30); pinned by
    tests/test_golden_gait_replay.py::test_go1_cmd_trot_parity."""
    import numpy as np
    import jax.numpy as jnp

    gs = np.asarray(model.geom_stiffness)
    gd = np.asarray(model.geom_damping)
    feet = np.isclose(gs, 2370.0)  # the explicit-solref foot pads
    return model.replace(
        geom_stiffness=jnp.asarray(np.where(feet, gs * 26.0, gs)),
        geom_damping=jnp.asarray(np.where(feet, gd * np.sqrt(26.0), gd)),
        geom_imp_dmin=jnp.asarray(np.where(feet, 0.015, 1.0), jnp.float32),
        geom_imp_width=jnp.asarray(np.where(feet, 0.023, 1.0),
                                   jnp.float32),
        friction_smoothing=model.friction_smoothing * 10.0,
    )


@functools.lru_cache(maxsize=None)
def load_mini(**overrides):
    """Minimal 2-leg test robot (fast-compiling fused-kernel fixture)."""
    from ..physics.mjcf import load_model

    return load_model(mini_xml(), **overrides)
