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


@functools.lru_cache(maxsize=None)
def load_mini(**overrides):
    """Minimal 2-leg test robot (fast-compiling fused-kernel fixture)."""
    from ..physics.mjcf import load_model

    return load_model(mini_xml(), **overrides)
