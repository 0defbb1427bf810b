from .model import Contact, Model, State, StepInfo, Terrain  # noqa: F401
from .mjcf import load_model  # noqa: F401
from . import dynamics, spatial  # noqa: F401


def make_state(model, key_name: str = "home"):
    """Initial :class:`State` from a keyframe (or zeros if absent)."""
    import jax.numpy as jnp

    if model.key_names and key_name in model.key_names:
        qpos = jnp.asarray(model.key_qpos[model.key_id(key_name)])
    else:
        qpos = jnp.zeros(model.nq, dtype=jnp.float32)
    return State(
        qpos=qpos,
        qvel=jnp.zeros(model.nv, dtype=qpos.dtype),
        time=jnp.zeros((), dtype=qpos.dtype),
    )
