from . import adaptive, networks, ppo  # noqa: F401
from .networks import MLPActorCritic  # noqa: F401
from .ppo import Hyper, PPOConfig, make_ppo  # noqa: F401
