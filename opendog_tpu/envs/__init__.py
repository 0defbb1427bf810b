from .base import Env, Transition, vector_env  # noqa: F401
from .walk import TurnEnv, WalkEnv  # noqa: F401
from .jump import JumpEnv, LandingEnv  # noqa: F401
from .sim2real_walk import SymWalkEnv, TerrainWalkEnv  # noqa: F401
