from .mesh import (  # noqa: F401
    env_mesh,
    initialize_distributed,
    replicate,
    shard_batch,
    sample_mesh,
)
from .rollout import make_sharded_ppo, scaling_efficiency  # noqa: F401
