from .gaits import (  # noqa: F401
    autocorrect_trot_cycle,
    motor_bringup,
    play_gait,
    safe_shutdown,
    stabilization_targets,
    stabilize,
    stance_vector,
    walk_straight,
)
from .mpc_bridge import (  # noqa: F401
    MPCBridge,
    make_bridge,
    read_measured_angles,
)
from .slam import (  # noqa: F401
    CamConfig,
    TerrainLocalizer,
    point_to_plane_icp,
    render_depth,
    simulate_walk_localization,
)
from .voice_frontend import (  # noqa: F401
    KeywordSpotter,
    make_dtw_transcriber,
    synthesize_phrase,
    synthesize_word,
)
from .run_policy import (  # noqa: F401
    action_to_target_degrees,
    build_observation,
    run_policy_loop,
    VelocityEstimator,
)
