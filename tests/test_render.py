import os

import numpy as np
import jax

from opendog_tpu.assets import load_opendog
from opendog_tpu.physics import dynamics, make_state
from opendog_tpu.utils.render import record_rollout, render_frame


def test_render_frame_and_video(tmp_path):
    m = load_opendog("flat")
    s = make_state(m, "home")
    ax = render_frame(m, s)
    assert ax is not None
    # roll a short settle and record a gif
    states = [s]
    step = jax.jit(lambda st: dynamics.step(m, st, m.key_ctrl[0],
                                            n_substeps=10)[0])
    for _ in range(5):
        states.append(step(states[-1]))
    path = str(tmp_path / "roll.gif")
    n = record_rollout(m, states, path, fps=10)
    assert n == 6
    assert os.path.getsize(path) > 1000
