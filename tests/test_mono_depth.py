"""Monocular depth predictor (round-2 VERDICT missing #3).

``examples/2d.py`` runs Depth-Anything-V2; the TPU-native stack trains its
own small conv net on sim-rendered (shaded image, depth) pairs and serves
it through the same pluggable-predictor loop as ``apps/depth.py``.
"""
import numpy as np
import pytest
import jax

from opendog_tpu.apps.mono_depth import (
    DepthCNN,
    make_sim_predictor,
    render_shaded,
    train_depth_net,
)
from opendog_tpu.assets import load_opendog
from opendog_tpu.physics.terrain import generate_terrain


@pytest.fixture(scope="module")
def trained():
    m = load_opendog("terrain")
    terrs = [generate_terrain(jax.random.PRNGKey(k), m) for k in (0, 2)]
    params, metrics = train_depth_net(m, terrs, n_train=24, n_val=8,
                                      steps=150, seed=0)
    return m, terrs, params, metrics


def test_shaded_frame_aligned_with_depth():
    m = load_opendog("terrain")
    terr = generate_terrain(jax.random.PRNGKey(0), m)
    img, depth = render_shaded(m, terr, np.array([0.2, 0.1, 0.0]))
    assert img.shape == (24, 32) and depth.shape == (24, 32)
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert np.isfinite(depth).all() and depth.min() > 0.05
    # nearer rows (bottom of frame, steeper rays) must be closer on average
    assert depth[-4:].mean() < depth[:4].mean()


def test_depth_net_beats_mean_baseline(trained):
    _, _, _, metrics = trained
    assert metrics["beats_baseline"], metrics
    assert metrics["val_rmse_m"] < 0.5 * metrics[
        "mean_depth_baseline_rmse_m"], metrics


def test_depth_net_generalizes_to_heldout_geometry(trained):
    """Held-out-distribution floor (VERDICT r3 item 4): frames from
    terrain REALIZATIONS the net never trained on (disjoint PRNG seeds)
    must still beat the mean-depth baseline.  Full matrix incl. held-out
    poses: scripts/depth_offdist_eval.py -> runs/depth_offdist/."""
    import jax.numpy as jnp

    m, _, params, _ = trained
    heldout = [generate_terrain(jax.random.PRNGKey(k), m)
               for k in (101, 103)]
    rng = np.random.default_rng(42)
    imgs, depths = [], []
    for i in range(8):
        pose = np.array([rng.uniform(-1.5, 1.5), rng.uniform(-1.5, 1.5),
                         rng.uniform(-np.pi, np.pi)], np.float32)
        im, d = render_shaded(m, heldout[i % 2], pose, seed=900 + i)
        imgs.append(im)
        depths.append(d)
    x = jnp.asarray(np.stack(imgs)[..., None])
    y = np.stack(depths)
    pred = np.asarray(jax.jit(DepthCNN().apply)(params, x))
    rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
    base = float(np.sqrt(np.mean((y.mean() - y) ** 2)))
    assert rmse < base, (rmse, base)


def test_predictor_serves_depth_stream(trained):
    """The trained net plugs into the reference's display-loop interface
    (apps/depth.py depth_stream: frames in, normalized depth out)."""
    from opendog_tpu.apps.depth import depth_stream, normalize_depth

    m, terrs, params, _ = trained
    pred = make_sim_predictor(params)
    img, depth = render_shaded(m, terrs[0], np.array([0.4, -0.3, 0.5]),
                               seed=5)
    # predictor accepts RGB uint8 frames like a webcam source
    rgb = (np.stack([img] * 3, axis=-1) * 255).astype(np.uint8)
    outs = list(depth_stream(iter([rgb]), pred))
    assert len(outs) == 1
    d, d_u8 = outs[0]
    assert d.shape == (24, 32)
    assert d_u8.dtype == np.uint8 and d_u8.max() <= 255
    # prediction correlates strongly with ground truth
    cc = np.corrcoef(d.ravel(), depth.ravel())[0, 1]
    assert cc > 0.8, cc
