#!/usr/bin/env python
"""Cross-family monocular-depth evaluation (VERDICT r4 item 3).

The DepthCNN trains exactly as in `scripts/depth_offdist_eval.py`
(family-1 terrain `terrain.generate_terrain` + family-1 sun-shaded
renderer `mono_depth.render_shaded`).  This eval then measures the
UNTOUCHED net on frames whose GENERATORS it never saw:

  * family-2 terrain: spectral-fBm + terraces + craters
    (`terrain.generate_terrain_fractal`) — different procedural model,
    not different draws of the same one;
  * family-2 appearance: overcast dome + aerial fog + albedo texture +
    vignette + shot noise (`mono_depth.render_shaded_overcast`) —
    different shading physics over the same ground-truth geometry;
  * both at once.

The in-repo analog of pointing the reference's Depth-Anything webcam
loop (examples/2d.py:15-44) at an unfamiliar scene.  Baseline: the
mean-depth predictor.  Writes runs/depth_crossfam/metrics.json.
"""
import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/depth_crossfam")
    ap.add_argument("--train_frames", type=int, default=48)
    ap.add_argument("--eval_frames", type=int, default=16)
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from opendog_tpu.apps.mono_depth import (
        CamConfig, DepthCNN, render_shaded, render_shaded_overcast,
        train_depth_net,
    )
    from opendog_tpu.assets import load_opendog
    from opendog_tpu.physics import terrain as terrain_lib

    m = load_opendog("terrain")
    cam = CamConfig()
    train_terrains = [terrain_lib.generate_terrain(jax.random.PRNGKey(s), m)
                      for s in range(4)]
    params, train_metrics = train_depth_net(
        m, train_terrains, n_train=args.train_frames, n_val=12,
        steps=args.steps, cam=cam, seed=0)
    net = DepthCNN()
    japply = jax.jit(net.apply)

    def eval_arm(terrains, renderer, seed):
        rng = np.random.default_rng(seed)
        imgs, depths = [], []
        for i in range(args.eval_frames):
            terr = terrains[i % len(terrains)]
            pose = np.array([rng.uniform(-1.5, 1.5),
                             rng.uniform(-1.5, 1.5),
                             rng.uniform(-np.pi, np.pi)], np.float32)
            im, d = renderer(m, terr, pose, cam=cam, seed=seed + i)
            imgs.append(im)
            depths.append(d)
        x = jnp.asarray(np.stack(imgs)[..., None])
        y = np.stack(depths)
        pred = np.asarray(japply(params, x))
        rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
        base = float(np.sqrt(np.mean((y.mean() - y) ** 2)))
        return dict(rmse_m=round(rmse, 4),
                    mean_depth_baseline_rmse_m=round(base, 4),
                    beats_baseline=bool(rmse < base))

    fam2_terr = [terrain_lib.generate_terrain_fractal(
        jax.random.PRNGKey(s), m) for s in range(200, 204)]
    res = dict(
        train=train_metrics,
        train_family=("generate_terrain + render_shaded "
                      "(sun-lambert, inverse-square)"),
        fam2_terrain=eval_arm(fam2_terr, render_shaded, 8000),
        fam2_renderer=eval_arm(train_terrains, render_shaded_overcast,
                               9000),
        fam2_both=eval_arm(fam2_terr, render_shaded_overcast, 10000),
    )
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
