#!/usr/bin/env python
"""Held-out-distribution monocular-depth evaluation (VERDICT r3 item 4).

The DepthCNN (apps/mono_depth.py) trains on frames rendered from a fixed
set of terrain realizations and a bounded pose box.  This eval measures
RMSE on data it never saw:

  * held-out GEOMETRY: terrain heightfields from disjoint PRNG seeds
    (new hill/sinusoid/spike realizations);
  * held-out POSES: camera positions outside the training box;
both against the mean-depth predictor baseline.

Honest scope: renderer and terrain FAMILY are shared (same procedural
generator, different draws) — real-camera robustness is out of scope
without camera hardware.  Writes runs/depth_offdist/metrics.json.
"""
import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/depth_offdist")
    ap.add_argument("--train_frames", type=int, default=48)
    ap.add_argument("--eval_frames", type=int, default=16)
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from opendog_tpu.apps.mono_depth import (
        CamConfig, DepthCNN, render_shaded, train_depth_net,
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

    def eval_arm(terrains, pose_fn, seed):
        rng = np.random.default_rng(seed)
        imgs, depths = [], []
        for i in range(args.eval_frames):
            terr = terrains[i % len(terrains)]
            im, d = render_shaded(m, terr, pose_fn(rng), cam=cam,
                                  seed=seed + i)
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

    def in_box(rng):
        return np.array([rng.uniform(-1.5, 1.5), rng.uniform(-1.5, 1.5),
                         rng.uniform(-np.pi, np.pi)], np.float32)

    def out_box(rng):
        r = rng.uniform(1.8, 2.3)
        th = rng.uniform(-np.pi, np.pi)
        return np.array([r * np.cos(th), r * np.sin(th),
                         rng.uniform(-np.pi, np.pi)], np.float32)

    heldout_terr = [terrain_lib.generate_terrain(jax.random.PRNGKey(s), m)
                    for s in range(100, 104)]
    res = dict(
        train=train_metrics,
        heldout_geometry=eval_arm(heldout_terr, in_box, 5000),
        heldout_poses=eval_arm(train_terrains, out_box, 6000),
        heldout_geometry_and_poses=eval_arm(heldout_terr, out_box, 7000),
    )
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
