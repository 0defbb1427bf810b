#!/usr/bin/env python
"""Off-distribution keyword-spotting evaluation (VERDICT r3 item 4).

The KeywordSpotter's templates are built from the formant synthesizer at
three (f0, rate) speaker settings with NO formant shift, NO vibrato, NO
reverb and NO noise.  This eval measures detection accuracy on audio the
template builder never produces:

  * held-out speaker axes: formant scale (vocal-tract length) x pitch x
    rate x vibrato x room reverb — parameters outside the template set;
  * additive-noise SNR sweep (accuracy vs SNR dB);
  * false-accept check on pure noise bursts.

Honest scope: the synthesizer family is shared (same phoneme model); the
held-out axes are the perturbation PARAMETERS, not a different recording
pipeline — real-microphone robustness remains unproven without audio I/O
(docs/PARITY.md udp_voice row).  Writes runs/voice_offdist/metrics.json.
"""
import argparse
import itertools
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/voice_offdist")
    ap.add_argument("--seeds", type=int, default=2)
    args = ap.parse_args()

    from opendog_tpu.apps.voice_frontend import (
        VOCABULARY, KeywordSpotter, synthesize_word, _noise_band,
    )

    spotter = KeywordSpotter()
    words = list(VOCABULARY)

    def accuracy(**synth_kw):
        ok = n = 0
        for w, seed in itertools.product(words, range(args.seeds)):
            clip = synthesize_word(w, seed=100 + seed, **synth_kw)
            pred, _ = spotter.classify(clip)
            ok += int(pred == w)
            n += 1
        return round(ok / n, 3)

    res = {"vocabulary_size": len(words), "seeds_per_cell": args.seeds}

    # --- held-out speaker matrix: formant scale x (f0, rate) ---
    matrix = {}
    for fs in (0.88, 0.94, 1.06, 1.12):
        for f0, rate in ((90.0, 0.85), (170.0, 1.2), (210.0, 1.0)):
            key = f"formant{fs}_f0{int(f0)}_rate{rate}"
            matrix[key] = accuracy(formant_scale=fs, f0=f0, rate=rate)
            print(key, matrix[key], flush=True)
    res["speaker_matrix"] = matrix
    res["speaker_matrix_min"] = min(matrix.values())
    res["speaker_matrix_mean"] = round(
        float(np.mean(list(matrix.values()))), 3)

    # --- vibrato + reverb arms (never in templates) ---
    res["vibrato_0.5st"] = accuracy(vibrato=0.5, f0=140.0)
    res["reverb_120ms"] = accuracy(reverb_s=0.12, f0=125.0, rate=1.05)
    res["vibrato_and_reverb"] = accuracy(vibrato=0.4, reverb_s=0.08,
                                         f0=160.0, rate=0.9,
                                         formant_scale=1.06)
    print("vibrato", res["vibrato_0.5st"], "reverb", res["reverb_120ms"],
          "both", res["vibrato_and_reverb"], flush=True)

    # --- SNR sweep (white noise; signal is peak-normalized to 1) ---
    snr_rows = []
    for noise in (0.02, 0.05, 0.1, 0.2, 0.3):
        # empirical SNR over the synthesized set
        sig = synthesize_word(words[0], seed=100)
        snr_db = round(float(10 * np.log10(
            np.mean(sig ** 2) / noise ** 2)), 1)
        acc = accuracy(noise=noise, f0=135.0, rate=1.1)
        snr_rows.append(dict(noise_sigma=noise, approx_snr_db=snr_db,
                             accuracy=acc))
        print(f"noise {noise} (~{snr_db} dB): {acc}", flush=True)
    res["snr_sweep"] = snr_rows

    # --- stress: push until it degrades (a perfect matrix alone is not
    # evidence — the breaking point locates the robustness boundary) ---
    stress = {}
    for fs in (0.8, 1.25, 1.4):
        stress[f"formant{fs}"] = accuracy(formant_scale=fs, f0=140.0)
    for noise in (0.5, 0.8, 1.2):
        sig = synthesize_word(words[0], seed=100)
        snr_db = round(float(10 * np.log10(
            np.mean(sig ** 2) / noise ** 2)), 1)
        stress[f"noise{noise}_snr{snr_db}dB"] = accuracy(
            noise=noise, f0=135.0)
    stress["worst_combo"] = accuracy(formant_scale=1.2, vibrato=0.6,
                                     reverb_s=0.15, noise=0.3,
                                     f0=185.0, rate=1.25)
    res["stress"] = stress
    print("stress:", json.dumps(stress), flush=True)

    # --- false accepts on non-speech noise bursts ---
    rng = np.random.default_rng(0)
    fa = 0
    n_noise = 20
    for i in range(n_noise):
        center = rng.uniform(300, 3000)
        clip = _noise_band(center, rng.uniform(0.2, 0.5), rng)
        clip = clip / (np.abs(clip).max() + 1e-9)
        pred, _ = spotter.classify(clip.astype(np.float32))
        fa += int(pred is not None)
    res["false_accept_rate_noise"] = round(fa / n_noise, 3)
    print("false accepts:", res["false_accept_rate_noise"], flush=True)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps({k: v for k, v in res.items()
                      if k != "speaker_matrix"}), flush=True)


if __name__ == "__main__":
    main()
