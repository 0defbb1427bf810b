#!/usr/bin/env python
"""Cross-family keyword-spotting evaluation (VERDICT r4 item 3).

The spotter's templates come from the formant-additive synthesizer
(family 1, `voice_frontend.synthesize_word`).  This eval feeds it clips
from the source-filter LPC family (family 2, `voice_synth2`) — a
different production model (time-domain glottal-pulse + IIR cascade,
coarticulated formant glides, prosody), not a re-parameterization of the
training generator.  The in-repo analog of handing the reference's
Whisper pipeline (examples/voice_detect.py:17-33) audio from a speaker
and microphone it never saw.

Writes runs/voice_crossfam/metrics.json:
  * speaker matrix (f0 x rate x formant scale) detection accuracy;
  * SNR sweep;
  * discrete-echo room arm;
  * false-accept rate on family-2 NON-vocabulary babble words;
  * phrase-level transcription through the full segmentation pipeline.
"""
import argparse
import itertools
import json
import os

import numpy as np


# nonsense Spanish-like babble (valid phoneme inventory, not in the
# vocabulary) for the false-accept arm
_BABBLE = ["tomale", "pedrina", "casote", "lamito", "rekato", "silupa"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/voice_crossfam")
    ap.add_argument("--seeds", type=int, default=2)
    args = ap.parse_args()

    from opendog_tpu.apps import voice_synth2
    from opendog_tpu.apps.voice_frontend import (
        _PHONEMES, VOCABULARY, KeywordSpotter,
    )
    from opendog_tpu.apps.voice_synth2 import (
        lpc_synthesize_phrase, lpc_synthesize_word,
    )

    spotter = KeywordSpotter()   # templates: family 1, untouched
    words = list(VOCABULARY)

    def accuracy(**kw):
        """Three-outcome tally: the garbage-model rejection makes
        no-decision a distinct (safe) outcome from a wrong word."""
        ok = wrong = rej = n = 0
        misses = []
        for w, seed in itertools.product(words, range(args.seeds)):
            clip = lpc_synthesize_word(w, seed=500 + seed, **kw)
            pred, _ = spotter.classify(clip)
            n += 1
            if pred == w:
                ok += 1
            elif pred is None:
                rej += 1
            else:
                wrong += 1
                misses.append(f"{w}->{pred}")
        return round(ok / n, 3), dict(wrong=round(wrong / n, 3),
                                      rejected=round(rej / n, 3),
                                      misses=misses)

    res = {"vocabulary_size": len(words), "seeds_per_cell": args.seeds,
           "template_family": "formant-additive (voice_frontend)",
           "eval_family": "source-filter LPC (voice_synth2)"}

    # --- cross-family speaker matrix ---
    matrix, all_misses = {}, []
    for fs in (0.92, 1.0, 1.08):
        for f0, rate in ((95.0, 0.85), (130.0, 1.0), (175.0, 1.1),
                         (210.0, 1.0)):
            key = f"formant{fs}_f0{int(f0)}_rate{rate}"
            matrix[key], m = accuracy(formant_scale=fs, f0=f0, rate=rate)
            all_misses += m
            print(key, matrix[key], m, flush=True)
    res["speaker_matrix"] = matrix
    res["speaker_matrix_min"] = min(matrix.values())
    res["speaker_matrix_mean"] = round(
        float(np.mean(list(matrix.values()))), 3)
    res["confusions"] = sorted(set(all_misses))

    # --- SNR sweep ---
    snr_rows = []
    for noise in (0.02, 0.05, 0.1, 0.2):
        sig = lpc_synthesize_word(words[1], seed=500)
        snr_db = round(float(10 * np.log10(
            np.mean(sig ** 2) / noise ** 2)), 1)
        acc, _ = accuracy(noise=noise, f0=130.0)
        snr_rows.append(dict(noise_sigma=noise, approx_snr_db=snr_db,
                             accuracy=acc))
        print(f"noise {noise} (~{snr_db} dB): {acc}", flush=True)
    res["snr_sweep"] = snr_rows

    # --- discrete-echo room ---
    res["room_120ms"], _ = accuracy(room=0.12, f0=125.0)
    res["room_250ms"], _ = accuracy(room=0.25, f0=140.0, rate=0.95)
    print("room 120ms", res["room_120ms"], "250ms", res["room_250ms"],
          flush=True)

    # --- false accepts on family-2 babble (real speech-like audio that
    # is NOT a command — the spotter must reject, not nearest-match) ---
    for w in _BABBLE:
        _PHONEMES.setdefault(w, list(w))
    fa = 0
    for w, seed in itertools.product(_BABBLE, range(2)):
        clip = lpc_synthesize_word(w, f0=120.0, seed=700 + seed)
        pred, _ = spotter.classify(clip)
        fa += int(pred is not None)
    res["false_accept_rate_babble"] = round(fa / (2 * len(_BABBLE)), 3)
    print("babble false accepts:", res["false_accept_rate_babble"],
          flush=True)

    # --- phrase-level: full stream segmentation + wake-word grammar ---
    phrases = [(["perrito", "camina"], "perrito camina"),
               (["perrito", "para"], "perrito para"),
               (["perrito", "derecha"], "perrito derecha")]
    ok = 0
    for ws, want in phrases:
        audio = lpc_synthesize_phrase(ws, f0=125.0, seed=90)
        got = spotter.transcribe(audio)
        ok += int(got == want)
        print(f"phrase {want!r} -> {got!r}", flush=True)
    res["phrase_accuracy"] = round(ok / len(phrases), 3)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps({k: v for k, v in res.items()
                      if k not in ("speaker_matrix", "confusions")}),
          flush=True)


if __name__ == "__main__":
    main()
