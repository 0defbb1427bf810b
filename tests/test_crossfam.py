"""Generator-INDEPENDENT perception floors (VERDICT r4 item 3).

The full cross-family evals live in scripts/voice_crossfam_eval.py and
scripts/depth_crossfam_eval.py (measured 2026-08-19: voice speaker-matrix
mean 0.977 / min 0.889 across f0 95-210 x rate 0.85-1.1 x formant
0.92-1.08, babble false-accepts 0.5 vs 1.0 pre-rejection; depth
fam2-terrain RMSE 0.136 m, fam2-renderer 0.259 m, both 0.279 m — all
beating the mean-depth baseline).  These tests pin cheap floors so a
regression in either generator pairing fails the gate, not just the
next eval re-run.
"""
import numpy as np
import pytest
import jax

from opendog_tpu.apps.voice_frontend import _PHONEMES, KeywordSpotter
from opendog_tpu.apps.voice_synth2 import (
    lpc_synthesize_phrase, lpc_synthesize_word,
)


@pytest.fixture(scope="module")
def spotter():
    return KeywordSpotter()


def test_crossfam_voice_floor(spotter):
    """Family-2 (source-filter LPC) clips classify against family-1
    (formant-additive) templates across distinct speakers.  Floor, not
    perfection: >= 13/15 correct, and at most one WRONG word (a rejection
    at an extreme speaker cell is the safe outcome, a misclassification
    is not)."""
    ok = wrong = 0
    fails = []
    for w in ("perrito", "camina", "para", "izquierda", "sientate"):
        for kw in (dict(f0=120.0), dict(f0=95.0, rate=0.9),
                   dict(f0=180.0, rate=1.1, formant_scale=1.08)):
            clip = lpc_synthesize_word(w, seed=7, **kw)
            got, score = spotter.classify(clip)
            ok += int(got == w)
            wrong += int(got is not None and got != w)
            if got != w:
                fails.append(f"{w} {kw}: got {got} ({score:.3f})")
    assert ok >= 13 and wrong <= 1, (ok, wrong, fails)


def test_crossfam_phrase_through_wake_word_grammar(spotter):
    """Full pipeline on family-2 audio: segmentation + wake-word grammar
    (forced-choice decode after 'perrito')."""
    audio = lpc_synthesize_phrase(["perrito", "derecha"], f0=130.0, seed=5)
    assert spotter.transcribe(audio) == "perrito derecha"


def test_babble_rejection(spotter):
    """Speech-like NON-vocabulary words must not all nearest-match: the
    garbage-model rejection (filler-normalized DTW score) holds its
    measured operating point (<= half accepted) — pre-rejection this
    was 100% false accepts."""
    babble = ["tomale", "pedrina", "casote", "lamito", "rekato", "silupa"]
    for b in babble:
        _PHONEMES.setdefault(b, list(b))
    accepted = sum(
        spotter.classify(lpc_synthesize_word(b, f0=120.0, seed=701))[0]
        is not None for b in babble)
    assert accepted <= len(babble) // 2, f"{accepted}/{len(babble)} accepted"


def test_crossfam_depth_beats_baseline():
    """A depth net trained on family-1 frames must beat the mean-depth
    baseline on family-2 terrain AND family-2 shading (small-sample
    version of scripts/depth_crossfam_eval.py)."""
    from opendog_tpu.apps.mono_depth import (
        render_shaded_overcast, train_depth_net, DepthCNN,
    )
    from opendog_tpu.assets import load_opendog
    from opendog_tpu.physics.terrain import (
        generate_terrain, generate_terrain_fractal,
    )
    import jax.numpy as jnp

    m = load_opendog("terrain")
    terrs = [generate_terrain(jax.random.PRNGKey(k), m) for k in (0, 2)]
    params, _ = train_depth_net(m, terrs, n_train=24, n_val=8,
                                steps=150, seed=0)
    net = DepthCNN()
    fam2 = [generate_terrain_fractal(jax.random.PRNGKey(k), m)
            for k in (300, 301)]
    rng = np.random.default_rng(3)
    imgs, deps = [], []
    for i in range(6):
        pose = np.array([rng.uniform(-1.2, 1.2), rng.uniform(-1.2, 1.2),
                         rng.uniform(-np.pi, np.pi)], np.float32)
        im, d = render_shaded_overcast(m, fam2[i % 2], pose, seed=40 + i)
        imgs.append(im)
        deps.append(d)
    x = jnp.asarray(np.stack(imgs)[..., None])
    y = np.stack(deps)
    pred = np.asarray(jax.jit(net.apply)(params, x))
    rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
    base = float(np.sqrt(np.mean((y.mean() - y) ** 2)))
    assert np.isfinite(rmse) and rmse < base, (rmse, base)
