"""Audio → command pipeline (VERDICT r2 item 7).

The reference's voice stack is streaming Whisper ASR + Spanish wake word +
command vocabulary (``examples/voice_detect.py:17-33``,
``udp_voice.py:248-325``).  These tests exercise the network-free front-end
end to end: synthesized keyword audio (different speaker f0/rate/noise than
the matcher's templates) → log-mel/MFCC features (JAX) → DTW spotting →
transcript → ``voice.parse_command`` → gait-machine transitions.
"""
import numpy as np
import pytest

from opendog_tpu.apps.voice import (
    GaitMode,
    RobotCommand,
    VoiceGaitMachine,
    parse_command,
)
from opendog_tpu.apps.voice_frontend import (
    VOCABULARY,
    KeywordSpotter,
    make_dtw_transcriber,
    segment_stream,
    synthesize_phrase,
    synthesize_word,
)


@pytest.fixture(scope="module")
def spotter():
    return KeywordSpotter()


def test_every_keyword_recognized_across_speakers(spotter):
    """Each vocabulary word, synthesized at speaker settings NOT in the
    template set and with added noise, must classify correctly."""
    for w in VOCABULARY:
        for f0, rate, noise, seed in ((125.0, 1.05, 0.02, 1),
                                      (100.0, 0.95, 0.03, 2)):
            clip = synthesize_word(w, f0=f0, rate=rate, noise=noise,
                                   seed=seed)
            got, score = spotter.classify(clip)
            assert got == w, f"{w}: got {got} (score {score:.3f})"


def test_offdist_speaker_floor(spotter):
    """Off-distribution floor (VERDICT r3 item 4): perturbation axes the
    templates are NEVER built with — formant shift (vocal-tract length),
    vibrato, reverb — must still classify; and an extreme shift must
    degrade (proves the eval can fail).  Full matrix + SNR sweep:
    scripts/voice_offdist_eval.py -> runs/voice_offdist/ (measured
    2026-08-19: 1.0 through formant 0.88-1.12 x f0 90-210 x rate
    0.85-1.2, vibrato 0.5 st, reverb 120 ms, SNR >= -1 dB; breaks at
    formant 1.4)."""
    words = ["perrito", "camina", "izquierda"]
    for w in words:
        for kw in (dict(formant_scale=0.9, f0=95.0, rate=0.9),
                   dict(formant_scale=1.1, f0=180.0, rate=1.15),
                   dict(vibrato=0.4, reverb_s=0.08, f0=140.0)):
            clip = synthesize_word(w, seed=31, **kw)
            pred, _ = spotter.classify(clip)
            assert pred == w, (w, kw, pred)
    # sanity: an extreme vocal-tract shift must NOT classify perfectly
    wrong = sum(
        spotter.classify(synthesize_word(w, seed=31,
                                         formant_scale=1.45))[0] != w
        for w in words)
    assert wrong >= 1


def test_noise_clip_rejected(spotter):
    rng = np.random.default_rng(0)
    got, score = spotter.classify(rng.normal(0, 1, 8000).astype(np.float32))
    assert got is None, f"pure noise accepted as {got} ({score:.3f})"


def test_segmentation_finds_words():
    audio = synthesize_phrase(["perrito", "para"], f0=120.0, seed=4)
    segs = segment_stream(audio)
    assert len(segs) == 2


def test_audio_drives_gait_machine(spotter):
    """The VERDICT item-7 contract: generated audio of 'perrito'/'camina'/
    'para' decodes into gait-machine transitions."""
    fsm = VoiceGaitMachine()
    transcribe = spotter.transcribe

    audio = synthesize_phrase(["perrito", "camina"], f0=140.0, rate=1.08,
                              noise=0.02, seed=11)
    cmd = parse_command(transcribe(audio))
    assert cmd == RobotCommand.WALK
    assert fsm.apply(cmd) == GaitMode.WALKING

    audio = synthesize_phrase(["perrito", "para"], f0=105.0, rate=0.92,
                              noise=0.03, seed=12)
    cmd = parse_command(transcribe(audio))
    assert cmd == RobotCommand.STOP
    assert fsm.apply(cmd) == GaitMode.IDLE

    # no activation word -> no command, mode unchanged (udp_voice.py:248)
    audio = synthesize_phrase(["camina"], f0=120.0, seed=13)
    assert parse_command(transcribe(audio)) is None
    assert fsm.apply(None) == GaitMode.IDLE


def test_make_dtw_transcriber_interface():
    t = make_dtw_transcriber()
    audio = synthesize_phrase(["perrito", "izquierda"], f0=130.0, seed=21)
    text = t(audio)
    assert "perrito" in text and "izquierda" in text
    fsm = VoiceGaitMachine()
    assert fsm.apply(parse_command(text)) == GaitMode.TURNING_LEFT
