"""Log-mel frontend parity vs the HF SeamlessM4T feature extractor.

The reference pipeline featurises audio with ``AutoFeatureExtractor`` for
``facebook/w2v-bert-2.0`` (reference processor.py:101-105); our TPU frontend must
reproduce those numerics. The HF extractor class is constructed locally from defaults
(no network), and used purely as a test oracle.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from speech_transcript_embeddings_tpu.config import FrontendConfig
from speech_transcript_embeddings_tpu.ops import frontend as fe


@pytest.fixture(scope="module")
def hf_extractor():
    from transformers import SeamlessM4TFeatureExtractor
    return SeamlessM4TFeatureExtractor()


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_mel_filters_match_hf(hf_extractor):
    cfg = FrontendConfig()
    ours = fe.make_mel_filters(cfg)
    np.testing.assert_allclose(ours, hf_extractor.mel_filters, rtol=1e-10, atol=1e-12)


def test_frame_transform_matches_windowed_rfft():
    cfg = FrontendConfig()
    tr = fe.make_frame_transform(cfg)
    x = np.random.default_rng(1).normal(size=cfg.frame_length)
    # oracle: the HF per-frame chain (remove DC → preemphasis → window → rfft)
    buf = x - x.mean()
    out = buf.copy()
    out[1:] -= cfg.preemphasis * buf[:-1]
    out[0] *= 1 - cfg.preemphasis
    out *= np.hanning(cfg.frame_length) ** 0.85
    ref = np.fft.rfft(out, cfg.fft_length)
    got = x @ tr
    n_freq = cfg.fft_length // 2 + 1
    np.testing.assert_allclose(got[:n_freq], ref.real, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(got[n_freq:], ref.imag, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("n_samples", [1000, 16000, 47997])
def test_features_match_hf_single(hf_extractor, rng, n_samples):
    cfg = FrontendConfig()
    audio = rng.normal(size=n_samples).astype(np.float32) * 0.1
    ref = hf_extractor(audio, sampling_rate=16000, return_tensors="np")
    ref_feats = ref["input_features"][0]
    ref_mask = ref["attention_mask"][0]

    # pad to a bucket length and run ours
    bucket = 48000
    padded = np.zeros(bucket, np.float32)
    padded[:n_samples] = audio
    front = fe.LogMelFrontend(cfg)
    feats, mask = front(jnp.asarray(padded)[None], jnp.asarray([n_samples]))
    feats, mask = np.asarray(feats[0]), np.asarray(mask[0])

    t_ref = ref_feats.shape[0]
    assert int(mask.sum()) == int(ref_mask.sum())
    valid = ref_mask.astype(bool)
    np.testing.assert_allclose(
        feats[:t_ref][valid], ref_feats[valid], rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(mask[:t_ref], ref_mask)
    assert np.all(mask[t_ref:] == 0)


def test_features_match_hf_batch(hf_extractor, rng):
    cfg = FrontendConfig()
    lengths = [8000, 20000, 31999]
    bucket = 32000
    audios = [rng.normal(size=n).astype(np.float32) * 0.05 for n in lengths]
    batch = np.zeros((len(lengths), bucket), np.float32)
    for i, a in enumerate(audios):
        batch[i, : len(a)] = a

    front = fe.LogMelFrontend(cfg)
    feats, mask = front(jnp.asarray(batch), jnp.asarray(lengths))
    for i, a in enumerate(audios):
        ref = hf_extractor(a, sampling_rate=16000, return_tensors="np")
        rf, rm = ref["input_features"][0], ref["attention_mask"][0]
        valid = rm.astype(bool)
        np.testing.assert_allclose(
            np.asarray(feats[i])[: rf.shape[0]][valid], rf[valid], rtol=2e-3, atol=2e-3)
        assert int(np.asarray(mask[i]).sum()) == int(rm.sum())


def test_valid_frame_count():
    cfg = FrontendConfig()
    ns = jnp.asarray([0, 399, 400, 560, 1000, 480000])
    got = fe.num_valid_frames(cfg, ns)
    expected = [0, 0, 1, 2, 4, 2998]
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_frontend_constants_are_host_arrays():
    """The frontend's transform/mel matrices MUST be host numpy: every
    training/eval/embed jit closes over the frontend, and a device-resident
    constant makes MLIR lowering do a blocking d2h fetch per trace
    (Array._value) — observed to stall for minutes on relay-attached TPU
    backends (round-5 deadlock diagnosis)."""
    import jax

    front = fe.LogMelFrontend(FrontendConfig())
    for name in ("_transform", "_mel"):
        a = getattr(front, name)
        assert isinstance(a, np.ndarray) and not isinstance(a, jax.Array), name

    from speech_transcript_embeddings_tpu.ops.frontend_pallas import (
        PallasLogMelFrontend,
    )
    pfront = PallasLogMelFrontend(FrontendConfig())
    for name in ("_transform", "_mel", "_packed_transform", "_packed_mel"):
        a = getattr(pfront, name)
        assert isinstance(a, np.ndarray) and not isinstance(a, jax.Array), name
