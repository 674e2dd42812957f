"""Pallas frontend kernel vs the jnp reference path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_transcript_embeddings_tpu.config import FrontendConfig
from speech_transcript_embeddings_tpu.ops import frontend as fe
from speech_transcript_embeddings_tpu.ops import frontend_pallas as fp


@pytest.fixture(scope="module")
def cfg():
    return FrontendConfig()


def test_packed_matrices(cfg):
    tr = fe.make_frame_transform(cfg)
    packed = fp.packed_transform(cfg)
    assert packed.shape == (3, 160, 1024)
    full = packed.reshape(480, 1024)
    np.testing.assert_allclose(full[:400, :257], tr[:, :257], rtol=1e-6)
    np.testing.assert_allclose(full[:400, 512:769], tr[:, 257:], rtol=1e-6)
    assert np.all(full[:400, 257:512] == 0) and np.all(full[:, 769:] == 0)
    assert np.all(full[400:] == 0)      # block-2 tail rows are zero
    mel = fp.packed_mel(cfg)
    assert mel.shape == (512, 128)
    np.testing.assert_allclose(mel[:257, :80], fe.make_mel_filters(cfg), rtol=1e-6)


@pytest.mark.parametrize("fused", [False, True])
def test_pallas_matches_jnp_frontend(cfg, fused):
    rng = np.random.default_rng(0)
    lengths = [21000, 48000, 7000]
    bucket = 48000
    wav = np.zeros((3, bucket), np.float32)
    for i, n in enumerate(lengths):
        wav[i, :n] = rng.normal(scale=0.1, size=n)

    ref_front = fe.LogMelFrontend(cfg)
    ref_feats, ref_mask = ref_front(jnp.asarray(wav), jnp.asarray(lengths))

    pal_front = fp.PallasLogMelFrontend(cfg, interpret=True, fused=fused)
    got_feats, got_mask = pal_front(jnp.asarray(wav), jnp.asarray(lengths))

    np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(ref_mask))
    np.testing.assert_allclose(np.asarray(got_feats), np.asarray(ref_feats),
                               rtol=2e-3, atol=2e-3)


def test_pallas_raw_logmel_matches(cfg):
    rng = np.random.default_rng(1)
    wav = rng.normal(scale=0.1, size=(1, 16000)).astype(np.float32)
    transform = jnp.asarray(fp.packed_transform(cfg))
    mel = jnp.asarray(fp.packed_mel(cfg))
    got = fp.pallas_log_mel(cfg, transform, mel, jnp.asarray(wav), True)

    ref_tr = jnp.asarray(fe.make_frame_transform(cfg), jnp.float32)
    ref_mel = jnp.asarray(fe.make_mel_filters(cfg), jnp.float32)
    nf = fe.frames_for_samples(cfg, 16000)
    ref = fe._log_mel_spectrogram(cfg, ref_tr, ref_mel, jnp.asarray(wav), nf, 257)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
