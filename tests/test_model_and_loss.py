"""Dual-encoder assembly and loss tests (tiny configs, CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_transcript_embeddings_tpu.config import LossConfig, tiny_model_config
from speech_transcript_embeddings_tpu.models.dual_encoder import (
    DualEncoderModel, init_params,
)
from speech_transcript_embeddings_tpu.training import losses


def make_batch(rng, b=4, tt=8, ta=6, feat=16, vocab=128):
    ids = rng.integers(2, vocab, size=(b, tt)).astype(np.int32)
    neg = rng.integers(2, vocab, size=(b, tt)).astype(np.int32)
    tmask = np.ones((b, tt), np.int32)
    tmask[0, 5:] = 0
    amask = np.ones((b, ta), np.int32)
    amask[1, 4:] = 0
    feats = rng.normal(size=(b, ta, feat)).astype(np.float32)
    return {
        "input_ids_pos": jnp.asarray(ids),
        "attention_mask_pos": jnp.asarray(tmask),
        "input_ids_neg": jnp.asarray(neg),
        "attention_mask_neg": jnp.asarray(tmask),
        "input_features": jnp.asarray(feats),
        "attention_mask_audio": jnp.asarray(amask),
    }


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_model_config()
    model = DualEncoderModel(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    return model, params


def test_forward_pos_neg_shapes_and_norms(model_and_params):
    model, params = model_and_params
    batch = make_batch(np.random.default_rng(0))
    out = model.apply({"params": params}, batch)
    d = model.cfg.heads.projection_dim
    assert out.text_pos.shape == (4, d)
    assert out.text_neg.shape == (4, d)
    assert out.audio.shape == (4, d)
    for e in (out.text_pos, out.text_neg, out.audio):
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(e), axis=-1), 1.0, rtol=1e-5)
    assert out.alignment_scores.shape == (4, 8)
    assert out.alignment_matrix.shape == (4, 8, 6)
    # alignment scores are masked where text is padding
    assert np.all(np.asarray(out.alignment_scores)[0, 5:] == 0.0)


def test_forward_pair_matches_pos_branch(model_and_params):
    """forward_pair must equal the pos half of forward_pos_neg (model unification)."""
    model, params = model_and_params
    batch = make_batch(np.random.default_rng(1))
    out = model.apply({"params": params}, batch)
    pair_batch = {
        "input_ids": batch["input_ids_pos"],
        "attention_mask": batch["attention_mask_pos"],
        "input_features": batch["input_features"],
        "attention_mask_audio": batch["attention_mask_audio"],
    }
    text_emb, audio_emb = model.apply({"params": params}, pair_batch)
    np.testing.assert_allclose(np.asarray(text_emb), np.asarray(out.text_pos),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(audio_emb), np.asarray(out.audio),
                               rtol=1e-5, atol=1e-6)


def test_pairwise_loss_golden():
    """Hand-computed values for the 2-way CE + alignment factor + corrupt penalty."""
    cfg = LossConfig(temperature=0.1, alignment_weight=0.5, corrupt_gamma=0.35)
    s_pos = np.array([0.8, 0.2], np.float32)
    s_neg = np.array([0.1, -0.3], np.float32)
    # build unit embeddings with the desired dot products
    audio = np.stack([[1.0, 0.0], [1.0, 0.0]]).astype(np.float32)
    tp = np.stack([[0.8, np.sqrt(1 - 0.64)], [0.2, np.sqrt(1 - 0.04)]]).astype(np.float32)
    tn = np.stack([[0.1, np.sqrt(1 - 0.01)], [-0.3, np.sqrt(1 - 0.09)]]).astype(np.float32)
    align = np.array([[0.4, 0.6], [-0.2, 0.0]], np.float32)

    logits = np.stack([s_pos, s_neg], 1) / 0.1
    ce = -np.log(np.exp(logits[:, 0]) / np.exp(logits).sum(1))
    factor = 1 - (1 / (1 + np.exp(-align.mean(1)))) * 0.5
    expected = (ce * factor).mean() + 0.35 * np.maximum(s_neg, 0).mean()

    loss, aux = losses.pairwise_info_nce(
        cfg, jnp.asarray(tp), jnp.asarray(tn), jnp.asarray(audio),
        jnp.asarray(align))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux.s_pos), s_pos, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux.s_neg), s_neg, rtol=1e-5)


def test_global_loss_single_device_reference():
    """global_info_nce without an axis == explicit full-matrix softmax CE."""
    cfg = LossConfig(temperature=0.1, corrupt_gamma=0.0)
    rng = np.random.default_rng(3)
    b, d = 5, 8
    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)
    tp, tn, au = (unit(rng.normal(size=(b, d))).astype(np.float32) for _ in range(3))

    cand = np.concatenate([tp, tn], 0)
    logits = au @ cand.T / 0.1
    expected = -np.mean(
        logits[np.arange(b), np.arange(b)]
        - np.log(np.exp(logits).sum(axis=1)))

    loss, _ = losses.global_info_nce(
        cfg, jnp.asarray(tp), jnp.asarray(tn), jnp.asarray(au))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


@pytest.mark.parametrize("n_shards", [4, 8])
def test_global_loss_sharded_matches_single_device(n_shards):
    """shard_map over the CPU mesh must give the identical global loss (the
    per-shard label offsets in the all_gather branch are exercised at both
    mesh widths)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    cfg = LossConfig(temperature=0.1, corrupt_gamma=0.35)
    rng = np.random.default_rng(4)
    b, d = 16, 8
    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)
    tp, tn, au = (unit(rng.normal(size=(b, d))).astype(np.float32) for _ in range(3))

    ref, _ = losses.global_info_nce(
        cfg, jnp.asarray(tp), jnp.asarray(tn), jnp.asarray(au))

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("data",))

    def local(tp_l, tn_l, au_l):
        loss, _ = losses.global_info_nce(cfg, tp_l, tn_l, au_l, axis_name="data")
        return jax.lax.pmean(loss, "data")

    f = shard_map(local, mesh=mesh,
                  in_specs=(P("data"), P("data"), P("data")), out_specs=P())
    got = f(jnp.asarray(tp), jnp.asarray(tn), jnp.asarray(au))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_global_per_sample_masked_excludes_padded_candidates():
    """Eval tails duplicate real rows with mask 0 (pipeline._emit); the masked
    global objective must remove those duplicate candidate columns so the valid
    rows score exactly as in an unpadded batch."""
    cfg = LossConfig(kind="global", temperature=0.1, corrupt_gamma=0.35)
    rng = np.random.default_rng(7)
    b, d = 3, 8
    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)
    tp, tn, au = (unit(rng.normal(size=(b, d))).astype(np.float32) for _ in range(3))
    pad = lambda x: np.concatenate([x, x[:1]], axis=0)   # row 3 duplicates row 0

    per_unpadded = losses.global_per_sample_masked(
        cfg, jnp.asarray(tp), jnp.asarray(tn), jnp.asarray(au),
        jnp.ones(b, jnp.float32))
    per_padded = losses.global_per_sample_masked(
        cfg, jnp.asarray(pad(tp)), jnp.asarray(pad(tn)), jnp.asarray(pad(au)),
        jnp.asarray([1, 1, 1, 0], jnp.float32))
    np.testing.assert_allclose(np.asarray(per_padded)[:b],
                               np.asarray(per_unpadded), rtol=1e-5)
    # with all rows valid it reproduces the training loss exactly
    loss, _ = losses.global_info_nce(cfg, jnp.asarray(tp), jnp.asarray(tn),
                                     jnp.asarray(au))
    np.testing.assert_allclose(float(jnp.mean(per_unpadded)), float(loss),
                               rtol=1e-5)


def test_to_human_readable():
    x = jnp.asarray([0.0, 0.1, -0.1])
    np.testing.assert_allclose(
        np.asarray(losses.to_human_readable(x, 0.1, "prob")),
        [0.5, 1 / (1 + np.exp(-1)), 1 / (1 + np.exp(1))], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(losses.to_human_readable(x, 0.1, "0to1")),
        [0.5, 0.55, 0.45], rtol=1e-6)
