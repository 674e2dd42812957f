"""Int8 dynamic-quantization tests (ops/quant.py + Embedder.quantize_int8).

TPU-native serving capability with no reference counterpart (the reference
serves fp32 torch — inference.py / cv_inference.py); these tests pin:
  * which params quantize (Dense kernels on the traced forward, incl. the
    scan-stacked frozen-bottom layout; everything else untouched),
  * numerical fidelity of the W8A8 path vs full precision,
  * that the Embedder API and retrieval ordering survive quantization,
  * that the interceptor is inert for full-precision params.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_transcript_embeddings_tpu.config import tiny_model_config
from speech_transcript_embeddings_tpu.models.dual_encoder import (
    DualEncoderModel, init_params,
)
from speech_transcript_embeddings_tpu.ops import quant


def _model_and_batch(scan_bottom=0, hidden=64):
    mc = tiny_model_config(text_hidden=hidden, audio_hidden=hidden,
                           projection_dim=48, num_layers=3)
    if scan_bottom:
        mc = dataclasses.replace(
            mc,
            text=dataclasses.replace(mc.text, scan_bottom=scan_bottom),
            audio=dataclasses.replace(mc.audio, scan_bottom=scan_bottom))
    model = DualEncoderModel(mc)
    params = init_params(model, jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(
            rs.randint(0, mc.text.vocab_size, (4, 12)), jnp.int32),
        "attention_mask": jnp.ones((4, 12), jnp.int32),
        "input_features": jnp.asarray(
            rs.randn(4, 20, mc.audio.feature_dim), jnp.float32),
        "attention_mask_audio": jnp.ones((4, 20), jnp.int32),
    }
    return model, params, batch


def test_quantizes_only_dense_kernels_and_keeps_structure():
    model, params, batch = _model_and_batch()
    apply = lambda p, b: model.apply({"params": p}, b)
    paths = quant.dense_param_paths(apply, params, batch)
    assert paths, "no Dense modules recorded"
    pq = quant.quantize_dense_params(params, paths)
    flat = jax.tree_util.tree_leaves_with_path(pq)
    int8_leaves = [p for p, l in flat if l.dtype == jnp.int8]
    assert int8_leaves, "nothing quantized"
    for path, leaf in flat:
        keys = [getattr(k, "key", "") for k in path]
        # non-Dense params untouched: embeddings, LayerNorms, depthwise conv
        if "embedding" in keys or "depthwise_kernel" in keys:
            assert leaf.dtype != jnp.int8
        if keys[-1] == "kernel_q":
            assert leaf.dtype == jnp.int8
    # every quantized kernel is accompanied by a per-output-channel scale and
    # keeps its bias; walk() below checks the sibling dict directly
    def walk(node, prefix=()):
        for k, v in node.items():
            if isinstance(v, dict):
                if "kernel_q" in v:
                    assert "kernel_scale" in v and "kernel" not in v
                    assert v["kernel_scale"].shape == v["kernel_q"].shape[:-2] + (
                        v["kernel_q"].shape[-1],)
                else:
                    walk(v, prefix + (k,))
    walk(pq)


@pytest.mark.parametrize("scan_bottom", [0, 2])
def test_int8_forward_matches_full_precision(scan_bottom):
    model, params, batch = _model_and_batch(scan_bottom=scan_bottom)
    apply = lambda p, b: model.apply({"params": p}, b)
    paths = quant.dense_param_paths(apply, params, batch)
    pq = quant.quantize_dense_params(params, paths)
    t0, a0 = apply(params, batch)

    def qapply(p, b):
        with quant.intercept_int8():
            return model.apply({"params": p}, b)

    t1, a1 = jax.jit(qapply)(pq, batch)
    for r, q in [(t0, t1), (a0, a1)]:
        r = np.asarray(r, np.float32)
        q = np.asarray(q, np.float32)
        # embeddings are L2-normalised: per-row cosine is the fidelity metric
        cos = np.sum(r * q, axis=-1)
        assert cos.min() > 0.995, cos

    # and the outputs are NOT bit-identical (the int8 path actually ran)
    assert not np.allclose(np.asarray(t0), np.asarray(t1))


def test_interceptor_inert_for_full_precision_params():
    model, params, batch = _model_and_batch()

    def qapply(p, b):
        with quant.intercept_int8():
            return model.apply({"params": p}, b)

    # both sides jitted: the comparison isolates the interceptor (eager vs
    # jit differ by ~1e-7 through different fusion, irrelevant here)
    t0, a0 = jax.jit(lambda p, b: model.apply({"params": p}, b))(params, batch)
    t1, a1 = jax.jit(qapply)(params, batch)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


def test_min_dim_gate_leaves_tiny_kernels_alone():
    model, params, batch = _model_and_batch(hidden=64)
    apply = lambda p, b: model.apply({"params": p}, b)
    paths = quant.dense_param_paths(apply, params, batch)
    pq = quant.quantize_dense_params(params, paths)

    def find(node, pred, prefix=()):
        out = []
        for k, v in node.items():
            if isinstance(v, dict):
                out += find(v, pred, prefix + (k,))
            elif pred(prefix + (k,), v):
                out.append(prefix + (k,))
        return out

    # the attentive-pooling score head ends in a [H/2, 1] kernel — below
    # MIN_QUANT_DIM it must stay full precision even though it is a Dense
    tiny = find(pq, lambda p, v: p[-1] == "kernel" and v.shape[-1] == 1)
    assert tiny, "expected the [H/2, 1] score head to stay unquantized"


def test_embedder_quantize_int8_api(tmp_path):
    # reuse the inference checkpoint fixture machinery inline: build an
    # Embedder directly from params (no checkpoint round-trip needed here)
    from speech_transcript_embeddings_tpu.config import (
        DataConfig, ExperimentConfig,
    )
    from speech_transcript_embeddings_tpu.inference.embed import Embedder

    cfg = ExperimentConfig(
        model=tiny_model_config(text_hidden=64, audio_hidden=64,
                                projection_dim=48),
        data=DataConfig(dataset="synthetic", batch_size=4, max_text_length=12,
                        audio_buckets=(16000,), max_audio_samples=16000),
    )
    model = DualEncoderModel(cfg.model)
    params = init_params(model, jax.random.PRNGKey(0))
    emb = Embedder(cfg, params)
    texts = ["uma frase de teste", "outra frase diferente aqui"]
    audios = [np.random.RandomState(i).randn(9000).astype(np.float32) * 0.1
              for i in range(2)]
    te0 = emb.embed_texts(texts)
    ae0 = emb.embed_audios(audios)
    sim0 = emb.pair_similarities(texts, audios)

    emb.quantize_int8()
    assert any(l.dtype == jnp.int8 for l in jax.tree_util.tree_leaves(emb.params))
    te1 = emb.embed_texts(texts)
    ae1 = emb.embed_audios(audios)
    sim1 = emb.pair_similarities(texts, audios)
    assert np.sum(te0 * te1, -1).min() > 0.99
    assert np.sum(ae0 * ae1, -1).min() > 0.99
    np.testing.assert_allclose(sim0, sim1, atol=0.05)
    # retrieval ordering must be preserved on this toy set
    assert np.argmax(te0 @ ae0.T, 1).tolist() == np.argmax(te1 @ ae1.T, 1).tolist()
