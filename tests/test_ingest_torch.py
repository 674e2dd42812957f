"""Reference torch-checkpoint ingestion (key-sniffing compat shim).

Builds a checkpoint dict with the reference's exact key naming — tiny random
HF encoders plus torch head modules mirroring trainer_unfreeze.py's layout —
ingests it, and verifies (a) config sniffing, (b) numerical parity of every
mapped head against its torch oracle, (c) the end-to-end load path via
convert_checkpoint --from-torch.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

from speech_transcript_embeddings_tpu.models import ingest_torch

D_TEXT = 32      # text hidden
D_AUDIO = 32     # audio hidden
D_PROJ = 24      # projection dim


def _torch_projection(d_in, d_proj):
    m = torch.nn.Module()   # reference EnhancedProjection wraps a .projection
    m.projection = torch.nn.Sequential(
        torch.nn.Linear(d_in, 2 * d_proj), torch.nn.GELU(),
        torch.nn.Dropout(0.0), torch.nn.Linear(2 * d_proj, d_proj),
        torch.nn.LayerNorm(d_proj))
    return m


def _torch_pooling(d):
    return torch.nn.Sequential(
        torch.nn.Linear(d, d // 2), torch.nn.Tanh(), torch.nn.Linear(d // 2, 1))


class _TorchCrossModal(torch.nn.Module):
    def __init__(self, d):
        super().__init__()
        self.query = torch.nn.Linear(d, d)
        self.key = torch.nn.Linear(d, d)
        self.value = torch.nn.Linear(d, d)
        self.out_proj = torch.nn.Linear(d, d)


class _TorchAlignment(torch.nn.Module):
    def __init__(self, d_text, d_audio, d):
        super().__init__()
        self.text_projection = torch.nn.Linear(d_text, d)
        self.audio_projection = torch.nn.Linear(d_audio, d)
        self.alignment_attention = torch.nn.MultiheadAttention(
            d, 4, dropout=0.0, batch_first=True)
        self.output_projection = torch.nn.Linear(d, d)
        self.layer_norm = torch.nn.LayerNorm(d)
        self.alignment_confidence = torch.nn.Sequential(
            torch.nn.Linear(d, d // 2), torch.nn.ReLU(),
            torch.nn.Linear(d // 2, 1))


@pytest.fixture(scope="module")
def reference_ckpt():
    from transformers import (
        Wav2Vec2BertConfig, Wav2Vec2BertModel, XLMRobertaConfig, XLMRobertaModel,
    )
    torch.manual_seed(0)
    text = XLMRobertaModel(XLMRobertaConfig(
        vocab_size=120, hidden_size=D_TEXT, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ), add_pooling_layer=False).eval()
    audio = Wav2Vec2BertModel(Wav2Vec2BertConfig(
        feature_projection_input_dim=16, hidden_size=D_AUDIO,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        conv_depthwise_kernel_size=7,
        left_max_position_embeddings=64, right_max_position_embeddings=8,
        hidden_dropout=0.0, attention_dropout=0.0, conformer_conv_dropout=0.0,
        activation_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
        mask_time_prob=0.0, mask_feature_prob=0.0, apply_spec_augment=False,
    )).eval()

    heads = {
        "text_projection": _torch_projection(D_TEXT, D_PROJ),
        "audio_projection": _torch_projection(D_AUDIO, D_PROJ),
        "text_pooling": torch.nn.Module(), "audio_pooling": torch.nn.Module(),
        "text_to_audio_attention": _TorchCrossModal(D_PROJ),
        "audio_to_text_attention": _TorchCrossModal(D_PROJ),
        "text_seq_to_projection": torch.nn.Linear(D_TEXT, D_PROJ),
        "audio_seq_to_projection": torch.nn.Linear(D_AUDIO, D_PROJ),
        "word_level_alignment": _TorchAlignment(D_TEXT, D_AUDIO, D_PROJ),
    }
    heads["text_pooling"].attention = _torch_pooling(D_TEXT)
    heads["audio_pooling"].attention = _torch_pooling(D_AUDIO)
    fusion = {
        "text_fusion": torch.nn.Sequential(
            torch.nn.Linear(2 * D_PROJ, D_PROJ), torch.nn.LayerNorm(D_PROJ)),
        "audio_fusion": torch.nn.Sequential(
            torch.nn.Linear(2 * D_PROJ, D_PROJ), torch.nn.LayerNorm(D_PROJ)),
    }

    sd = {}
    for name, m in {"text_encoder": text, "audio_encoder": audio,
                    **heads, **fusion}.items():
        for k, v in m.state_dict().items():
            sd[f"{name}.{k}"] = v
    ckpt = {
        "model_state_dict": sd,
        "epoch": 23, "temperature": 0.07, "projection_dim": D_PROJ,
        "use_cross_modal": True, "use_attentive_pooling": True,
        "use_word_alignment": True,
    }
    return ckpt, heads


def test_sniff_config(reference_ckpt):
    ckpt, _ = reference_ckpt
    cfg = ingest_torch.sniff_reference_config(ckpt)
    assert cfg.model.heads.projection_dim == D_PROJ
    assert cfg.model.heads.use_cross_modal
    assert cfg.model.heads.use_attentive_pooling
    assert cfg.model.heads.use_word_alignment
    assert cfg.model.text.hidden_size == D_TEXT
    assert cfg.model.text.num_layers == 2
    assert cfg.model.audio.feature_dim == 16
    assert cfg.model.audio.conv_kernel_size == 7
    assert cfg.loss.temperature == pytest.approx(0.07)
    # sniffing (no stored flags) must agree, like inference.py:56-59
    bare = {"model_state_dict": ckpt["model_state_dict"]}
    cfg2 = ingest_torch.sniff_reference_config(bare)
    assert cfg2.model.heads.use_cross_modal
    assert cfg2.model.heads.use_attentive_pooling
    assert cfg2.model.heads.use_word_alignment
    assert cfg2.loss.temperature == pytest.approx(0.1)


def test_mapped_heads_match_torch_oracles(reference_ckpt):
    from speech_transcript_embeddings_tpu.models.heads import (
        AttentivePooling, EnhancedProjection, WordLevelAlignment,
    )
    ckpt, heads = reference_ckpt
    cfg = ingest_torch.sniff_reference_config(ckpt)
    params = ingest_torch.params_from_reference_checkpoint(ckpt, cfg)
    rng = np.random.default_rng(5)

    # projection head
    x = rng.normal(size=(3, D_TEXT)).astype(np.float32)
    ours = EnhancedProjection(projection_dim=D_PROJ, hidden_dim=2 * D_PROJ,
                              dropout=0.0).apply(
        {"params": params["text_projection"]}, jnp.asarray(x),
        deterministic=True)
    with torch.no_grad():
        ref = heads["text_projection"].projection(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    # attentive pooling
    h = rng.normal(size=(2, 7, D_AUDIO)).astype(np.float32)
    m = np.ones((2, 7), np.int32)
    pooled = AttentivePooling().apply({"params": params["audio_pooling"]},
                                      jnp.asarray(h), jnp.asarray(m))
    with torch.no_grad():
        scores = heads["audio_pooling"].attention(
            torch.from_numpy(h)).squeeze(-1)
        w = torch.softmax(scores, dim=1)
        ref = (torch.from_numpy(h) * w.unsqueeze(-1)).sum(1).numpy()
    np.testing.assert_allclose(np.asarray(pooled), ref, rtol=1e-4, atol=1e-5)

    # word-level alignment (uses torch.nn.MultiheadAttention internally)
    tt = rng.normal(size=(2, 5, D_TEXT)).astype(np.float32)
    aa = rng.normal(size=(2, 9, D_AUDIO)).astype(np.float32)
    aligned, scores_tok, _ = WordLevelAlignment(
        alignment_dim=D_PROJ, num_heads=4, dropout=0.0).apply(
        {"params": params["word_level_alignment"]},
        jnp.asarray(tt), jnp.asarray(aa), deterministic=True)
    wa = heads["word_level_alignment"]
    with torch.no_grad():
        tp = wa.text_projection(torch.from_numpy(tt))
        ap = wa.audio_projection(torch.from_numpy(aa))
        att, _ = wa.alignment_attention(tp, ap, ap)
        ref_aligned = wa.layer_norm(tp + wa.output_projection(att))
        ref_scores = wa.alignment_confidence(ref_aligned).squeeze(-1)
    np.testing.assert_allclose(np.asarray(aligned), ref_aligned.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores_tok), ref_scores.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_full_forward_and_cli_roundtrip(reference_ckpt, tmp_path):
    """Ingested params run through the full dual-encoder forward, and the CLI
    writes a loadable params-only checkpoint."""
    ckpt, _ = reference_ckpt
    pt = str(tmp_path / "best_model_gap.pt")
    torch.save(ckpt, pt)

    from speech_transcript_embeddings_tpu import convert_checkpoint
    out = str(tmp_path / "ingested")
    convert_checkpoint.main(["--from-torch", pt, "--output", out])

    from speech_transcript_embeddings_tpu.inference.embed import Embedder
    emb = Embedder.from_checkpoint(out)
    te = emb.embed_texts(["uma frase qualquer"])
    assert te.shape == (1, D_PROJ)
    np.testing.assert_allclose(np.linalg.norm(te, axis=1), 1.0, rtol=1e-4)
    wav = np.random.default_rng(0).normal(
        scale=0.05, size=16000).astype(np.float32)
    ae = emb.embed_audios([wav])
    assert ae.shape == (1, D_PROJ)
    fused, _, _ = emb.embed_pair("uma frase qualquer", wav)
    assert -1.0 <= float(fused) <= 1.0
