#!/usr/bin/env python
"""Flagship-geometry conversion/ingest validation (VERDICT r2 next-step #1).

Every future real-Common-Voice run rides on the torch→JAX conversion path
(docs/CV_RUNBOOK.md step 2), but the parity tests in tests/test_encoders.py
and tests/test_ingest_torch.py exercise it only at toy dims (2-layer /
32-hidden oracles). A shape bug, head-count mismatch, or 24-layer
scan-restack error that appears only at the real dims would silently destroy
the eventual CV run. This script builds random-weight HF oracles at the REAL
flagship geometry locally (constructing `XLMRobertaConfig` 12×768 /
`Wav2Vec2BertConfig` 24×1024 models needs no network — the weights are random,
only the architecture matters for conversion fidelity) and validates:

1. text encoder:  HF XLMRoberta 12×768 (vocab 250002) → `convert_text_encoder`
   → `restack_encoder_params(scan_bottom=7)` → Flax forward parity vs torch on
   a ragged-length [4, 128] batch (the reference loads this architecture via
   AutoModel.from_pretrained, model.py:150-152);
2. audio encoder: HF Wav2Vec2Bert 24×1024 (feature dim 160, conv kernel 31,
   relative_key 64/8) → `convert_audio_encoder` → restack(scan_bottom=19) →
   parity on a ragged [2, 499] batch (499 frames = a 10 s clip);
3. restack involution: scan7→0 / scan19→0 reproduces the direct conversion
   bit-exactly;
4. reference-style checkpoint ingest at flagship dims: a `best_model_gap.pt`
   shaped exactly like trainer_unfreeze.py's save (text/audio encoders +
   projection/pooling/cross-modal/seq-to-projection/alignment/fusion heads,
   proj 768) → `sniff_reference_config` geometry check →
   `params_from_reference_checkpoint` → per-head numerical parity vs the torch
   oracles + encoder-subtree equality with the direct conversion →
   `convert_checkpoint --from-torch` CLI → `Embedder` end-to-end forward
   (inference.py:83's load path, without the reference's key-strictness trap);
5. `build_converted_params` (CV_RUNBOOK step 2's assembly) at flagship dims
   loads into the DualEncoderModel and runs `forward_pair`.

Run on CPU (f32, exact numerics): takes a few minutes for the 24×1024 torch
forward on one core. Recorded PASS output: runs/flagship_conversion_validation.txt
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from speech_transcript_embeddings_tpu import config as config_lib  # noqa: E402
from speech_transcript_embeddings_tpu.models import convert  # noqa: E402

# flagship geometry (SURVEY.md §2 "Pretrained encoders": mpnet = XLM-R base
# 12×768, facebook/w2v-bert-2.0 = 24×1024 conformer, projection 768).
# ``--text-arch roberta-large`` switches the text side to the reference's
# OTHER supported text encoder, sentence-transformers/all-roberta-large-v1
# (RobertaModel 24×1024, vocab 50265, projection 1024 — model.py:137,
# the 5_wo_alignment / 5_wt_alignment runs in BASELINE.md).
D_TEXT, TEXT_LAYERS, TEXT_HEADS = 768, 12, 12
D_AUDIO, AUDIO_LAYERS, AUDIO_HEADS = 1024, 24, 16
D_PROJ = 768
VOCAB = 250002
TEXT_SCAN, AUDIO_SCAN = 7, 19      # the flagship preset's frozen-bottom scans
TEXT_ARCH = "xlmr"


def set_text_arch(arch: str) -> None:
    global D_TEXT, TEXT_LAYERS, TEXT_HEADS, D_PROJ, VOCAB, TEXT_SCAN, TEXT_ARCH
    TEXT_ARCH = arch
    if arch == "roberta-large":
        # all-roberta-large-v1: 24 layers × 1024 hidden × 16 heads; the
        # reference's roberta runs used projection_dim 1024 and 5 unfrozen
        # text layers (scan_bottom 19)
        D_TEXT, TEXT_LAYERS, TEXT_HEADS = 1024, 24, 16
        D_PROJ, VOCAB, TEXT_SCAN = 1024, 50265, 19
    elif arch != "xlmr":
        raise SystemExit(f"unknown --text-arch {arch!r}")


def _np_sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _report(name: str, got: np.ndarray, ref: np.ndarray, atol: float):
    diff = np.max(np.abs(got.astype(np.float64) - ref.astype(np.float64)))
    ok = diff <= atol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max|Δ|={diff:.3e} "
          f"(tolerance {atol:g})", flush=True)
    if not ok:
        raise SystemExit(f"{name} exceeded tolerance")
    return diff


def _tree_equal(name: str, a, b):
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    assert len(leaves_a) == len(leaves_b), name
    for x, y in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    print(f"PASS {name}: {len(leaves_a)} leaves bit-identical", flush=True)


def build_text_hf():
    torch.manual_seed(0)
    kwargs = dict(
        vocab_size=VOCAB, hidden_size=D_TEXT, num_hidden_layers=TEXT_LAYERS,
        num_attention_heads=TEXT_HEADS, intermediate_size=4 * D_TEXT,
        max_position_embeddings=514, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    if TEXT_ARCH == "roberta-large":
        from transformers import RobertaConfig, RobertaModel
        hf_cfg = RobertaConfig(**kwargs)
        return RobertaModel(hf_cfg, add_pooling_layer=False).eval(), hf_cfg
    from transformers import XLMRobertaConfig, XLMRobertaModel
    hf_cfg = XLMRobertaConfig(**kwargs)
    return XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval(), hf_cfg


def build_audio_hf():
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel
    torch.manual_seed(1)
    hf_cfg = Wav2Vec2BertConfig(
        feature_projection_input_dim=160, hidden_size=D_AUDIO,
        num_hidden_layers=AUDIO_LAYERS, num_attention_heads=AUDIO_HEADS,
        intermediate_size=4 * D_AUDIO, conv_depthwise_kernel_size=31,
        left_max_position_embeddings=64, right_max_position_embeddings=8,
        hidden_dropout=0.0, attention_dropout=0.0, conformer_conv_dropout=0.0,
        activation_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
        mask_time_prob=0.0, mask_feature_prob=0.0, apply_spec_augment=False)
    return Wav2Vec2BertModel(hf_cfg).eval(), hf_cfg


def validate_text(hf, hf_cfg):
    from speech_transcript_embeddings_tpu.models.text_encoder import TextEncoder
    t0 = time.time()
    sd = _np_sd(hf)
    cfg0 = convert.text_config_from_hf(hf_cfg)
    params0 = convert.convert_text_encoder(sd, cfg0)

    import dataclasses
    cfg7 = dataclasses.replace(cfg0, scan_bottom=TEXT_SCAN)
    params7 = convert.restack_encoder_params(params0, 0, TEXT_SCAN, TEXT_LAYERS)
    back = convert.restack_encoder_params(params7, TEXT_SCAN, 0, TEXT_LAYERS)
    _tree_equal(f"text restack scan{TEXT_SCAN}→0 involution", back, params0)

    rng = np.random.default_rng(2)
    b, t = 4, 128
    ids = rng.integers(2, VOCAB, size=(b, t))
    lengths = [128, 97, 55, 12]
    mask = np.zeros((b, t), np.int32)
    for i, n in enumerate(lengths):
        mask[i, :n] = 1
        ids[i, n:] = 1          # pad token
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    valid = mask.astype(bool)
    for cfg, params, tag in ((cfg0, params0, "unrolled"),
                             (cfg7, params7, f"scan_bottom={TEXT_SCAN}")):
        got = np.asarray(TextEncoder(cfg).apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
        _report(f"text encoder {TEXT_LAYERS}x{D_TEXT} [{tag}] vs torch", got[valid],
                ref[valid], 1e-3)
    print(f"     (text validation {time.time() - t0:.1f}s)", flush=True)
    return params0


def validate_audio(hf, hf_cfg):
    from speech_transcript_embeddings_tpu.models.audio_encoder import AudioEncoder
    t0 = time.time()
    sd = _np_sd(hf)
    cfg0 = convert.audio_config_from_hf(hf_cfg)
    params0 = convert.convert_audio_encoder(sd, cfg0)

    import dataclasses
    cfg19 = dataclasses.replace(cfg0, scan_bottom=AUDIO_SCAN)
    params19 = convert.restack_encoder_params(params0, 0, AUDIO_SCAN,
                                              AUDIO_LAYERS)
    back = convert.restack_encoder_params(params19, AUDIO_SCAN, 0, AUDIO_LAYERS)
    _tree_equal("audio restack scan19→0 involution", back, params0)

    rng = np.random.default_rng(3)
    b, t = 2, 499               # 499 stacked frames = one 10 s clip
    feats = rng.normal(size=(b, t, 160)).astype(np.float32)
    mask = np.zeros((b, t), np.int32)
    mask[0, :499] = 1
    mask[1, :361] = 1
    with torch.no_grad():
        ref = hf(input_features=torch.tensor(feats),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    valid = mask.astype(bool)
    for cfg, params, tag in ((cfg0, params0, "unrolled"),
                             (cfg19, params19, f"scan_bottom={AUDIO_SCAN}")):
        got = np.asarray(AudioEncoder(cfg).apply(
            {"params": params}, jnp.asarray(feats), jnp.asarray(mask)))
        _report(f"audio encoder 24x1024 [{tag}] vs torch", got[valid],
                ref[valid], 2e-3)
    print(f"     (audio validation {time.time() - t0:.1f}s)", flush=True)
    return params0


# ---- reference-style checkpoint at flagship dims (trainer_unfreeze.py layout)

def _torch_projection(d_in, d_proj):
    m = torch.nn.Module()
    m.projection = torch.nn.Sequential(
        torch.nn.Linear(d_in, 2 * d_proj), torch.nn.GELU(),
        torch.nn.Dropout(0.0), torch.nn.Linear(2 * d_proj, d_proj),
        torch.nn.LayerNorm(d_proj))
    return m


def _torch_pooling(d):
    m = torch.nn.Module()
    m.attention = torch.nn.Sequential(
        torch.nn.Linear(d, d // 2), torch.nn.Tanh(),
        torch.nn.Linear(d // 2, 1))
    return m


class _TorchCrossModal(torch.nn.Module):
    def __init__(self, d):
        super().__init__()
        self.query = torch.nn.Linear(d, d)
        self.key = torch.nn.Linear(d, d)
        self.value = torch.nn.Linear(d, d)
        self.out_proj = torch.nn.Linear(d, d)


class _TorchAlignment(torch.nn.Module):
    def __init__(self, d_text, d_audio, d, heads):
        super().__init__()
        self.text_projection = torch.nn.Linear(d_text, d)
        self.audio_projection = torch.nn.Linear(d_audio, d)
        self.alignment_attention = torch.nn.MultiheadAttention(
            d, heads, dropout=0.0, batch_first=True)
        self.output_projection = torch.nn.Linear(d, d)
        self.layer_norm = torch.nn.LayerNorm(d)
        self.alignment_confidence = torch.nn.Sequential(
            torch.nn.Linear(d, d // 2), torch.nn.ReLU(),
            torch.nn.Linear(d // 2, 1))


def build_reference_ckpt(text_hf, audio_hf):
    torch.manual_seed(7)
    heads = {
        "text_projection": _torch_projection(D_TEXT, D_PROJ),
        "audio_projection": _torch_projection(D_AUDIO, D_PROJ),
        "text_pooling": _torch_pooling(D_TEXT),
        "audio_pooling": _torch_pooling(D_AUDIO),
        "text_to_audio_attention": _TorchCrossModal(D_PROJ),
        "audio_to_text_attention": _TorchCrossModal(D_PROJ),
        "text_seq_to_projection": torch.nn.Linear(D_TEXT, D_PROJ),
        "audio_seq_to_projection": torch.nn.Linear(D_AUDIO, D_PROJ),
        "word_level_alignment": _TorchAlignment(D_TEXT, D_AUDIO, D_PROJ, 4),
        "text_fusion": torch.nn.Sequential(
            torch.nn.Linear(2 * D_PROJ, D_PROJ), torch.nn.LayerNorm(D_PROJ)),
        "audio_fusion": torch.nn.Sequential(
            torch.nn.Linear(2 * D_PROJ, D_PROJ), torch.nn.LayerNorm(D_PROJ)),
    }
    sd = {}
    for name, m in {"text_encoder": text_hf, "audio_encoder": audio_hf,
                    **heads}.items():
        for k, v in m.state_dict().items():
            sd[f"{name}.{k}"] = v
    ckpt = {
        "model_state_dict": sd,
        "epoch": 23, "temperature": 0.1, "projection_dim": D_PROJ,
        "use_cross_modal": True, "use_attentive_pooling": True,
        "use_word_alignment": True,
    }
    return ckpt, heads


def validate_ingest(text_hf, audio_hf, text_params, audio_params, workdir):
    from speech_transcript_embeddings_tpu.models import ingest_torch
    from speech_transcript_embeddings_tpu.models.heads import (
        AttentivePooling, EnhancedProjection, WordLevelAlignment,
    )
    t0 = time.time()
    ckpt, heads = build_reference_ckpt(text_hf, audio_hf)

    cfg = ingest_torch.sniff_reference_config(ckpt)
    assert (cfg.model.text.hidden_size, cfg.model.text.num_layers) == \
        (D_TEXT, TEXT_LAYERS), cfg.model.text
    assert (cfg.model.audio.hidden_size, cfg.model.audio.num_layers) == \
        (D_AUDIO, AUDIO_LAYERS), cfg.model.audio
    assert cfg.model.text.vocab_size == VOCAB
    assert cfg.model.audio.feature_dim == 160
    assert cfg.model.audio.conv_kernel_size == 31
    assert cfg.model.heads.projection_dim == D_PROJ
    assert cfg.model.heads.use_cross_modal
    assert cfg.model.heads.use_word_alignment
    print("PASS ingest config sniffing at flagship dims", flush=True)

    params = ingest_torch.params_from_reference_checkpoint(ckpt, cfg)
    # encoder subtrees must equal the direct conversion (same source weights)
    _tree_equal("ingested text encoder == direct conversion",
                params["text_encoder"], text_params)
    _tree_equal("ingested audio encoder == direct conversion",
                params["audio_encoder"], audio_params)

    rng = np.random.default_rng(5)
    # projection heads
    x = rng.normal(size=(3, D_TEXT)).astype(np.float32)
    ours = EnhancedProjection(projection_dim=D_PROJ, hidden_dim=2 * D_PROJ,
                              dropout=0.0).apply(
        {"params": params["text_projection"]}, jnp.asarray(x),
        deterministic=True)
    with torch.no_grad():
        ref = heads["text_projection"].projection(torch.from_numpy(x)).numpy()
    _report(f"text projection head {D_TEXT}→{D_PROJ}", np.asarray(ours), ref, 1e-4)

    # attentive pooling (audio side, 1024)
    h = rng.normal(size=(2, 33, D_AUDIO)).astype(np.float32)
    m = np.ones((2, 33), np.int32)
    m[1, 20:] = 0
    pooled = AttentivePooling().apply({"params": params["audio_pooling"]},
                                      jnp.asarray(h), jnp.asarray(m))
    with torch.no_grad():
        s = heads["audio_pooling"].attention(torch.from_numpy(h)).squeeze(-1)
        s = s.masked_fill(torch.from_numpy(m) == 0, -1e9)
        w = torch.softmax(s, dim=1)
        ref = (torch.from_numpy(h) * w.unsqueeze(-1)).sum(1).numpy()
    _report("audio attentive pooling 1024", np.asarray(pooled), ref, 1e-4)

    # word-level alignment (torch MultiheadAttention in_proj split at 768/4)
    tt = rng.normal(size=(2, 9, D_TEXT)).astype(np.float32)
    aa = rng.normal(size=(2, 17, D_AUDIO)).astype(np.float32)
    aligned, scores_tok, _ = WordLevelAlignment(
        alignment_dim=D_PROJ, num_heads=4, dropout=0.0).apply(
        {"params": params["word_level_alignment"]},
        jnp.asarray(tt), jnp.asarray(aa), deterministic=True)
    wa = heads["word_level_alignment"]
    with torch.no_grad():
        tp = wa.text_projection(torch.from_numpy(tt))
        ap = wa.audio_projection(torch.from_numpy(aa))
        att, _ = wa.alignment_attention(tp, ap, ap)
        # reference residual adds the RAW text hidden states
        # (trainer_unfreeze.py:299-301) — at flagship dims text_hidden ==
        # alignment_dim so this is the path the reference actually runs (at
        # mismatched dims it would not typecheck; our module substitutes the
        # projected text there, see heads.py WordLevelAlignment docstring)
        ref_aligned = wa.layer_norm(
            torch.from_numpy(tt) + wa.output_projection(att))
        ref_scores = wa.alignment_confidence(ref_aligned).squeeze(-1)
    _report(f"word alignment {D_PROJ} (aligned)", np.asarray(aligned),
            ref_aligned.numpy(), 1e-4)
    _report(f"word alignment {D_PROJ} (scores)", np.asarray(scores_tok),
            ref_scores.numpy(), 1e-4)

    # cross-modal attention at proj dim (hand-rolled reference math)
    cm = heads["text_to_audio_attention"]
    from speech_transcript_embeddings_tpu.models.heads import CrossModalAttention
    q_in = rng.normal(size=(2, 1, D_PROJ)).astype(np.float32)
    ctx = rng.normal(size=(2, 17, D_PROJ)).astype(np.float32)
    cmask = np.ones((2, 17), np.int32)
    cmask[1, 9:] = 0
    nh = 8
    hd = D_PROJ // nh
    with torch.no_grad():
        q = cm.query(torch.from_numpy(q_in)).view(2, -1, nh, hd).transpose(1, 2)
        k = cm.key(torch.from_numpy(ctx)).view(2, -1, nh, hd).transpose(1, 2)
        v = cm.value(torch.from_numpy(ctx)).view(2, -1, nh, hd).transpose(1, 2)
        w = (q @ k.transpose(-2, -1)) * hd ** -0.5
        w = w.masked_fill(torch.from_numpy(cmask)[:, None, None, :] == 0, -1e9)
        w = torch.softmax(w, dim=-1)
        ref = cm.out_proj((w @ v).transpose(1, 2).reshape(2, -1, D_PROJ)).numpy()
    got = CrossModalAttention(num_heads=nh, dropout=0.0).apply(
        {"params": params["text_to_audio_attention"]}, jnp.asarray(q_in),
        jnp.asarray(ctx), jnp.asarray(cmask))
    _report(f"cross-modal attention {D_PROJ}/8h", np.asarray(got), ref, 1e-4)

    # CLI round-trip → Embedder forward (inference.py:83's load path)
    pt = os.path.join(workdir, "best_model_gap.pt")
    torch.save(ckpt, pt)
    from speech_transcript_embeddings_tpu import convert_checkpoint
    out = os.path.join(workdir, "ingested_flagship")
    convert_checkpoint.main(["--from-torch", pt, "--output", out])
    from speech_transcript_embeddings_tpu.inference.embed import Embedder
    emb = Embedder.from_checkpoint(out)
    te = emb.embed_texts(["uma frase de validação do pipeline"])
    assert te.shape == (1, D_PROJ)
    np.testing.assert_allclose(np.linalg.norm(te, axis=1), 1.0, rtol=1e-4)
    wav = np.random.default_rng(0).normal(
        scale=0.05, size=32000).astype(np.float32)
    ae = emb.embed_audios([wav])
    assert ae.shape == (1, D_PROJ)
    fused, _, _ = emb.embed_pair("uma frase de validação", wav)
    assert -1.0 <= float(fused) <= 1.0
    print(f"PASS torch-ckpt CLI round-trip + Embedder forward at flagship dims"
          f" ({time.time() - t0:.1f}s total)", flush=True)


def validate_build_converted(text_hf, audio_hf, workdir):
    """CV_RUNBOOK step 2's assembly: HF models → full DualEncoderModel params
    → forward_pair at flagship geometry."""
    from speech_transcript_embeddings_tpu.convert_checkpoint import (
        build_converted_params,
    )
    from speech_transcript_embeddings_tpu.models.dual_encoder import (
        DualEncoderModel,
    )
    t0 = time.time()
    cfg, params = build_converted_params(
        text_hf, audio_hf,
        heads_cfg=config_lib.HeadsConfig(projection_dim=D_PROJ),
        dtype="float32", remat=False)
    model_cfg = cfg.model
    assert model_cfg.text.num_layers == TEXT_LAYERS
    assert model_cfg.audio.num_layers == AUDIO_LAYERS
    model = DualEncoderModel(model_cfg)
    rng = np.random.default_rng(11)
    batch = {
        "input_ids": rng.integers(2, VOCAB, size=(2, 16)).astype(np.int32),
        "attention_mask": np.ones((2, 16), np.int32),
        "input_features": rng.normal(size=(2, 40, 160)).astype(np.float32),
        "attention_mask_audio": np.ones((2, 40), np.int32),
    }
    te, ae = model.apply({"params": params}, batch, deterministic=True)
    assert te.shape == (2, D_PROJ) and ae.shape == (2, D_PROJ)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(te), axis=1), 1.0,
                               rtol=1e-4)
    print(f"PASS build_converted_params → forward_pair at flagship dims "
          f"({time.time() - t0:.1f}s)", flush=True)


def main():
    import argparse
    import tempfile
    ap = argparse.ArgumentParser()
    ap.add_argument("--text-arch", choices=("xlmr", "roberta-large"),
                    default="xlmr",
                    help="text-encoder geometry: xlmr = mpnet-class 12x768 "
                         "proj 768 (the flagship preset); roberta-large = "
                         "all-roberta-large-v1 24x1024 proj 1024 (the "
                         "reference's other text encoder, model.py:137)")
    args = ap.parse_args()
    set_text_arch(args.text_arch)
    print(f"flagship conversion validation [{TEXT_ARCH}]: "
          f"text {TEXT_LAYERS}x{D_TEXT} "
          f"(vocab {VOCAB}), audio {AUDIO_LAYERS}x{D_AUDIO}, proj {D_PROJ}",
          flush=True)
    text_hf, text_cfg = build_text_hf()
    audio_hf, audio_cfg = build_audio_hf()
    text_params = validate_text(text_hf, text_cfg)
    audio_params = validate_audio(audio_hf, audio_cfg)
    with tempfile.TemporaryDirectory() as workdir:
        validate_ingest(text_hf, audio_hf, text_params, audio_params, workdir)
        validate_build_converted(text_hf, audio_hf, workdir)
    print("ALL FLAGSHIP-GEOMETRY CONVERSION CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()
