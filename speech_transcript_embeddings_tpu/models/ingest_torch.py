"""Ingest reference torch checkpoints (compatibility shim, SURVEY.md §5.4).

The reference saves ``torch.save({'model_state_dict': ..., 'temperature': ...,
'use_cross_modal': ...})`` checkpoints whose model config its inference scripts
reconstruct by *sniffing state-dict key patterns* (reference inference.py:49-67:
``text_to_audio_attention`` → cross-modal, ``text_pooling`` → attentive
pooling). This module reproduces that self-describing behavior so a user
migrating from the reference can load their trained ``best_model_gap.pt``
directly:

  * ``sniff_reference_config``  — stored hyperparameter metadata when present,
    key-pattern + shape sniffing otherwise, → an ``ExperimentConfig``;
  * ``params_from_reference_checkpoint`` — maps every tensor onto the native
    Flax modules (encoders via ``models/convert.py``; heads here, with torch
    Linear→Dense transposes and ``nn.MultiheadAttention`` in_proj splitting).

Checkpoints from the reference's *inference-variant* model (model.py:133-328,
no ``*_seq_to_projection``) get identity seq-to-projection maps when
``hidden_dim == projection_dim`` — exactly the configuration in which that
older formulation type-checks (SURVEY.md §2 "model divergence").
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict

import numpy as np

from speech_transcript_embeddings_tpu import config as config_lib

logger = logging.getLogger("ste_tpu")

StateDict = Dict[str, np.ndarray]


def _np_state_dict(sd) -> StateDict:
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _lin(sd: StateDict, name: str) -> dict:
    """torch ``nn.Linear`` → flax Dense (weight [out, in] → kernel [in, out])."""
    return {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T),
            "bias": sd[f"{name}.bias"]}


def _ln(sd: StateDict, name: str) -> dict:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _strip(sd: StateDict, prefix: str) -> StateDict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _default_heads(hidden: int) -> int:
    """Head count is not recoverable from a state dict; ``hidden // 64``
    matches every encoder the reference ships (mpnet 12, roberta-large 16,
    w2v-bert 16). Tiny test models fall back to 4 (or 1)."""
    nh = hidden // 64
    if nh == 0 or hidden % (nh * 64):
        nh = 4 if hidden % 4 == 0 else 1
    return nh


def _count_layers(sd: StateDict, pattern: str) -> int:
    n = -1
    for k in sd:
        parts = k.split(".")
        if len(parts) > 2 and parts[0] == pattern and parts[1] == "layer":
            n = max(n, int(parts[2]))
        if len(parts) > 2 and parts[0] == pattern and parts[1] == "layers":
            n = max(n, int(parts[2]))
    return n + 1


def sniff_reference_config(ckpt: dict) -> config_lib.ExperimentConfig:
    """Reference checkpoint dict → ExperimentConfig.

    Prefers the hyperparameter metadata the trainer stores in the checkpoint
    (trainer_unfreeze.py:1617-1634); falls back to the inference scripts' key
    sniffing for flags and to tensor shapes for geometry. Head counts are not
    recoverable from shapes — ``hidden // 64`` matches every encoder the
    reference ships (mpnet 12, roberta-large 16, w2v-bert 16).
    """
    sd = _np_state_dict(ckpt["model_state_dict"])
    tsd = _strip(sd, "text_encoder.")
    asd = _strip(sd, "audio_encoder.")

    vocab, t_hidden = tsd["embeddings.word_embeddings.weight"].shape
    text_cfg = config_lib.TextEncoderConfig(
        vocab_size=vocab, hidden_size=t_hidden,
        num_layers=_count_layers(tsd, "encoder"),
        num_heads=_default_heads(t_hidden),
        intermediate_size=tsd["encoder.layer.0.intermediate.dense.weight"].shape[0],
        max_position_embeddings=tsd["embeddings.position_embeddings.weight"].shape[0],
    )
    a_hidden, feat = asd["feature_projection.projection.weight"].shape
    num_pos = asd["encoder.layers.0.self_attn.distance_embedding.weight"].shape[0]
    if num_pos != 64 + 8 + 1:
        raise ValueError(
            f"distance embedding has {num_pos} positions; only the w2v-bert "
            "64/8 clamp window can be inferred — pass an explicit config")
    audio_cfg = config_lib.AudioEncoderConfig(
        feature_dim=feat, hidden_size=a_hidden,
        num_layers=_count_layers(asd, "encoder"),
        num_heads=_default_heads(a_hidden),
        intermediate_size=asd[
            "encoder.layers.0.ffn1.intermediate_dense.weight"].shape[0],
        conv_kernel_size=asd[
            "encoder.layers.0.conv_module.depthwise_conv.weight"].shape[2],
        left_max_rel_pos=64, right_max_rel_pos=8,
        apply_spec_augment="masked_spec_embed" in asd,
    )

    # flags: stored metadata first, key sniffing second (inference.py:56-59)
    use_cross = bool(ckpt.get(
        "use_cross_modal",
        any(k.startswith("text_to_audio_attention") for k in sd)))
    use_pool = bool(ckpt.get(
        "use_attentive_pooling",
        any(k.startswith("text_pooling") for k in sd)))
    use_align = bool(ckpt.get(
        "use_word_alignment",
        any(k.startswith("word_level_alignment") for k in sd)))
    proj_w = sd["text_projection.projection.3.weight"]
    heads_cfg = config_lib.HeadsConfig(
        projection_dim=int(ckpt.get("projection_dim", proj_w.shape[0])),
        projection_hidden_dim=sd["text_projection.projection.0.weight"].shape[0],
        use_cross_modal=use_cross, use_attentive_pooling=use_pool,
        use_word_alignment=use_align,
    )
    frontend_cfg = config_lib.FrontendConfig()
    if frontend_cfg.num_mel_bins * frontend_cfg.stride != feat:
        frontend_cfg = dataclasses.replace(
            frontend_cfg, num_mel_bins=feat // frontend_cfg.stride)
    model_cfg = config_lib.ModelConfig(
        text=text_cfg, audio=audio_cfg, heads=heads_cfg, frontend=frontend_cfg)
    loss_cfg = config_lib.LossConfig(
        temperature=float(ckpt.get("temperature", 0.1)))
    return config_lib.ExperimentConfig(model=model_cfg, loss=loss_cfg)


def _head_params(sd: StateDict, heads: config_lib.HeadsConfig,
                 t_hidden: int, a_hidden: int) -> dict:
    out: dict = {}
    for m in ("text", "audio"):
        out[f"{m}_projection"] = {
            "dense_in": _lin(sd, f"{m}_projection.projection.0"),
            "dense_out": _lin(sd, f"{m}_projection.projection.3"),
            "norm": _ln(sd, f"{m}_projection.projection.4"),
        }
        if heads.use_attentive_pooling:
            out[f"{m}_pooling"] = {
                "score_in": _lin(sd, f"{m}_pooling.attention.0"),
                "score_out": _lin(sd, f"{m}_pooling.attention.2"),
            }
    if heads.use_cross_modal:
        for attn in ("text_to_audio_attention", "audio_to_text_attention"):
            out[attn] = {
                "query": _lin(sd, f"{attn}.query"),
                "key": _lin(sd, f"{attn}.key"),
                "value": _lin(sd, f"{attn}.value"),
                "out": _lin(sd, f"{attn}.out_proj"),
            }
        for m, hidden in (("text", t_hidden), ("audio", a_hidden)):
            out[f"{m}_fusion"] = _lin(sd, f"{m}_fusion.0")
            out[f"{m}_fusion_norm"] = _ln(sd, f"{m}_fusion.1")
            key = f"{m}_seq_to_projection"
            if f"{key}.weight" in sd:
                out[key] = _lin(sd, key)
            elif hidden == heads.projection_dim:
                # inference-variant checkpoint (model.py:285-295 attends over
                # raw hidden states): identity projection reproduces it exactly
                logger.warning("%s missing; using identity (model.py-era "
                               "checkpoint)", key)
                out[key] = {"kernel": np.eye(hidden, dtype=np.float32),
                            "bias": np.zeros(hidden, np.float32)}
            else:
                raise ValueError(
                    f"{key} missing and hidden {hidden} != projection "
                    f"{heads.projection_dim}: checkpoint is not loadable "
                    "(reference model.py would fail on it too)")
    if heads.use_word_alignment:
        wa = "word_level_alignment"
        d = heads.projection_dim
        in_w = sd[f"{wa}.alignment_attention.in_proj_weight"]   # [3D, D]
        in_b = sd[f"{wa}.alignment_attention.in_proj_bias"]
        out[wa] = {
            "text_proj": _lin(sd, f"{wa}.text_projection"),
            "audio_proj": _lin(sd, f"{wa}.audio_projection"),
            "attn_q": {"kernel": np.ascontiguousarray(in_w[:d].T),
                       "bias": in_b[:d]},
            "attn_k": {"kernel": np.ascontiguousarray(in_w[d:2 * d].T),
                       "bias": in_b[d:2 * d]},
            "attn_v": {"kernel": np.ascontiguousarray(in_w[2 * d:].T),
                       "bias": in_b[2 * d:]},
            "attn_out": _lin(sd, f"{wa}.alignment_attention.out_proj"),
            "output_proj": _lin(sd, f"{wa}.output_projection"),
            "norm": _ln(sd, f"{wa}.layer_norm"),
            "confidence_in": _lin(sd, f"{wa}.alignment_confidence.0"),
            "confidence_out": _lin(sd, f"{wa}.alignment_confidence.2"),
        }
    return out


def params_from_reference_checkpoint(ckpt: dict,
                                     cfg: config_lib.ExperimentConfig) -> dict:
    """Reference checkpoint dict → native params pytree for ``cfg.model``."""
    import jax

    from speech_transcript_embeddings_tpu.models import convert
    from speech_transcript_embeddings_tpu.models.dual_encoder import (
        DualEncoderModel, init_params,
    )

    sd = _np_state_dict(ckpt["model_state_dict"])
    model = DualEncoderModel(cfg.model)
    params = jax.tree.map(np.asarray,
                          init_params(model, jax.random.PRNGKey(0)))

    params["text_encoder"] = convert.convert_text_encoder(
        _strip(sd, "text_encoder."), cfg.model.text)
    params["audio_encoder"] = {
        **params["audio_encoder"],
        **convert.convert_audio_encoder(_strip(sd, "audio_encoder."),
                                        cfg.model.audio)}
    heads = _head_params(sd, cfg.model.heads,
                         cfg.model.text.hidden_size,
                         cfg.model.audio.hidden_size)
    for k, v in heads.items():
        if k not in params:
            raise KeyError(f"mapped head {k!r} not in model params "
                           f"(config flags mismatch)")
        params[k] = v
    return params


def load_reference_checkpoint(path: str):
    """torch.load a reference ``*.pt`` → (ExperimentConfig, params pytree)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "model_state_dict" not in ckpt:      # bare state dict
        ckpt = {"model_state_dict": ckpt}
    cfg = sniff_reference_config(ckpt)
    return cfg, params_from_reference_checkpoint(ckpt, cfg)
