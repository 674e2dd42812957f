"""PyTorch (HuggingFace) → JAX parameter conversion for the pretrained encoders.

The reference consumes pretrained encoders directly through
``transformers.AutoModel.from_pretrained`` (model.py:150-152); our encoders are
native Flax modules, so published torch checkpoints are converted once into the
matching parameter pytrees. Input is a flat ``{name: np.ndarray}`` state dict
(obtain with ``{k: v.detach().numpy() for k, v in model.state_dict().items()}``), so
torch never needs to be imported on the training host.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from speech_transcript_embeddings_tpu.config import (
    AudioEncoderConfig,
    TextEncoderConfig,
)

Array = np.ndarray
StateDict = Mapping[str, Array]


def _dense(sd: StateDict, prefix: str) -> Dict[str, Array]:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _layer_norm(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _stack_layers(layers):
    """Stack a list of identical layer param trees on a new leading axis
    (the nn.scan layout)."""
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *layers)


def convert_text_encoder(sd: StateDict, cfg: TextEncoderConfig) -> dict:
    """HF {Roberta,XLMRoberta,Bert}Model state dict → TextEncoder params."""
    # some checkpoints carry a "roberta." / "bert." prefix
    for p in ("roberta.", "bert.", "model."):
        if any(k.startswith(p) for k in sd):
            sd = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
            break
    params: dict = {
        "embeddings": {
            "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
            "position_embeddings": {
                "embedding": sd["embeddings.position_embeddings.weight"]},
            "token_type_embeddings": {
                "embedding": sd["embeddings.token_type_embeddings.weight"]},
            "norm": _layer_norm(sd, "embeddings.LayerNorm"),
        }
    }
    def layer_params(i: int) -> dict:
        p = f"encoder.layer.{i}"
        return {
            "attention": {
                "query": _dense(sd, f"{p}.attention.self.query"),
                "key": _dense(sd, f"{p}.attention.self.key"),
                "value": _dense(sd, f"{p}.attention.self.value"),
                "out": _dense(sd, f"{p}.attention.output.dense"),
                "norm": _layer_norm(sd, f"{p}.attention.output.LayerNorm"),
            },
            "intermediate": _dense(sd, f"{p}.intermediate.dense"),
            "output": _dense(sd, f"{p}.output.dense"),
            "norm": _layer_norm(sd, f"{p}.output.LayerNorm"),
        }

    if cfg.scan_bottom:
        params["bottom_stack"] = {"scan": {"block": _stack_layers(
            [layer_params(i) for i in range(cfg.scan_bottom)])}}
    for i in range(cfg.scan_bottom, cfg.num_layers):
        params[f"layer_{i}"] = layer_params(i)
    return params


def convert_audio_encoder(sd: StateDict, cfg: AudioEncoderConfig) -> dict:
    """HF Wav2Vec2BertModel state dict → AudioEncoder params."""
    for p in ("wav2vec2_bert.", "model."):
        if any(k.startswith(p) for k in sd):
            sd = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
            break
    params: dict = {
        "feature_norm": _layer_norm(sd, "feature_projection.layer_norm"),
        "feature_projection": _dense(sd, "feature_projection.projection"),
    }
    if "masked_spec_embed" in sd:
        params["masked_spec_embed"] = sd["masked_spec_embed"]
    def layer_params(i: int) -> dict:
        p = f"encoder.layers.{i}"
        return {
            "ffn1_norm": _layer_norm(sd, f"{p}.ffn1_layer_norm"),
            "ffn1": {
                "intermediate": _dense(sd, f"{p}.ffn1.intermediate_dense"),
                "output": _dense(sd, f"{p}.ffn1.output_dense"),
            },
            "attention_norm": _layer_norm(sd, f"{p}.self_attn_layer_norm"),
            "attention": {
                "query": _dense(sd, f"{p}.self_attn.linear_q"),
                "key": _dense(sd, f"{p}.self_attn.linear_k"),
                "value": _dense(sd, f"{p}.self_attn.linear_v"),
                "out": _dense(sd, f"{p}.self_attn.linear_out"),
                "distance_embedding": sd[f"{p}.self_attn.distance_embedding.weight"],
            },
            "conv": {
                "norm": _layer_norm(sd, f"{p}.conv_module.layer_norm"),
                # torch Conv1d weight [out, in, 1] → dense kernel [in, out]
                "pointwise1": {"kernel": np.ascontiguousarray(
                    sd[f"{p}.conv_module.pointwise_conv1.weight"][:, :, 0].T)},
                # torch depthwise [C, 1, K] → lax "TIO" kernel [K, 1, C]
                "depthwise_kernel": np.ascontiguousarray(
                    sd[f"{p}.conv_module.depthwise_conv.weight"].transpose(2, 1, 0)),
                "depthwise_norm": _layer_norm(sd, f"{p}.conv_module.depthwise_layer_norm"),
                "pointwise2": {"kernel": np.ascontiguousarray(
                    sd[f"{p}.conv_module.pointwise_conv2.weight"][:, :, 0].T)},
            },
            "ffn2_norm": _layer_norm(sd, f"{p}.ffn2_layer_norm"),
            "ffn2": {
                "intermediate": _dense(sd, f"{p}.ffn2.intermediate_dense"),
                "output": _dense(sd, f"{p}.ffn2.output_dense"),
            },
            "final_norm": _layer_norm(sd, f"{p}.final_layer_norm"),
        }

    if cfg.scan_bottom:
        params["bottom_stack"] = {"scan": {"block": _stack_layers(
            [layer_params(i) for i in range(cfg.scan_bottom)])}}
    for i in range(cfg.scan_bottom, cfg.num_layers):
        params[f"layer_{i}"] = layer_params(i)
    return params


def restack_encoder_params(params: dict, from_scan: int, to_scan: int,
                           num_layers: int) -> dict:
    """Convert one encoder's param tree between scan_bottom layouts.

    Checkpoints are tied to the layout they were trained with; this adapter
    unstacks ``bottom_stack/scan/block`` back into ``layer_i`` subtrees (or
    restacks them) so a checkpoint can be loaded under a different
    ``scan_bottom`` setting.
    """
    import jax

    if from_scan == to_scan:
        return params
    out = {k: v for k, v in params.items()
           if k != "bottom_stack" and not k.startswith("layer_")}
    # explode to per-layer trees
    layers = {}
    if from_scan:
        stacked = params["bottom_stack"]["scan"]["block"]
        for i in range(from_scan):
            layers[i] = jax.tree.map(lambda x: np.asarray(x[i]), stacked)
    for i in range(from_scan, num_layers):
        layers[i] = params[f"layer_{i}"]
    # reassemble in the target layout
    if to_scan:
        if to_scan > num_layers:
            raise ValueError(f"to_scan {to_scan} > num_layers {num_layers}")
        out["bottom_stack"] = {"scan": {"block": _stack_layers(
            [jax.tree.map(np.asarray, layers[i]) for i in range(to_scan)])}}
    for i in range(to_scan, num_layers):
        out[f"layer_{i}"] = layers[i]
    return out


def text_config_from_hf(hf_config) -> TextEncoderConfig:
    return TextEncoderConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        pad_token_id=hf_config.pad_token_id,
        layer_norm_eps=hf_config.layer_norm_eps,
        hidden_dropout=hf_config.hidden_dropout_prob,
        attention_dropout=hf_config.attention_probs_dropout_prob,
    )


def audio_config_from_hf(hf_config) -> AudioEncoderConfig:
    return AudioEncoderConfig(
        feature_dim=hf_config.feature_projection_input_dim,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        conv_kernel_size=hf_config.conv_depthwise_kernel_size,
        left_max_rel_pos=hf_config.left_max_position_embeddings,
        right_max_rel_pos=hf_config.right_max_position_embeddings,
        layer_norm_eps=hf_config.layer_norm_eps,
        hidden_dropout=hf_config.hidden_dropout,
        attention_dropout=hf_config.attention_dropout,
        conv_dropout=hf_config.conformer_conv_dropout,
        activation_dropout=hf_config.activation_dropout,
        feat_proj_dropout=hf_config.feat_proj_dropout,
        apply_spec_augment=hf_config.apply_spec_augment,
        mask_time_prob=hf_config.mask_time_prob,
        mask_time_length=hf_config.mask_time_length,
        mask_time_min_masks=hf_config.mask_time_min_masks,
    )
