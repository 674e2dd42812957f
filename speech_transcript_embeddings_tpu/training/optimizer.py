"""Freeze schedule + optimizer: optax AdamW with discriminative learning rates.

Reproduces the reference's training-side parameter policy as optax machinery:
  * partial unfreezing — bottom encoder blocks frozen, top-N trainable, text
    embeddings and audio feature projection trainable (the reference freezes only
    the per-layer modules, trainer_unfreeze.py:362-422; the logged trainable-param
    counts confirm the embeddings stay trainable),
  * discriminative LRs — unfrozen *encoder* params at ``lr / 50`` vs full ``lr``
    for the heads (trainer_unfreeze.py:1487-1511),
  * linear warmup → linear decay over optimizer steps
    (``get_linear_schedule_with_warmup``, trainer_unfreeze.py:1537-1541),
  * global-norm clipping at 1.0 before each step (trainer_unfreeze.py:1102-1110),
  * gradient accumulation as ``optax.MultiSteps`` (reference: loss/acc_steps +
    step every acc_steps, trainer_unfreeze.py:1088-1117 — same mean-gradient
    semantics).

TPU-first: frozen parameters are *split out* of the differentiated pytree
(``split_params``), so the backward pass never computes or stores their gradients —
cheaper than the reference's requires_grad masking, and XLA prunes the dead
backward graph below the lowest trainable layer.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import optax
from flax import traverse_util

from speech_transcript_embeddings_tpu.config import FreezeConfig, ModelConfig, OptimizerConfig

FROZEN, ENCODER, HEAD = "frozen", "encoder", "head"


def _label_for(path: str, freeze: FreezeConfig, model: ModelConfig) -> str:
    in_text = path.startswith("text_encoder/")
    in_audio = path.startswith("audio_encoder/")
    if not (in_text or in_audio):
        return HEAD
    if freeze.mode == "none":
        return ENCODER
    if freeze.mode == "full":
        return FROZEN
    if freeze.mode != "partial":
        raise ValueError(f"Unknown freeze mode {freeze.mode!r}")
    # partial: freeze bottom blocks only
    if in_text:
        total, keep = model.text.num_layers, freeze.text_layers_to_unfreeze
        scan_bottom = model.text.scan_bottom
    else:
        total, keep = model.audio.num_layers, freeze.audio_layers_to_unfreeze
        scan_bottom = model.audio.scan_bottom
    parts = path.split("/")
    if len(parts) > 1 and parts[1] == "bottom_stack":
        # the scanned stack is a single stacked-param unit: it must lie entirely
        # inside the frozen prefix
        if scan_bottom > max(total - keep, 0):
            raise ValueError(
                f"scan_bottom={scan_bottom} overlaps the {keep} unfrozen top "
                f"layers of a {total}-layer encoder")
        return FROZEN
    if len(parts) > 1 and parts[1].startswith("layer_"):
        idx = int(parts[1].split("_")[1])
        return FROZEN if idx < total - keep else ENCODER
    # non-block params: text embeddings / audio feature projection follow their
    # FreezeConfig flags (reference parity: trainable)
    if in_text:
        return ENCODER if freeze.train_text_embeddings else FROZEN
    return ENCODER if freeze.train_audio_feature_projection else FROZEN


def param_labels(params, freeze: FreezeConfig, model: ModelConfig) -> Dict:
    flat = traverse_util.flatten_dict(params, sep="/")
    labels = {k: _label_for(k, freeze, model) for k in flat}
    return traverse_util.unflatten_dict(labels, sep="/")


def split_params(params, labels) -> Tuple[dict, dict]:
    """→ (trainable, frozen) flat-path dicts; differentiate only the former."""
    flat_p = traverse_util.flatten_dict(params, sep="/")
    flat_l = traverse_util.flatten_dict(labels, sep="/")
    trainable = {k: v for k, v in flat_p.items() if flat_l[k] != FROZEN}
    frozen = {k: v for k, v in flat_p.items() if flat_l[k] == FROZEN}
    return trainable, frozen


def merge_params(trainable: dict, frozen: dict):
    return traverse_util.unflatten_dict({**trainable, **frozen}, sep="/")


def linear_warmup_schedule(cfg: OptimizerConfig, total_steps: int):
    """HF get_linear_schedule_with_warmup: ramp 0→1 over warmup, then 1→0."""
    warmup = max(cfg.warmup_steps, 0)

    def factor(step):
        step = jax.numpy.minimum(step, total_steps)
        warm = jax.numpy.where(warmup > 0, step / jax.numpy.maximum(warmup, 1), 1.0)
        decay_span = jax.numpy.maximum(total_steps - warmup, 1)
        decay = (total_steps - step) / decay_span
        return jax.numpy.where(step < warmup, warm, jax.numpy.maximum(decay, 0.0))

    return factor


def make_optimizer(cfg: OptimizerConfig, freeze: FreezeConfig,
                   trainable_labels, total_steps: int,
                   accumulation_steps: int = 1) -> optax.GradientTransformation:
    """Optimizer over the *trainable* split (labels contain no FROZEN entries)."""
    factor = linear_warmup_schedule(cfg, total_steps)
    encoder_lr_scale = (1.0 / cfg.encoder_lr_divisor
                        if freeze.mode == "partial" else 1.0)

    import jax.numpy as jnp
    mu_dtype = jnp.dtype(cfg.mu_dtype) if cfg.mu_dtype else None

    def adamw(scale):
        return optax.adamw(
            learning_rate=lambda step: cfg.learning_rate * scale * factor(step),
            b1=cfg.b1, b2=cfg.b2, eps=cfg.eps, weight_decay=cfg.weight_decay,
            mu_dtype=mu_dtype)

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.multi_transform(
            {ENCODER: adamw(encoder_lr_scale), HEAD: adamw(1.0)},
            trainable_labels),
    )
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx
