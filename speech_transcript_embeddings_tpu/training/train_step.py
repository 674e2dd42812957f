"""Jitted train / eval steps.

One ``train_step`` call = host batch in → frontend (on device) → dual-encoder
forward → contrastive loss → backward over the *trainable* split only → optax
update (clip → discriminative-LR AdamW, optionally accumulated via MultiSteps).
The whole chain is a single XLA program per audio bucket; under a mesh the batch
is sharded on ``data`` and parameters per ``parallel/mesh.py`` rules, with XLA
inserting the gradient psums and (for the global loss) the embedding all-gathers.

Replaces the reference's per-batch Python loop work — H2D copies, autocast,
GradScaler, clip, scheduler bookkeeping (trainer_unfreeze.py:1026-1162) — with
compiled code; there is no GradScaler because bf16 on TPU needs no loss scaling.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from speech_transcript_embeddings_tpu.config import ExperimentConfig
from speech_transcript_embeddings_tpu.models.dual_encoder import DualEncoderModel
from speech_transcript_embeddings_tpu.ops.frontend import LogMelFrontend
from speech_transcript_embeddings_tpu.training import losses, optimizer as opt_lib


class TrainState(struct.PyTreeNode):
    step: jax.Array                      # optimizer micro-steps taken
    trainable: Dict[str, jax.Array]      # flat path → param
    frozen: Dict[str, jax.Array]
    opt_state: optax.OptState


def create_train_state(params, labels, tx,
                       frozen_dtype: str = "float32") -> TrainState:
    trainable, frozen = opt_lib.split_params(params, labels)
    if frozen_dtype != "float32":
        # store the frozen split at the compute dtype: no per-step cast, half
        # the HBM residency and weight-read traffic (FreezeConfig.frozen_dtype)
        dt = jnp.dtype(frozen_dtype)
        frozen = {k: jnp.asarray(v, dt) for k, v in frozen.items()}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        frozen=frozen,
        opt_state=tx.init(trainable),
    )


def resolve_frozen_dtype(cfg: ExperimentConfig) -> str:
    """FreezeConfig.frozen_dtype, defaulting to the model compute dtype."""
    return cfg.freeze.frozen_dtype or cfg.model.dtype


def model_batch_from_host(frontend: LogMelFrontend, batch: dict) -> dict:
    """Run the on-device frontend and assemble the model's batch dict."""
    features, audio_mask = frontend(batch["waveform"], batch["num_samples"])
    return {
        "input_ids_pos": batch["input_ids_pos"],
        "attention_mask_pos": batch["attention_mask_pos"],
        "input_ids_neg": batch["input_ids_neg"],
        "attention_mask_neg": batch["attention_mask_neg"],
        "input_features": features,
        "attention_mask_audio": audio_mask,
    }


def _per_sample_eval_loss(cfg, aux: losses.LossAux, alignment_scores):
    """Per-sample 2-way CE (+ alignment factor + corrupt penalty), for exact
    masked eval metrics: CE over [s_pos, s_neg]/τ == softplus((s_neg-s_pos)/τ)."""
    per = jax.nn.softplus((aux.s_neg - aux.s_pos) / cfg.temperature)
    if alignment_scores is not None:
        per = per * (1.0 - jax.nn.sigmoid(alignment_scores.mean(axis=1))
                     * cfg.alignment_weight)
    if cfg.corrupt_gamma > 0:
        per = per + cfg.corrupt_gamma * jax.nn.relu(aux.s_neg)
    return per


def make_train_step(cfg: ExperimentConfig, model: DualEncoderModel,
                    frontend: LogMelFrontend, tx):
    """→ jitted (state, host_batch, rng) → (state, metrics)."""

    def loss_fn(trainable, frozen, batch, rng):
        params = opt_lib.merge_params(trainable, frozen)
        mb = model_batch_from_host(frontend, batch)
        out = model.apply({"params": params}, mb, deterministic=False,
                          rngs={"dropout": rng})
        loss, aux = losses.compute_loss(cfg.loss, out)
        return loss, (aux, out.alignment_scores)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict, rng: jax.Array
                   ) -> Tuple[TrainState, dict]:
        (loss, (aux, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, state.frozen, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = state.replace(step=state.step + 1, trainable=trainable,
                                  opt_state=opt_state)
        t = cfg.loss.temperature
        metrics = {
            "loss": loss,
            "clean_hr": losses.to_human_readable(aux.s_pos, t).mean(),
            "corrupt_hr": losses.to_human_readable(aux.s_neg, t).mean(),
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step


def make_eval_step(cfg: ExperimentConfig, model: DualEncoderModel,
                   frontend: LogMelFrontend):
    """→ jitted (params-like state, host_batch) → per-batch sums + raw cosines.

    ``loss_sum`` is the *training objective* (the reference evaluates with its
    training loss, trainer_unfreeze.py:1202-1213): the pairwise per-sample CE
    for kind='pairwise', and the masked in-batch InfoNCE (padded candidate
    columns removed) for kind='global' — so best-loss checkpoint selection
    optimises the quantity training optimises. ``pairwise_loss_sum`` carries the
    per-sample pairwise metric in both modes for cross-run comparability.
    """

    @jax.jit
    def eval_step(trainable, frozen, batch) -> dict:
        params = opt_lib.merge_params(trainable, frozen)
        mb = model_batch_from_host(frontend, batch)
        out = model.apply({"params": params}, mb, deterministic=True)
        aux = losses.LossAux(
            s_pos=jnp.sum(out.audio * out.text_pos, -1),
            s_neg=jnp.sum(out.audio * out.text_neg, -1))
        per_pair = _per_sample_eval_loss(cfg.loss, aux, out.alignment_scores)
        m = batch["example_mask"]
        if cfg.loss.kind == "global":
            per_obj = losses.global_per_sample_masked(
                cfg.loss, out.text_pos, out.text_neg, out.audio, m,
                out.alignment_scores)
        else:
            per_obj = per_pair
        # similarity metrics are computed host-side from the raw cosines (the
        # human-readable sigmoid is cheap there and needs the full arrays for
        # median/std anyway)
        return {
            "loss_sum": jnp.sum(per_obj * m),
            "pairwise_loss_sum": jnp.sum(per_pair * m),
            "count": jnp.sum(m),
            "s_pos": aux.s_pos,
            "s_neg": aux.s_neg,
            "example_mask": m,
        }

    return eval_step


def make_embed_step(model: DualEncoderModel, frontend: LogMelFrontend):
    """→ jitted (trainable, frozen, batch) → normalised (text_emb, audio_emb)."""

    @jax.jit
    def embed_step(trainable, frozen, batch):
        from speech_transcript_embeddings_tpu.ops import quant
        params = opt_lib.merge_params(trainable, frozen)
        features, audio_mask = frontend(batch["waveform"], batch["num_samples"])
        mb = {
            "input_ids": batch["input_ids"],
            "attention_mask": batch["attention_mask"],
            "input_features": features,
            "attention_mask_audio": audio_mask,
        }
        # int8 interceptor: no-op unless the params were quantized
        # (ops/quant.py), in which case Dense matmuls take the int8 MXU path
        with quant.intercept_int8():
            return model.apply({"params": params}, mb, deterministic=True)

    return embed_step
