"""Contrastive losses.

Two selectable losses (LossConfig.kind):

* ``pairwise`` — reference parity: 2-way InfoNCE as cross-entropy over
  ``[s_pos, s_neg] / τ`` with optional alignment weighting and a corrupt penalty
  (reference ``AlignmentAwareInfoNCE``, trainer_unfreeze.py:702-742).

* ``global`` — TPU-native in-batch-negative InfoNCE over the *global* batch: each
  audio clip is scored against every clean transcript in the global batch plus every
  corrupted transcript; embeddings are all-gathered across the ``data`` mesh axis
  over ICI (BASELINE.json north star). Reduces to single-host in-batch negatives
  when no axis is given.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from speech_transcript_embeddings_tpu.config import LossConfig


class LossAux(NamedTuple):
    s_pos: jax.Array    # [B] cosine(audio, clean text)
    s_neg: jax.Array    # [B] cosine(audio, corrupted text)


# Test hook: when set, ``global_info_nce`` reports the GSPMD-decided sharding of
# its logits matrix (used to verify that logits stay [B_local, 2·B_global]-sharded
# in the compiled train step rather than replicated).
_LOGITS_SHARDING_CB = None


def to_human_readable(cosine: jax.Array, temperature: float = 0.1,
                      scale: str = "prob") -> jax.Array:
    """Map raw cosine (-1..1) to an intuitive 0..1 score.

    Parity with the reference (trainer_unfreeze.py:924-939), except the temperature
    follows the configured loss temperature instead of being hard-coded.
    """
    if scale == "0to1":
        return (cosine + 1.0) * 0.5
    if scale == "prob":
        return jax.nn.sigmoid(cosine / temperature)
    raise ValueError(f"Unknown scale {scale!r}")


def _alignment_factor(alignment_scores: Optional[jax.Array],
                      alignment_weight: float):
    if alignment_scores is None:
        return None
    mean_align = alignment_scores.mean(axis=1)
    return 1.0 - jax.nn.sigmoid(mean_align) * alignment_weight


def pairwise_info_nce(cfg: LossConfig, text_pos, text_neg, audio,
                      alignment_scores=None):
    """CE over the 2-way choice {clean, corrupt} per sample."""
    s_pos = jnp.sum(audio * text_pos, axis=-1)
    s_neg = jnp.sum(audio * text_neg, axis=-1)
    logits = jnp.stack([s_pos, s_neg], axis=1) / cfg.temperature
    per_sample = -jax.nn.log_softmax(logits, axis=1)[:, 0]
    factor = _alignment_factor(alignment_scores, cfg.alignment_weight)
    if factor is not None:
        per_sample = per_sample * factor
    loss = per_sample.mean()
    if cfg.corrupt_gamma > 0:
        loss = loss + cfg.corrupt_gamma * jax.nn.relu(s_neg).mean()
    return loss, LossAux(s_pos=s_pos, s_neg=s_neg)


def global_info_nce(cfg: LossConfig, text_pos, text_neg, audio,
                    alignment_scores=None, axis_name: Optional[str] = None):
    """In-batch-negative InfoNCE over the global batch.

    Per local audio row i the candidate set is [all clean transcripts (global),
    all corrupted transcripts (global)]; the target is clip i's own clean
    transcript.

    Two execution forms, both keeping the logits sharded so no device ever
    materialises the full global score matrix:
      * under ``shard_map`` pass ``axis_name`` — text embeddings are explicitly
        all-gathered over ICI and each device holds ``[B_local, 2·B_global]``;
      * under plain ``jit`` on a mesh (the shipped train path) leave
        ``axis_name=None`` — GSPMD partitions the ``[B, 2B]`` matmul itself; on
        the 8-way data mesh it picks the transpose layout ``[B_global,
        2·B_local]`` (gathering only the audio embeddings, half the traffic of
        gathering both text tensors) — verified sharded, never replicated, in
        ``tests/test_training.py::test_global_loss_train_step_sharded_and_correct``.
    """
    if axis_name is not None:
        all_pos = jax.lax.all_gather(text_pos, axis_name, tiled=True)
        all_neg = jax.lax.all_gather(text_neg, axis_name, tiled=True)
        shard = jax.lax.axis_index(axis_name)
    else:
        all_pos, all_neg = text_pos, text_neg
        shard = 0
    b_local = audio.shape[0]
    b_global = all_pos.shape[0]

    cand = jnp.concatenate([all_pos, all_neg], axis=0)        # [2·Bg, D]
    logits = (audio @ cand.T) / cfg.temperature               # [Bl, 2·Bg]
    if _LOGITS_SHARDING_CB is not None:
        jax.debug.inspect_array_sharding(logits, callback=_LOGITS_SHARDING_CB)
    labels = shard * b_local + jnp.arange(b_local)
    per_sample = -jax.nn.log_softmax(logits, axis=-1)[
        jnp.arange(b_local), labels]
    factor = _alignment_factor(alignment_scores, cfg.alignment_weight)
    if factor is not None:
        per_sample = per_sample * factor
    loss = per_sample.mean()

    s_pos = jnp.sum(audio * text_pos, axis=-1)
    s_neg = jnp.sum(audio * text_neg, axis=-1)
    if cfg.corrupt_gamma > 0:
        loss = loss + cfg.corrupt_gamma * jax.nn.relu(s_neg).mean()
    return loss, LossAux(s_pos=s_pos, s_neg=s_neg)


def global_per_sample_masked(cfg: LossConfig, text_pos, text_neg, audio,
                             example_mask, alignment_scores=None):
    """Per-sample in-batch InfoNCE for *evaluation* under masked tails.

    Eval batches pad their tail with duplicated rows carrying ``example_mask=0``
    (pipeline.py ``_emit``); a duplicated clean transcript would appear as a
    spurious hard negative in the softmax, so candidate columns belonging to
    padded rows are masked out before the log-softmax. Returns the per-sample
    training objective (CE + alignment factor + corrupt penalty); entries for
    invalid rows are meaningless and must be zeroed by the caller's mask.
    """
    b = audio.shape[0]
    cand = jnp.concatenate([text_pos, text_neg], axis=0)        # [2B, D]
    logits = (audio @ cand.T) / cfg.temperature                 # [B, 2B]
    cmask = jnp.concatenate([example_mask, example_mask], axis=0) > 0
    logits = jnp.where(cmask[None, :], logits, jnp.finfo(logits.dtype).min)
    idx = jnp.arange(b)
    per = -jax.nn.log_softmax(logits, axis=-1)[idx, idx]
    factor = _alignment_factor(alignment_scores, cfg.alignment_weight)
    if factor is not None:
        per = per * factor
    if cfg.corrupt_gamma > 0:
        s_neg = jnp.sum(audio * text_neg, axis=-1)
        per = per + cfg.corrupt_gamma * jax.nn.relu(s_neg)
    return per


def compute_loss(cfg: LossConfig, output, axis_name: Optional[str] = None):
    """Dispatch on cfg.kind given a PosNegOutput."""
    if cfg.kind == "pairwise":
        return pairwise_info_nce(cfg, output.text_pos, output.text_neg,
                                 output.audio, output.alignment_scores)
    if cfg.kind == "global":
        return global_info_nce(cfg, output.text_pos, output.text_neg,
                               output.audio, output.alignment_scores, axis_name)
    raise ValueError(f"Unknown loss kind {cfg.kind!r}")
