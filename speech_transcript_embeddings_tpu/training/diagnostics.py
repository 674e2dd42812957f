"""Training diagnostics: gradient-accumulation self-check.

The reference ships ``validate_gradient_accumulation`` (trainer_unfreeze.py:
943-1021), which accumulates scaled losses over a few batches and eyeballs
gradient norms. The JAX version is *exact*: it verifies that the mean of
per-microbatch gradients equals the gradient of the concatenated batch (what
``optax.MultiSteps`` effectively applies), and reports the same norm warnings.
"""

from __future__ import annotations

import logging
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from speech_transcript_embeddings_tpu.config import ExperimentConfig
from speech_transcript_embeddings_tpu.training import losses, optimizer as opt_lib
from speech_transcript_embeddings_tpu.training.train_step import model_batch_from_host

logger = logging.getLogger("ste_tpu")


def _grads(cfg, model, frontend, trainable, frozen, batch):
    # always check with the pairwise loss: it is linear in per-sample terms, so
    # mean-of-microbatch grads == concatenated-batch grad holds exactly (the
    # global in-batch-negative loss couples samples by design, like the
    # reference's check which also used a simple pairwise surrogate)
    import dataclasses
    loss_cfg = dataclasses.replace(cfg.loss, kind="pairwise")

    def loss_fn(tr):
        params = opt_lib.merge_params(tr, frozen)
        mb = model_batch_from_host(frontend, batch)
        out = model.apply({"params": params}, mb, deterministic=True)
        loss, _ = losses.compute_loss(loss_cfg, out)
        return loss
    return jax.jit(jax.grad(loss_fn))(trainable)


def validate_gradient_accumulation(cfg: ExperimentConfig, model, frontend,
                                   state, batches: Sequence[Dict],
                                   rtol: float = 2e-2) -> dict:
    """Compare mean-of-microbatch gradients vs the concatenated-batch gradient.

    ``batches`` must share one shape (same audio bucket). Returns a report dict
    {"max_rel_err", "mean_grad_norm", "max_grad_norm", "ok"} and logs warnings
    for suspicious magnitudes (reference semantics: >100 → lower the LR,
    <1e-8 → raise it).
    """
    k = len(batches)
    if k < 2:
        logger.warning("Not enough test batches (%d) for accumulation validation", k)
        return {"ok": False, "reason": "not_enough_batches"}

    accum = None
    for b in batches:
        g = _grads(cfg, model, frontend, state.trainable, state.frozen, b)
        accum = g if accum is None else jax.tree.map(jnp.add, accum, g)
    accum = jax.tree.map(lambda x: x / k, accum)

    big = {key: np.concatenate([b[key] for b in batches], axis=0)
           for key in batches[0]}
    g_big = _grads(cfg, model, frontend, state.trainable, state.frozen, big)

    # global flattened comparison: per-param relative errors are meaningless for
    # parameters whose gradient is structurally zero (e.g. softmax-shift-
    # invariant biases), where both sides are pure float noise
    diffs, refs, norms = [], [], []
    for key in accum:
        a = np.asarray(accum[key], np.float64).ravel()
        gb = np.asarray(g_big[key], np.float64).ravel()
        diffs.append(a - gb)
        refs.append(gb)
        norms.append(np.linalg.norm(gb))
    max_rel = float(np.linalg.norm(np.concatenate(diffs))
                    / max(np.linalg.norm(np.concatenate(refs)), 1e-12))
    report = {
        "max_rel_err": max_rel,
        "mean_grad_norm": float(np.mean(norms)),
        "max_grad_norm": float(np.max(norms)),
        "ok": bool(max_rel < rtol),
    }
    logger.info("Gradient accumulation check: max relative error %.2e over %d "
                "microbatches", max_rel, k)
    if report["max_grad_norm"] > 100:
        logger.warning("Very large gradients detected - consider lowering the "
                       "learning rate")
    elif report["max_grad_norm"] < 1e-8:
        logger.warning("Very small gradients detected - consider increasing the "
                       "learning rate")
    else:
        logger.info("Gradient magnitudes look reasonable")
    return report
