#!/usr/bin/env python
"""Decompose the flagship train step on the real chip: forward-only vs
value_and_grad vs full step (adds the optax update) at B=32 — locates
whatever step time the conformer kernels don't explain."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, AUDIO_SECONDS, TLEN = 32, 10, 64


def timeit(fn, *args, n=8):
    import jax
    out = fn(*args)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from speech_transcript_embeddings_tpu.utils.compilation_cache import enable
    enable()
    from speech_transcript_embeddings_tpu import config as config_lib
    from speech_transcript_embeddings_tpu.models.dual_encoder import (
        DualEncoderModel, template_params,
    )
    from speech_transcript_embeddings_tpu.ops import make_frontend
    from speech_transcript_embeddings_tpu.training import (
        losses, optimizer as opt_lib,
    )
    from speech_transcript_embeddings_tpu.training.train_step import (
        create_train_state, make_train_step, resolve_frozen_dtype, model_batch_from_host,
    )

    asamps = AUDIO_SECONDS * 16000
    cfg = config_lib.ExperimentConfig(
        model=config_lib.flagship_model_config(),
        freeze=config_lib.FreezeConfig(mode="partial",
                                       text_layers_to_unfreeze=5,
                                       audio_layers_to_unfreeze=5),
        optimizer=config_lib.OptimizerConfig(learning_rate=5e-5,
                                             warmup_steps=100),
        data=config_lib.DataConfig(batch_size=B, max_text_length=TLEN,
                                   audio_buckets=(asamps,),
                                   max_audio_samples=asamps),
        train=config_lib.TrainConfig(num_epochs=1, accumulation_steps=1),
    )
    model = DualEncoderModel(cfg.model)
    frontend = make_frontend(cfg.model.frontend)
    params = template_params(model)
    labels = opt_lib.param_labels(params, cfg.freeze, cfg.model)
    trainable_labels, _ = opt_lib.split_params(labels, labels)
    tx = opt_lib.make_optimizer(cfg.optimizer, cfg.freeze, trainable_labels,
                                total_steps=1000)
    state = create_train_state(params, labels, tx,
                               frozen_dtype=resolve_frozen_dtype(cfg))
    train_step = make_train_step(cfg, model, frontend, tx)

    rng = np.random.default_rng(0)
    batch = {
        "waveform": rng.normal(scale=0.05,
                               size=(B, asamps)).astype(np.float32),
        "num_samples": np.full(B, asamps, np.int32),
        "input_ids_pos": rng.integers(4, cfg.model.text.vocab_size,
                                      size=(B, TLEN)).astype(np.int32),
        "attention_mask_pos": np.ones((B, TLEN), np.int32),
        "input_ids_neg": rng.integers(4, cfg.model.text.vocab_size,
                                      size=(B, TLEN)).astype(np.int32),
        "attention_mask_neg": np.ones((B, TLEN), np.int32),
    }
    key = jax.random.PRNGKey(1)

    def loss_fn(trainable, frozen, batch, rng):
        p = opt_lib.merge_params(trainable, frozen)
        mb = model_batch_from_host(frontend, batch)
        out = model.apply({"params": p}, mb, deterministic=False,
                          rngs={"dropout": rng})
        loss, _ = losses.compute_loss(cfg.loss, out)
        return loss

    fwd = jax.jit(loss_fn)
    vg = jax.jit(jax.value_and_grad(loss_fn))

    print(f"fwd-only (host batch):   {timeit(fwd, state.trainable, state.frozen, batch, key)*1e3:.1f} ms", flush=True)
    dbatch = jax.device_put(batch)
    jax.block_until_ready(dbatch)
    print(f"fwd-only (device batch): {timeit(fwd, state.trainable, state.frozen, dbatch, key)*1e3:.1f} ms", flush=True)
    print(f"value_and_grad (device): {timeit(vg, state.trainable, state.frozen, dbatch, key)*1e3:.1f} ms", flush=True)
    batch = dbatch

    # full step: donation mutates state, so re-create per timing run
    s = state
    for _ in range(2):
        s, metrics = train_step(s, batch, key)
    jax.block_until_ready(metrics["loss"])
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        s, metrics = train_step(s, batch, key)
    jax.block_until_ready(metrics["loss"])
    print(f"full train_step: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
