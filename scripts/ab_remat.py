#!/usr/bin/env python
"""A/B the audio-encoder remat policy on the real chip at flagship shapes.

Runs the exact bench.py training step twice — remat_policy='full' (recompute
everything in the backward replay) vs 'save_flash' (keep the flash kernel's
(out, lse) so the replay skips re-running the forward attention kernel) — and
prints warm step times. Decides whether the flagship preset should ship with
save_flash (config.py AudioEncoderConfig.remat_policy).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 64
AUDIO_SECONDS = 10
TEXT_LEN = 64
WARMUP_STEPS = 2
MEASURE_STEPS = 10


def build(variant: str):
    """``variant`` = remat policy, optionally suffixed ``+f32frozen`` to store
    the frozen param split in float32 (the pre-round-3 behavior) instead of
    the compute dtype — A/Bs FreezeConfig.frozen_dtype."""
    from speech_transcript_embeddings_tpu import config as config_lib
    from speech_transcript_embeddings_tpu.models.dual_encoder import (
        DualEncoderModel, template_params,
    )
    from speech_transcript_embeddings_tpu.ops import make_frontend
    from speech_transcript_embeddings_tpu.training import optimizer as opt_lib
    from speech_transcript_embeddings_tpu.training.train_step import (
        create_train_state, make_train_step, resolve_frozen_dtype,
    )

    parts = variant.split("+")
    policy, tags = parts[0], set(parts[1:])
    unknown = tags - {"f32frozen", "bf16mu", "frozenemb"}
    if unknown:
        raise SystemExit(f"Unknown variant suffix(es) {sorted(unknown)} in "
                         f"{variant!r} (known: '+f32frozen', '+bf16mu', "
                         "'+frozenemb')")
    frozen_dtype = "float32" if "f32frozen" in tags else None
    mu_dtype = "bfloat16" if "bf16mu" in tags else None
    # '+frozenemb' freezes the text embedding table and audio feature
    # projection (FreezeConfig.train_*), so backprop stops at the lowest
    # unfrozen block instead of traversing every block down to the inputs
    train_bottom = "frozenemb" not in tags
    asamps = AUDIO_SECONDS * 16000
    m = config_lib.flagship_model_config()
    m = dataclasses.replace(
        m, audio=dataclasses.replace(m.audio, remat_policy=policy))
    cfg = config_lib.ExperimentConfig(
        model=m,
        freeze=config_lib.FreezeConfig(mode="partial", text_layers_to_unfreeze=5,
                                       audio_layers_to_unfreeze=5,
                                       frozen_dtype=frozen_dtype,
                                       train_text_embeddings=train_bottom,
                                       train_audio_feature_projection=train_bottom),
        optimizer=config_lib.OptimizerConfig(learning_rate=5e-5,
                                             warmup_steps=100,
                                             mu_dtype=mu_dtype),
        data=config_lib.DataConfig(batch_size=BATCH, max_text_length=TEXT_LEN,
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
    step = make_train_step(cfg, model, frontend, tx)
    return state, step, asamps, cfg


def measure(variant: str):
    import jax
    state, step, asamps, cfg = build(variant)
    rng = np.random.default_rng(0)

    # one DISTINCT device-resident batch per step (same measurement rule as
    # bench.py): repeating one device batch lets a relay-cached execution
    # short-circuit, and a host batch would serialize H2D ahead of compute
    def make_batch():
        return jax.device_put({
            "waveform": rng.normal(scale=0.05,
                                   size=(BATCH, asamps)).astype(np.float32),
            "num_samples": rng.integers(asamps * 3 // 4, asamps,
                                        size=BATCH).astype(np.int32),
            "input_ids_pos": rng.integers(
                4, cfg.model.text.vocab_size,
                size=(BATCH, TEXT_LEN)).astype(np.int32),
            "attention_mask_pos": np.ones((BATCH, TEXT_LEN), np.int32),
            "input_ids_neg": rng.integers(
                4, cfg.model.text.vocab_size,
                size=(BATCH, TEXT_LEN)).astype(np.int32),
            "attention_mask_neg": np.ones((BATCH, TEXT_LEN), np.int32),
        })

    batches = [make_batch() for _ in range(WARMUP_STEPS + MEASURE_STEPS)]
    jax.block_until_ready(batches)
    key = jax.random.PRNGKey(1)
    for i in range(WARMUP_STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batches[i], sub)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batches[WARMUP_STEPS + i], sub)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / MEASURE_STEPS
    del state
    return dt


def main():
    global BATCH
    from speech_transcript_embeddings_tpu.utils.compilation_cache import enable
    enable()
    args = list(sys.argv[1:])
    if args and args[0].startswith("--batch="):
        BATCH = int(args.pop(0).split("=")[1])
    results = {}
    for policy in args or ("full", "save_flash"):
        dt = measure(policy)
        results[policy] = dt
        print(f"{policy}: B={BATCH} {dt * 1e3:.1f} ms/step "
              f"({BATCH / dt:.1f} clips/s)", flush=True)
    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
