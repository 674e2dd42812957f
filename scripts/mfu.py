#!/usr/bin/env python
"""Measure MFU (model FLOP utilization) of the conformer forward and the full
flagship training step on the attached TPU chip.

FLOPs come from XLA's cost analysis of a *counting compile*: the same
computation compiled with the frozen-block ``lax.scan`` unrolled
(``scan_bottom=1``) and the Pallas kernels disabled — XLA's
``cost_analysis()`` counts a scan body once (not ×N iterations) and cannot see
inside Pallas custom calls. The counting executable is never run; timing uses
the real flagship configuration (scan + flash attention + Pallas frontend).

For the conformer forward the counting compile is exact model FLOPs →
**MFU** = model_flops / time / peak. For the train step the counting compile
must keep remat on (the 877M unrolled no-remat program exceeds HBM at the AOT
stage), so its FLOPs include remat recompute — the reported ratio is **HFU**
(hardware FLOP utilization, ≥ MFU).

Peak bf16 matmul throughput per chip by device kind: v5e ≈ 197 TFLOP/s,
v4 ≈ 275, v5p ≈ 459, v6e ≈ 918.

Usage: python scripts/mfu.py [--batch 32] [--seconds 10]
Writes one JSON line per measurement.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = {
    "v5 lite": 197e12,
    "v5litepod": 197e12,
    "v5e": 197e12,
    "v4": 275e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


def detect_peak(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, val in PEAK_BF16.items():
        if key in kind:
            return val
    return 197e12  # default to v5e


def _flagship(batch, asamps, tlen, counting: bool, remat: bool = True):
    """Experiment config: flagship kernels for timing, unrolled/XLA-only
    for FLOP counting."""
    from speech_transcript_embeddings_tpu import config as config_lib

    if counting:
        m = config_lib.ModelConfig(dtype="bfloat16", remat=remat)
        m = dataclasses.replace(
            m, text=dataclasses.replace(m.text, scan_bottom=1),
            audio=dataclasses.replace(m.audio, scan_bottom=1,
                                      use_flash_attention=False),
            frontend=dataclasses.replace(m.frontend, use_pallas=False))
    else:
        m = dataclasses.replace(config_lib.flagship_model_config(),
                                remat=remat)
    return config_lib.ExperimentConfig(
        model=m,
        freeze=config_lib.FreezeConfig(mode="partial", text_layers_to_unfreeze=5,
                                       audio_layers_to_unfreeze=5),
        optimizer=config_lib.OptimizerConfig(learning_rate=5e-5,
                                             warmup_steps=100),
        data=config_lib.DataConfig(batch_size=batch, max_text_length=tlen,
                                   audio_buckets=(asamps,),
                                   max_audio_samples=asamps),
        train=config_lib.TrainConfig(num_epochs=1, accumulation_steps=1),
    )


def _train_step_setup(cfg):
    from speech_transcript_embeddings_tpu.models.dual_encoder import (
        DualEncoderModel, template_params,
    )
    from speech_transcript_embeddings_tpu.ops import make_frontend
    from speech_transcript_embeddings_tpu.training import optimizer as opt_lib
    from speech_transcript_embeddings_tpu.training.train_step import (
        create_train_state, make_train_step, resolve_frozen_dtype,
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
    return make_train_step(cfg, model, frontend, tx), state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=int, default=10)
    ap.add_argument("--text-len", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from speech_transcript_embeddings_tpu.utils.compilation_cache import enable
    enable()

    from speech_transcript_embeddings_tpu.models.audio_encoder import AudioEncoder
    from speech_transcript_embeddings_tpu.ops import make_frontend

    dev = jax.devices()[0]
    peak = detect_peak(dev)
    b, asamps, tlen = args.batch, args.seconds * 16000, args.text_len
    results = []

    cfg_time = _flagship(b, asamps, tlen, counting=False)
    cfg_count = _flagship(b, asamps, tlen, counting=True)

    # ---- conformer forward alone (the VERDICT r1 MFU target) ----
    frontend = make_frontend(cfg_time.model.frontend)
    wav = jnp.asarray(np.random.default_rng(0).normal(
        scale=0.05, size=(b, asamps)).astype(np.float32))
    nsamp = jnp.full((b,), asamps, jnp.int32)
    feats, famask = jax.jit(frontend)(wav, nsamp)
    jax.block_until_ready(feats)

    def count_flops_fwd(acfg):
        enc = AudioEncoder(acfg, dtype=jnp.bfloat16)
        shapes = jax.eval_shape(
            lambda k: enc.init(k, feats, famask, deterministic=True)["params"],
            jax.random.PRNGKey(0))
        fwd = jax.jit(lambda p, x, am: enc.apply(
            {"params": p}, x, am, deterministic=True))
        return enc, shapes, fwd

    # counting compile: unrolled, XLA attention
    _, cshapes, cfwd = count_flops_fwd(cfg_count.model.audio)
    flops = cfwd.lower(cshapes, feats, famask).compile().cost_analysis()["flops"]

    # timed run: flagship kernels
    enc, _, fwd = count_flops_fwd(cfg_time.model.audio)
    enc_params = jax.jit(
        lambda k: enc.init(k, feats, famask, deterministic=True)["params"]
    )(jax.random.PRNGKey(0))
    out = None
    for _ in range(2):
        out = fwd(enc_params, feats, famask)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        out = fwd(enc_params, feats, famask)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    results.append({
        "what": "conformer_forward", "batch": b, "frames": int(feats.shape[1]),
        "ms": round(dt * 1e3, 2), "model_tflops": round(flops / 1e12, 2),
        "mfu": round(flops / dt / peak, 4),
    })

    # ---- full flagship train step ----
    # device-resident batches, one DISTINCT batch per step (the loop overlaps
    # H2D via async device_put in its prefetch worker; repeating one device
    # batch lets cached execution short-circuit) — matches bench.py
    rng = np.random.default_rng(0)

    def make_batch():
        return jax.device_put({
            "waveform": rng.normal(scale=0.05,
                                   size=(b, asamps)).astype(np.float32),
            "num_samples": np.full(b, asamps, np.int32),
            "input_ids_pos": rng.integers(4, cfg_time.model.text.vocab_size,
                                          size=(b, tlen)).astype(np.int32),
            "attention_mask_pos": np.ones((b, tlen), np.int32),
            "input_ids_neg": rng.integers(4, cfg_time.model.text.vocab_size,
                                          size=(b, tlen)).astype(np.int32),
            "attention_mask_neg": np.ones((b, tlen), np.int32),
        })

    key = jax.random.PRNGKey(1)
    n = 8
    batches = [make_batch() for _ in range(2 + n)]
    jax.block_until_ready(batches)

    # counting compile (never executed); remat stays on → executed FLOPs (HFU)
    ctrain, cstate = _train_step_setup(cfg_count)
    exec_flops = ctrain.lower(
        cstate, batches[0], key).compile().cost_analysis()["flops"]
    del ctrain, cstate

    train_step, state = _train_step_setup(cfg_time)
    for i in range(2):
        state, metrics = train_step(state, batches[i], key)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = train_step(state, batches[2 + i], key)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / n
    results.append({
        "what": "flagship_train_step", "batch": b,
        "ms": round(dt * 1e3, 2), "executed_tflops": round(exec_flops / 1e12, 2),
        "hfu": round(exec_flops / dt / peak, 4),
        "clips_per_sec": round(b / dt, 1),
    })

    for r in results:
        r["device"] = dev.device_kind
        r["peak_tflops"] = peak / 1e12
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
