#!/usr/bin/env python
"""Headline benchmark: training throughput of the SHIPPED north-star recipe.

Measures warm-step clips/sec/chip of the full jitted training step of
``preset=retrieval`` (the configuration this framework ships for the v5e-8,
docs/CV_RUNBOOK.md): on-device log-mel frontend + dual-encoder forward
(w2v-bert-2.0 conformer 24×1024 + mpnet 12×768 geometry, fusion heads off) +
global in-batch-negative InfoNCE + backward over the partially unfrozen split
(5+5 top layers) + AdamW update — on 10-second audio clips, bf16, batch 16:
the preset's per-chip batch on the v5e-8 (global batch 128 / 8 chips), and
the measured per-clip optimum of the r3 batch sweep (52.0 clips/s at B=16 vs
46.6 at B=64 under the same step — smaller activations leave HBM room for the
save_hot2 remat policy and less backward replay).

``--config flagship-pairwise`` instead measures the reference-parity best-gap
recipe (fusion + word alignment on, pairwise loss) at the r1/r2 workload shape
(batch 64, save_hot remat — save_hot2 does not fit at B=64) for cross-round
continuity.

``--config retrieval-frozen`` measures the retrieval recipe with the
frozen-bottom speed knob (freeze.train_text_embeddings=false +
train_audio_feature_projection=false, CV_RUNBOOK note): backprop stops at the
lowest unfrozen block and XLA prunes the entire frozen-bottom backward —
measured 2.03× the headline (105.7 clips/s at B=16, ROUND3.md).

``--config retrieval-lengths`` measures the SAME retrieval step on a
realistic Common Voice clip-length mix instead of fixed 10 s clips: clip
lengths are drawn from a documented CV-pt approximation (lognormal, ~4.7 s
mean — CV17-pt is ≈28 h over 21,968 train clips ≈ 4.6 s/clip; the reference's
first logged batch pads to 6.56 s, training.log:34), assigned to the shipped
static buckets exactly as the training pipeline assigns them (pad-to-bucket,
per-bucket drop-remainder batching), and each bucket's compiled step is timed
separately; throughput = total clips in full batches / Σ(batches × step
time). This is the number that predicts real-corpus epoch wall time against
the reference's 5.8 clips/s, padding waste included.

Baseline: the reference trains ≈5.8 clips/s on a 32 GiB V100-class GPU in fp32
(BASELINE.md, correct_encoder run, epoch-1 train-only wall time). That is a
real-corpus (≈4.6 s mean clip) number, so the DEFAULT run measures both the
fixed-10s step and the realistic length mix and reports the length mix as the
headline (the honest comparison), with the fixed-10s figure as
``fixed_10s_value`` for continuity with BENCH_r01–r04. Every length-mix
measurement also writes ``bench_lengths.json`` next to this file.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys
import time

import numpy as np

BASELINE_CLIPS_PER_SEC = 5.8
BATCH = None   # default: 16 (headline) / 64 (flagship-pairwise continuity)
AUDIO_SECONDS = 10
TEXT_LEN = 64
WARMUP_STEPS = 2
MEASURE_STEPS = 12     # scaled up for small batches in main() — ≥192 clips
                       # measured so relay dispatch jitter averages out


def _parse_config(argv):
    """--config {retrieval,flagship-pairwise} and --batch N (probe override;
    the defaults are 16 for the retrieval headline and 64 for the continuity
    workload). Unknown values fail loudly so a typo can't silently benchmark
    the wrong workload."""
    global BATCH
    cfg, args = "retrieval", list(argv)
    while args:
        a = args.pop(0)
        if a == "--config":
            if not args:
                raise SystemExit("--config needs a value")
            cfg = args.pop(0)
        elif a.startswith("--config="):
            cfg = a.split("=", 1)[1]
        elif a == "--batch":
            if not args:
                raise SystemExit("--batch needs a value")
            BATCH = int(args.pop(0))
        elif a.startswith("--batch="):
            BATCH = int(a.split("=", 1)[1])
        else:
            raise SystemExit(f"Unknown argument {a!r}")
    if cfg not in ("retrieval", "retrieval-frozen", "retrieval-lengths",
                   "flagship-pairwise"):
        raise SystemExit(
            f"Unknown bench config {cfg!r} (use retrieval|retrieval-frozen|"
            "retrieval-lengths|flagship-pairwise)")
    if BATCH is None:
        BATCH = 64 if cfg == "flagship-pairwise" else 16
    return cfg


def _sample_cv_lengths(n: int, rng) -> np.ndarray:
    """Clip lengths (samples @16 kHz) from a documented CV-pt approximation.

    Common Voice 17 'pt' is ≈28 h of validated audio over 21,968 train clips
    ≈ 4.6 s/clip (BASELINE.md dataset row); durations are right-skewed with a
    short-utterance mode and a long tail — modelled here as
    lognormal(median 4.2 s, σ_log 0.45) → mean ≈ 4.65 s, p5 ≈ 2.0 s,
    p95 ≈ 8.8 s, clipped to [1, 30] s (the reference truncates audio at 30 s,
    processor.py:94-97). The reference's first logged batch padded to 6.56 s
    (training.log:34, [B, 328, 160] stacked frames), consistent with this mix.
    """
    secs = np.clip(rng.lognormal(np.log(4.2), 0.45, size=n), 1.0, 30.0)
    return (secs * 16000).astype(np.int64)


def _measure_length_mix(jax, cfg, train_step, state, n_chips: int):
    """Time the train step per static bucket on a realistic clip-length mix
    and return (clips/s/chip, bucket-mix description): the length-weighted
    end-to-end throughput (padding waste included) — total clips in full
    batches / Σ_buckets(batches × step time)."""
    import bisect

    rng = np.random.default_rng(7)
    n_clips = 2048
    lens = _sample_cv_lengths(n_clips, rng)
    buckets = sorted(cfg.data.audio_buckets)
    per_bucket = {b: [] for b in buckets}
    for n in lens:
        n = min(int(n), cfg.data.max_audio_samples)
        b = buckets[min(bisect.bisect_left(buckets, n), len(buckets) - 1)]
        per_bucket[b].append(n)

    B = cfg.data.batch_size

    def make_batch(bucket_len, ns):
        wav = np.zeros((B, bucket_len), np.float32)
        for i, m in enumerate(ns):
            wav[i, :m] = rng.normal(scale=0.05, size=m).astype(np.float32)
        return jax.device_put({
            "waveform": wav,
            "num_samples": np.asarray(ns, np.int32),
            "input_ids_pos": rng.integers(
                4, cfg.model.text.vocab_size, size=(B, TEXT_LEN)).astype(np.int32),
            "attention_mask_pos": np.ones((B, TEXT_LEN), np.int32),
            "input_ids_neg": rng.integers(
                4, cfg.model.text.vocab_size, size=(B, TEXT_LEN)).astype(np.int32),
            "attention_mask_neg": np.ones((B, TEXT_LEN), np.int32),
        })

    key = jax.random.PRNGKey(1)
    total_time, total_clips, mix = 0.0, 0, []
    for bucket_len in buckets:
        ns = per_bucket[bucket_len]
        n_batches = len(ns) // B        # per-bucket drop_last, like training
        if n_batches == 0:
            continue
        measure = min(n_batches, max(4, 96 // B))
        batches = [make_batch(bucket_len, ns[i * B:(i + 1) * B])
                   for i in range(min(measure + 1, n_batches))]
        jax.block_until_ready(batches)
        # first call compiles this bucket's program; a second warm step
        # settles the pipeline before timing
        for w in range(min(2, len(batches))):
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, batches[w], sub)
        jax.block_until_ready(metrics["loss"])
        timed = batches[1:] if len(batches) > 1 else batches
        t0 = time.perf_counter()
        for bt in timed:
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, bt, sub)
        jax.block_until_ready(metrics["loss"])
        t_step = (time.perf_counter() - t0) / len(timed)
        total_time += n_batches * t_step
        total_clips += n_batches * B
        mix.append(f"{bucket_len // 16000}s×{n_batches}")

    per_chip = total_clips / total_time / n_chips
    return per_chip, " ".join(mix)


def _write_lengths_artifact(per_chip: float, mix_desc: str, batch: int,
                            n_chips: int) -> None:
    """Record the realistic length-mix throughput as a machine-readable
    artifact next to BENCH (VERDICT r4 weak #5 — the number previously lived
    only in round-notes prose)."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_lengths.json")
    with open(path, "w") as f:
        json.dump({
            "metric": "train_clips_per_sec_per_chip_length_mix",
            "value": round(per_chip, 3),
            "unit": (f"clips/s/chip (CV-pt length-mix approx ~4.7s mean, "
                     f"bucketed pipeline [{mix_desc}], flagship geometry, "
                     f"bf16, 5+5 unfrozen, B={batch}, global InfoNCE "
                     f"retrieval preset)"),
            "vs_baseline": round(per_chip / BASELINE_CLIPS_PER_SEC, 3),
            "n_chips": n_chips,
        }, f, indent=2)
        f.write("\n")


def main():
    global MEASURE_STEPS
    bench_config = _parse_config(sys.argv[1:])
    MEASURE_STEPS = max(MEASURE_STEPS, 192 // BATCH)
    import jax

    from speech_transcript_embeddings_tpu.utils.compilation_cache import enable
    enable()

    from speech_transcript_embeddings_tpu import config as config_lib
    from speech_transcript_embeddings_tpu.models.dual_encoder import (
        DualEncoderModel, template_params,
    )
    from speech_transcript_embeddings_tpu.ops import make_frontend
    from speech_transcript_embeddings_tpu.training import optimizer as opt_lib
    from speech_transcript_embeddings_tpu.training.train_step import (
        create_train_state, make_train_step, resolve_frozen_dtype,
    )

    n_chips = max(len(jax.devices()), 1)
    asamps = AUDIO_SECONDS * 16000

    if bench_config.startswith("retrieval"):
        model_cfg = config_lib.retrieval_model_config()
        loss_cfg = config_lib.LossConfig(kind="global")
    else:
        import dataclasses
        model_cfg = config_lib.flagship_model_config()
        # the exact BENCH_r01/r02 workload: B=64 does not fit save_hot2
        model_cfg = dataclasses.replace(
            model_cfg, audio=dataclasses.replace(model_cfg.audio,
                                                 remat_policy="save_hot"))
        loss_cfg = config_lib.LossConfig(kind="pairwise")
    train_bottom = bench_config != "retrieval-frozen"
    if bench_config == "retrieval-lengths":
        # the shipped MXU-aligned static bucket set (DataConfig defaults) —
        # the length-mix measurement is ABOUT the bucketed pipeline
        data_cfg = config_lib.DataConfig(batch_size=BATCH,
                                         max_text_length=TEXT_LEN)
    else:
        data_cfg = config_lib.DataConfig(batch_size=BATCH,
                                         max_text_length=TEXT_LEN,
                                         audio_buckets=(asamps,),
                                         max_audio_samples=asamps)
    cfg = config_lib.ExperimentConfig(
        model=model_cfg,
        loss=loss_cfg,
        freeze=config_lib.FreezeConfig(mode="partial", text_layers_to_unfreeze=5,
                                       audio_layers_to_unfreeze=5,
                                       train_text_embeddings=train_bottom,
                                       train_audio_feature_projection=train_bottom),
        optimizer=config_lib.OptimizerConfig(learning_rate=5e-5, warmup_steps=100,
                                             mu_dtype="bfloat16"),
        data=data_cfg,
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
    del params
    train_step = make_train_step(cfg, model, frontend, tx)

    if bench_config == "retrieval-lengths":
        per_chip, mix_desc = _measure_length_mix(jax, cfg, train_step, state,
                                                 n_chips)
        _write_lengths_artifact(per_chip, mix_desc, BATCH, n_chips)
        print(json.dumps({
            "metric": "train_clips_per_sec_per_chip",
            "value": round(per_chip, 3),
            "unit": (f"clips/s/chip (CV-pt length-mix approx ~4.7s mean, "
                     f"bucketed pipeline [{mix_desc}], flagship geometry, "
                     f"bf16, 5+5 unfrozen, B={BATCH}, global InfoNCE "
                     f"retrieval preset)"),
            "vs_baseline": round(per_chip / BASELINE_CLIPS_PER_SEC, 3),
        }))
        return 0

    # device-resident batches: the training loop overlaps H2D with compute via
    # async device_put in the prefetch worker (loop.py), so the steady-state
    # step cost is compute-only — measure that, not the transfer. One DISTINCT
    # batch per measured step: repeating one device batch lets a relay-cached
    # execution short-circuit (measured 7000+ "clips/s"), which is not a
    # measurement of anything.
    rng = np.random.default_rng(0)

    def make_batch():
        return jax.device_put({
            "waveform": rng.normal(
                scale=0.05, size=(BATCH, asamps)).astype(np.float32),
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
        state, metrics = train_step(state, batches[i], sub)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batches[WARMUP_STEPS + i], sub)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    clips_per_sec = MEASURE_STEPS * BATCH / dt
    per_chip = clips_per_sec / n_chips

    if bench_config == "retrieval":
        # the default (driver-recorded) run reports the realistic CV-pt
        # length-mix as the HEADLINE — BASELINE.md's 5.8 clips/s is a
        # real-corpus number, so the bucketed length-mix is the honest
        # comparison (VERDICT r4 weak #5); the fixed-10s figure rides along
        # as fixed_10s_value for cross-round continuity with BENCH_r01-r04.
        import dataclasses
        mix_cfg = dataclasses.replace(
            cfg, data=config_lib.DataConfig(batch_size=BATCH,
                                            max_text_length=TEXT_LEN))
        lm_per_chip, mix_desc = _measure_length_mix(jax, mix_cfg, train_step,
                                                    state, n_chips)
        _write_lengths_artifact(lm_per_chip, mix_desc, BATCH, n_chips)
        print(json.dumps({
            "metric": "train_clips_per_sec_per_chip",
            "value": round(lm_per_chip, 3),
            "unit": (f"clips/s/chip (CV-pt length-mix approx ~4.7s mean, "
                     f"bucketed pipeline [{mix_desc}], flagship geometry, "
                     f"bf16, 5+5 unfrozen, B={BATCH}, global InfoNCE "
                     f"retrieval preset; fixed-10s continuity number in "
                     f"fixed_10s_value)"),
            "vs_baseline": round(lm_per_chip / BASELINE_CLIPS_PER_SEC, 3),
            "fixed_10s_value": round(per_chip, 3),
            "fixed_10s_vs_baseline": round(per_chip / BASELINE_CLIPS_PER_SEC,
                                           3),
        }))
        return 0

    print(json.dumps({
        "metric": "train_clips_per_sec_per_chip",
        "value": round(per_chip, 3),
        "unit": (f"clips/s/chip (10s clips, flagship geometry, bf16, 5+5 "
                 f"unfrozen, B={BATCH}, "
                 + {"retrieval-frozen": ("global InfoNCE retrieval preset, "
                                         "frozen bottom I/O"),
                    "flagship-pairwise": "pairwise loss + fusion heads",
                    }[bench_config] + ")"),
        "vs_baseline": round(per_chip / BASELINE_CLIPS_PER_SEC, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
