#!/usr/bin/env python
"""Profile the headline B=16 retrieval train step and attribute non-MXU time
(VERDICT r4 item 7 / r3 stretch).

Captures a ``jax.profiler`` trace of a few warm steps of the EXACT bench.py
headline configuration (flagship geometry, 10 s clips, bf16, 5+5 unfrozen,
global InfoNCE, B=16), then post-processes the xplane protobuf with
``tensorboard_plugin_profile`` into:

  * the op-category time shares on the device (convolution/fusion/copy/
    custom-call/...), and
  * the top self-time ops,

written to ``<out>/profile_attribution.json`` plus the raw tool JSONs, so the
"gap between ~53% HFU and the remat FLOP bound" question gets an evidence-
backed answer (next kernel candidate, or bandwidth-bound → close the thread).

Usage: python scripts/profile_b16.py [--out runs/profile_b16] [--batch 16]
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIO_SECONDS, TEXT_LEN = 10, 64


def build(batch):
    import jax
    from speech_transcript_embeddings_tpu import config as config_lib
    from speech_transcript_embeddings_tpu.models.dual_encoder import (
        DualEncoderModel, template_params,
    )
    from speech_transcript_embeddings_tpu.ops import make_frontend
    from speech_transcript_embeddings_tpu.training import optimizer as opt_lib
    from speech_transcript_embeddings_tpu.training.train_step import (
        create_train_state, make_train_step, resolve_frozen_dtype,
    )

    asamps = AUDIO_SECONDS * 16000
    cfg = config_lib.ExperimentConfig(
        model=config_lib.retrieval_model_config(),
        loss=config_lib.LossConfig(kind="global"),
        freeze=config_lib.FreezeConfig(mode="partial",
                                       text_layers_to_unfreeze=5,
                                       audio_layers_to_unfreeze=5),
        optimizer=config_lib.OptimizerConfig(learning_rate=5e-5,
                                             warmup_steps=100,
                                             mu_dtype="bfloat16"),
        data=config_lib.DataConfig(batch_size=batch, max_text_length=TEXT_LEN,
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

    rng = np.random.default_rng(0)

    def make_batch():
        return jax.device_put({
            "waveform": rng.normal(scale=0.05,
                                   size=(batch, asamps)).astype(np.float32),
            "num_samples": rng.integers(asamps * 3 // 4, asamps,
                                        size=batch).astype(np.int32),
            "input_ids_pos": rng.integers(4, cfg.model.text.vocab_size,
                                          size=(batch, TEXT_LEN)).astype(np.int32),
            "attention_mask_pos": np.ones((batch, TEXT_LEN), np.int32),
            "input_ids_neg": rng.integers(4, cfg.model.text.vocab_size,
                                          size=(batch, TEXT_LEN)).astype(np.int32),
            "attention_mask_neg": np.ones((batch, TEXT_LEN), np.int32),
        })

    return step, state, make_batch


def _categorize(name: str, category: str) -> str:
    """Bucket an XLA op event into a coarse attribution category."""
    if category:
        return category
    n = name.lower()
    for key, cat in (("convolution", "convolution"), ("conv", "convolution"),
                     ("custom-call", "custom-call (pallas)"),
                     ("dot", "matmul"), ("cublas", "matmul"),
                     ("all-reduce", "collective"), ("all-gather", "collective"),
                     ("copy", "copy/transpose"), ("transpose", "copy/transpose"),
                     ("dynamic-update-slice", "dus"), ("slice", "slice"),
                     ("reduce", "reduce"), ("scatter", "scatter"),
                     ("fusion", "fusion"), ("infeed", "infeed"),
                     ("outfeed", "outfeed")):
        if key in n:
            return cat
    return "other"


def parse_xplane(out_dir):
    """xplane.pb → per-category and per-op device-time aggregation.

    Parsed directly from the XSpace protobuf (the installed
    tensorboard_plugin_profile is ABI-mismatched with this TF); device planes
    carry one event per executed XLA op with optional ``hlo_category`` stats.
    """
    paths = sorted(glob.glob(os.path.join(out_dir, "plugins", "profile",
                                          "*", "*.xplane.pb")))
    if not paths:
        raise SystemExit(f"no xplane.pb under {out_dir}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    by_cat, by_op, planes = {}, {}, []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            planes.append(f"{plane.name} ({len(plane.lines)} lines)")
            if "TPU" not in plane.name and "/device" not in plane.name:
                continue
            ev_meta = dict(plane.event_metadata)
            st_meta = {k: v.name for k, v in plane.stat_metadata.items()}
            for line in plane.lines:
                # 'XLA Modules' spans whole programs — skip to avoid double
                # counting; op lines carry the per-op events
                if "module" in line.name.lower():
                    continue
                for ev in line.events:
                    md = ev_meta.get(ev.metadata_id)
                    name = md.name if md else "?"
                    cat = ""
                    for s in ev.stats:
                        if st_meta.get(s.metadata_id) == "hlo_category":
                            cat = s.str_value
                    cat = _categorize(name, cat)
                    by_cat[cat] = by_cat.get(cat, 0) + ev.duration_ps
                    by_op[name] = by_op.get(name, 0) + ev.duration_ps
    total = sum(by_cat.values()) or 1
    cats = [{"category": c, "time_pct": round(100.0 * t / total, 2),
             "time_us": round(t / 1e6, 1)}
            for c, t in sorted(by_cat.items(), key=lambda kv: -kv[1])]
    ops = [{"op": o[:120], "time_pct": round(100.0 * t / total, 2),
            "time_us": round(t / 1e6, 1)}
           for o, t in sorted(by_op.items(), key=lambda kv: -kv[1])[:20]]
    return paths, {"planes": planes, "total_device_time_us": round(total / 1e6, 1),
                   "by_category": cats, "top_ops": ops}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/profile_b16")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from speech_transcript_embeddings_tpu.utils.compilation_cache import enable
    enable()
    import jax

    step, state, make_batch = build(args.batch)
    key = jax.random.PRNGKey(0)
    batches = [make_batch() for _ in range(args.steps + 2)]
    jax.block_until_ready(batches)
    for i in range(2):                                  # compile + settle
        key, sub = jax.random.split(key)
        state, metrics = step(state, batches[i], sub)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    jax.profiler.start_trace(args.out)
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batches[2 + i], sub)
    jax.block_until_ready(metrics["loss"])
    jax.profiler.stop_trace()
    dt = (time.perf_counter() - t0) / args.steps
    print(f"traced {args.steps} steps, {dt * 1e3:.1f} ms/step "
          f"({args.batch / dt:.1f} clips/s)")

    paths, agg = parse_xplane(args.out)
    summary = {
        "batch": args.batch,
        "ms_per_step": round(dt * 1e3, 2),
        "clips_per_sec": round(args.batch / dt, 2),
        "xplane": paths,
        **agg,
    }
    with open(os.path.join(args.out, "profile_attribution.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({"planes": agg["planes"],
                      "by_category": agg["by_category"][:10]}, indent=2))
    print(f"written: {args.out}/profile_attribution.json")


if __name__ == "__main__":
    main()
