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


_SHAPE_RE = None


def _has_weight_operand(text: str) -> bool:
    """True when the op text references a weight-like tensor (last two dims
    both >=768 — FFN/projection/QKV weights incl. scanned ``[19,4096,1024]``
    stacks), excluding the embedding tables. XLA fuses each GEMM with its
    elementwise/LN epilogue into one kOutput fusion, so these fusions are the
    MXU work even though 'dot' never appears in the event name."""
    global _SHAPE_RE
    if _SHAPE_RE is None:
        import re
        _SHAPE_RE = re.compile(r"\[(?:\d+,)*(\d+),(\d+)\]")
    for m in _SHAPE_RE.finditer(text):
        a, b = int(m.group(1)), int(m.group(2))
        if a >= 768 and b >= 768 and a != 250002 and b != 250002:
            return True
    return False


def _family(n: str) -> str:
    """Bucket an XLA op into a coarse hardware-unit attribution family."""
    head = n.split("=")[0]
    if "attention" in n:
        return "flash-attention kernel (MXU+VPU)"
    if "convolution" in head or "convolution" in n.split("fusion(")[0]:
        return "conv fusion (MXU)"
    if "250002" in n or "50265" in n:
        return "embedding table (HBM gather/scatter)"
    if _has_weight_operand(n):
        return "GEMM-bearing fusion (MXU + fused epilogue)"
    if n.startswith("%copy") or "transpose" in head:
        return "copy/transpose (HBM)"
    if n.startswith(("%slice", "%dynamic-slice")):
        return "slice (HBM)"
    if "reduce" in head:
        return "reduce (VPU)"
    if n.startswith(("%fusion", "%input_fusion", "%loop_")):
        return "elementwise/other fusion (VPU/HBM)"
    if n.startswith("%while"):
        return "while self"
    return "misc"


def parse_xplane(out_dir, steps=6):
    """xplane.pb → serialized per-op SELF-time attribution.

    Parsed directly from the XSpace protobuf (the installed
    tensorboard_plugin_profile is ABI-mismatched with this TF). Methodology
    (the first version of this parser summed every line of the device plane,
    which double-counts: 'XLA Ops' events nest — a while-loop event spans its
    body's events — and 'Async XLA Ops' are DMA transfers that OVERLAP
    compute on separate engines; summing both inflated copy/slice to ~64%):

      * only the 'XLA Ops' line is counted, with nested-event self-time
        (a parent's time minus its children's), so the families sum to the
        true serialized device time;
      * async DMA busy time is reported separately as overlapped traffic;
      * fusions are attributed by what they contain (weight-operand GEMM
        detection), not by their HLO opcode — on TPU every matmul arrives
        fused with its epilogue.
    """
    paths = sorted(glob.glob(os.path.join(out_dir, "plugins", "profile",
                                          "*", "*.xplane.pb")))
    if not paths:
        raise SystemExit(f"no xplane.pb under {out_dir}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    planes, self_time, async_ps, span_ps = [], {}, 0, 0
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            planes.append(f"{plane.name} ({len(plane.lines)} lines)")
            if "TPU" not in plane.name:
                continue
            ev_meta = dict(plane.event_metadata)
            for line in plane.lines:
                evs = sorted(
                    (ev.offset_ps, ev.duration_ps,
                     ev_meta[ev.metadata_id].name
                     if ev.metadata_id in ev_meta else "?")
                    for ev in line.events)
                if line.name == "Async XLA Ops":
                    async_ps += sum(d for _, d, _ in evs)
                if line.name != "XLA Ops":
                    continue
                if evs:
                    span_ps = max(span_ps,
                                  evs[-1][0] + evs[-1][1] - evs[0][0])
                stack = []
                for off, dur, name in evs:
                    while stack and off >= stack[-1][0] + stack[-1][1]:
                        stack.pop()
                    if stack:   # child: subtract from enclosing event
                        pk = stack[-1][2]
                        self_time[pk] = self_time.get(pk, 0) - dur
                    self_time[name] = self_time.get(name, 0) + dur
                    stack.append((off, dur, name))
    by_fam = {}
    for name, t in self_time.items():
        if t > 0:
            f = _family(name)
            by_fam[f] = by_fam.get(f, 0) + t
    total = sum(by_fam.values()) or 1
    fams = [{"family": c, "time_pct": round(100.0 * t / total, 2),
             "ms_per_step": round(t / steps / 1e9, 2)}
            for c, t in sorted(by_fam.items(), key=lambda kv: -kv[1])]
    ops = [{"op": o[:160], "time_pct": round(100.0 * t / total, 2),
            "ms_per_step": round(t / steps / 1e9, 2)}
           for o, t in sorted(self_time.items(), key=lambda kv: -kv[1])[:20]]
    return paths, {
        "planes": planes,
        "device_ms_per_step": round(total / steps / 1e9, 2),
        "device_busy_fraction_of_span": round(total / max(span_ps, 1), 3),
        "async_dma_ms_per_step_overlapped": round(async_ps / steps / 1e9, 2),
        "by_family": fams, "top_ops": ops}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/profile_b16")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--parse-only", action="store_true",
                    help="re-run the attribution on an existing xplane.pb "
                         "without touching the chip (wall-clock ms/step is "
                         "then taken from the device trace, not re-measured)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.parse_only:
        paths, agg = parse_xplane(args.out, steps=args.steps)
        summary = {"batch": args.batch,
                   "ms_per_step": agg["device_ms_per_step"],
                   "clips_per_sec": round(
                       args.batch / (agg["device_ms_per_step"] / 1e3), 2),
                   "xplane": paths, **agg}
        with open(os.path.join(args.out, "profile_attribution.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print(json.dumps({"device_ms_per_step": agg["device_ms_per_step"],
                          "by_family": agg["by_family"]}, indent=2))
        print(f"written: {args.out}/profile_attribution.json")
        return

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

    paths, agg = parse_xplane(args.out, steps=args.steps)
    summary = {
        "batch": args.batch,
        # NOTE: wall ms/step while TRACING is inflated by host-side profiler
        # overhead through the relay (measured 138 s/step vs a 300 ms/step
        # device burst); device_ms_per_step is the meaningful number
        "traced_wall_ms_per_step": round(dt * 1e3, 2),
        "clips_per_sec_device": round(
            args.batch / (agg["device_ms_per_step"] / 1e3), 2),
        "xplane": paths,
        **agg,
    }
    with open(os.path.join(args.out, "profile_attribution.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({"device_ms_per_step": agg["device_ms_per_step"],
                      "by_family": agg["by_family"]}, indent=2))
    print(f"written: {args.out}/profile_attribution.json")


if __name__ == "__main__":
    main()
