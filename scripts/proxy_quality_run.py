#!/usr/bin/env python
"""Mid-size quality-parity proxy run (VERDICT r1 next-step #6).

Common Voice is unreachable from this environment (zero egress), so this is
the strongest local substitute for a quality-parity check: a multi-epoch run
at a mid-size geometry (6+6 layers, hidden 256/512) on the real chip with the
flagship recipe's loss (pairwise + word alignment + corrupt penalty),
optimizer structure (AdamW, encoder LR /50, warmup→linear decay, grad
accumulation to effective batch 160, clip 1.0), freeze shape (partial, top
layers + embeddings trainable) and artifact schema. Encoders are random-init
(no pretrained weights without egress), so the base LR is raised from the
reference's fine-tuning 5e-5 — that value only makes sense on pretrained
encoders; everything else follows the flagship settings.

Reports the per-epoch gap trajectory plus test gap and Recall@K, in the shape
of BASELINE.md's table, for ROUND2.md.

A second variant (``--loss global --no-cross-modal --samples 8192 --acc 1``)
trains with the TPU-native global in-batch-negative InfoNCE (the BASELINE.json
north-star objective) in the retrieval-meaningful configuration: the pairwise
recipe only teaches clean-vs-corrupt separation, and with cross-modal fusion
on, training optimizes *pair-fused* embeddings while Recall@K ranks the
*independent* projection embeddings (fusion mixes the two modalities per
pair, so fused embeddings cannot rank candidates) — measured on-chip, both
leave retrieval at chance. With fusion off the global loss directly optimizes
instance-level matching of the very embeddings retrieval ranks (the standard
dual-encoder setup), so Recall@K / MRR should be read from this variant.

``--preset-retrieval`` builds the config through ``train.build_config`` with
``preset=retrieval`` plus midsize-geometry dotted overrides, so the run
exercises the exact CLI path docs/CV_RUNBOOK.md ships as *the* Recall@1
recipe (fusion off + global loss come from the preset, not hand-assembled
flags). The flagship-only kernels (flash attention, Pallas frontend) are
overridden off to keep the geometry identical to the round-2 proxy
(runs/proxy_midsize_retrieval_r2b) for comparability.
"""

import argparse
import faulthandler
import json
import os
import signal
import sys

# debugging hook for relay-client stalls: `kill -USR1 <pid>` dumps every
# thread's Python stack to stderr without disturbing the process
if hasattr(signal, "SIGUSR1"):
    faulthandler.register(signal.SIGUSR1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speech_transcript_embeddings_tpu import config as config_lib
from speech_transcript_embeddings_tpu.training.loop import run_experiment
from speech_transcript_embeddings_tpu.utils.compilation_cache import enable


def build_config_via_preset(out_dir: str, args) -> config_lib.ExperimentConfig:
    """Midsize retrieval config through train.build_config's preset=retrieval
    (the shipped CLI path), downsized via the same dotted overrides a user
    would pass."""
    from speech_transcript_embeddings_tpu.train import build_config as cli_build
    return cli_build([
        "preset=retrieval",
        # midsize geometry (identical to the round-2 proxy)
        "model.text.vocab_size=512", "model.text.hidden_size=256",
        "model.text.num_layers=6", "model.text.num_heads=4",
        "model.text.intermediate_size=1024",
        "model.text.max_position_embeddings=64", "model.text.scan_bottom=1",
        "model.audio.hidden_size=512", "model.audio.num_layers=6",
        "model.audio.num_heads=8", "model.audio.intermediate_size=2048",
        "model.audio.scan_bottom=1",
        # flagship-only kernels off at this geometry (r2-proxy comparability)
        "model.audio.use_flash_attention=false",
        "model.audio.remat_policy=full",
        "model.frontend.use_pallas=false",
        "model.heads.projection_dim=256",
        # random-init encoders need a real LR, not the fine-tuning 5e-5
        "optimizer.learning_rate=3e-4", "optimizer.warmup_steps=20",
        f"data.num_synthetic_samples={args.samples}",
        "data.batch_size=32", "data.max_text_length=24",
        "data.audio_buckets=[48000]", "data.max_audio_samples=48000",
        f"train.num_epochs={args.epochs}",
        f"train.schedule_epochs={args.schedule_epochs or args.epochs}",
        f"train.accumulation_steps={args.acc}",
        f"train.output_dir={out_dir}",
        "train.plot_every=4", "train.log_every_batches=32",
    ])


def build_config_flagship(out_dir: str, args) -> config_lib.ExperimentConfig:
    """FULL flagship geometry (877M params: mpnet 12x768 + w2v-bert 24x1024,
    proj 768) through the shipped preset=retrieval CLI path — the sustained
    full-size training exercise VERDICT r3 item 2 asks for (the reference's
    committed artifacts are 30-epoch full-size runs; this is the strongest
    offline stand-in: real chip, real geometry, synthetic corpus). Synthetic
    clips are 0.7-2.8 s, so one MXU-aligned 41200-sample bucket (T=128)
    carries every clip; per-chip batch 16 = the v5e-8 preset batch. LR 1e-4:
    random-init encoders need a real LR, scaled down from the midsize 3e-4
    for the 12x wider model."""
    from speech_transcript_embeddings_tpu.train import build_config as cli_build
    return cli_build([
        "preset=retrieval",
        f"data.num_synthetic_samples={args.samples}",
        "data.batch_size=16", "data.max_text_length=24",
        "data.audio_buckets=[41200]", "data.max_audio_samples=41200",
        "optimizer.learning_rate=1e-4", "optimizer.warmup_steps=100",
        f"train.num_epochs={args.epochs}",
        f"train.schedule_epochs={args.schedule_epochs or args.epochs}",
        f"train.accumulation_steps={args.acc}",
        f"train.output_dir={out_dir}",
        "train.plot_every=4", "train.log_every_batches=64",
    ])


def build_config_flagship_lengths(out_dir: str, args) -> config_lib.ExperimentConfig:
    """FULL 877M geometry on the realistic CV-pt clip-length mix (VERDICT r4
    item 2): synthetic_length_profile='cv' draws lognormal ~4.7 s-mean clip
    durations (the bench.py::_sample_cv_lengths model), which land across the
    shipped MXU-aligned buckets (2.6/5.1/10.3/15.4 s) exactly as real Common
    Voice would — multi-bucket compiled programs, realistic padding waste,
    max_text_length 48. The strongest offline stand-in for the reference's
    committed 30-epoch full-size runs
    (audio_text_model_optimized_unfreeze_3_layers_wt_alignment_correct_encoder/
    training.log)."""
    from speech_transcript_embeddings_tpu.train import build_config as cli_build
    return cli_build([
        "preset=retrieval",
        f"data.num_synthetic_samples={args.samples}",
        "data.batch_size=16", "data.max_text_length=48",
        "data.synthetic_length_profile=cv",
        # random-init encoders need a real LR (see build_config_flagship)
        "optimizer.learning_rate=1e-4", "optimizer.warmup_steps=100",
        f"train.num_epochs={args.epochs}",
        f"train.schedule_epochs={args.schedule_epochs or args.epochs}",
        f"train.accumulation_steps={args.acc}",
        f"train.output_dir={out_dir}",
        "train.plot_every=4", "train.log_every_batches=64",
        "train.save_every=4",
    ])


def build_config(out_dir: str, args) -> config_lib.ExperimentConfig:
    if getattr(args, "geometry", "midsize") == "flagship":
        return build_config_flagship(out_dir, args)
    if getattr(args, "geometry", "midsize") == "flagship-lengths":
        return build_config_flagship_lengths(out_dir, args)
    if getattr(args, "preset_retrieval", False):
        return build_config_via_preset(out_dir, args)
    model = config_lib.ModelConfig(
        text=config_lib.TextEncoderConfig(
            vocab_size=512, hidden_size=256, num_layers=6, num_heads=4,
            intermediate_size=1024, max_position_embeddings=64,
            scan_bottom=1),
        audio=config_lib.AudioEncoderConfig(
            hidden_size=512, num_layers=6, num_heads=8,
            intermediate_size=2048, conv_kernel_size=31,
            left_max_rel_pos=64, right_max_rel_pos=8, scan_bottom=1),
        heads=config_lib.HeadsConfig(projection_dim=256,
                                     use_cross_modal=not args.no_cross_modal,
                                     use_word_alignment=not args.no_cross_modal),
        dtype="bfloat16", remat=True,
    )
    return config_lib.ExperimentConfig(
        model=model,
        freeze=config_lib.FreezeConfig(
            mode="partial", text_layers_to_unfreeze=5,
            audio_layers_to_unfreeze=5),
        loss=config_lib.LossConfig(kind=args.loss),
        optimizer=config_lib.OptimizerConfig(
            learning_rate=3e-4, warmup_steps=20,
            mu_dtype="bfloat16"),  # shipped preset numerics (r3)
        data=config_lib.DataConfig(
            dataset="synthetic", num_synthetic_samples=args.samples,
            batch_size=32,
            max_text_length=24, audio_buckets=(48000,),
            max_audio_samples=48000),
        train=config_lib.TrainConfig(
            num_epochs=args.epochs, accumulation_steps=args.acc,
            schedule_epochs=args.schedule_epochs or args.epochs,
            output_dir=out_dir, plot_every=4, log_every_batches=32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="runs/proxy_midsize")
    ap.add_argument("--loss", choices=("pairwise", "global"), default="pairwise")
    ap.add_argument("--no-cross-modal", action="store_true",
                    help="plain dual-encoder (retrieval-meaningful variant)")
    ap.add_argument("--preset-retrieval", action="store_true",
                    help="build the config through train.py's preset=retrieval"
                         " (the shipped Recall@1 recipe path)")
    ap.add_argument("--geometry",
                    choices=("midsize", "flagship", "flagship-lengths"),
                    default="midsize",
                    help="flagship = the FULL 877M geometry through "
                         "preset=retrieval (sustained full-size run; real "
                         "chip, one 41200-sample bucket for the synthetic "
                         "clip lengths); flagship-lengths = same geometry on "
                         "the realistic CV-pt lognormal clip-length mix "
                         "(multi-bucket, max_text_length 48)")
    ap.add_argument("--segment-epochs", type=int, default=0,
                    help="run the experiment as a chain of resumed child "
                         "processes of at most N epochs each. The axon relay "
                         "client retains ~the full payload of every "
                         "jax.device_put on the host (~6 MB/step at this "
                         "geometry — measured: 400 puts of a 6.1 MB batch "
                         "grow RSS by 2.3 GB, execution itself retains "
                         "nothing), so a long single-process run is "
                         "eventually OOM-killed; the checkpoint/resume "
                         "machinery makes segmenting free")
    ap.add_argument("--samples", type=int, default=2048)
    ap.add_argument("--acc", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--schedule-epochs", type=int, default=0,
                    help="span the LR decay over this many epochs (0 = "
                         "--epochs); segment children get it automatically "
                         "so the chain follows ONE linear decay instead of "
                         "per-segment sawtooths")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="additional dotted key=value config overrides applied "
                         "on top of the proxy recipe (e.g. "
                         "freeze.train_text_embeddings=false) — for A/B runs "
                         "of single levers against a recorded proxy baseline")
    args = ap.parse_args()
    out_dir = args.out_dir
    if args.segment_epochs and args.epochs > args.segment_epochs:
        import subprocess
        cmd = [sys.executable, os.path.abspath(__file__), out_dir,
               "--samples", str(args.samples), "--acc", str(args.acc),
               "--loss", args.loss,
               "--schedule-epochs",
               str(args.schedule_epochs or args.epochs)]
        if args.no_cross_modal:
            cmd.append("--no-cross-modal")
        if args.preset_retrieval:
            cmd.append("--preset-retrieval")
        if args.geometry != "midsize":
            cmd.extend(["--geometry", args.geometry])
        if args.extra:
            cmd.extend(["--extra", *args.extra])
        ends = list(range(args.segment_epochs, args.epochs,
                          args.segment_epochs)) + [args.epochs]
        for end in ends:
            print(f"--- segment to epoch {end} (fresh process, resumes from "
                  f"latest) ---", flush=True)
            rc = subprocess.run(cmd + ["--epochs", str(end)]).returncode
            if rc:
                raise SystemExit(rc)
        return
    enable()
    cfg = build_config(out_dir, args)
    if args.extra:
        cfg = cfg.with_overrides(config_lib.parse_overrides(args.extra))
    results = run_experiment(cfg)
    if "preempted" in results:
        # clean SIGTERM exit: mid-epoch checkpoint written; relaunching the
        # same command resumes from it
        print(f"preempted at {results['preempted']} — latest checkpoint "
              f"saved, rerun to resume", flush=True)
        return

    summary = {
        "val_gap_trajectory": [
            round(c - k, 4) for c, k in zip(results["val_history"]["clean"],
                                            results["val_history"]["corrupt"])],
        "test_metrics": results["test_metrics"],
        "retrieval": results.get("retrieval", {}),
    }
    with open(os.path.join(out_dir, "proxy_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
