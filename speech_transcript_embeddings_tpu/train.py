"""Training CLI: ``python -m speech_transcript_embeddings_tpu.train [k=v ...]``.

One typed config with dotted overrides replaces the reference's argparse + 385-line
bash wrapper (training/run_embedding_trainer_unfreeze.sh). Examples:

    # tiny synthetic smoke run on CPU/one chip
    python -m speech_transcript_embeddings_tpu.train preset=tiny \
        train.num_epochs=2 train.output_dir=./runs/smoke

    # flagship geometry (w2v-bert-2.0 + mpnet) on Common Voice
    python -m speech_transcript_embeddings_tpu.train \
        data.dataset=common_voice freeze.text_layers_to_unfreeze=5 \
        freeze.audio_layers_to_unfreeze=5 loss.kind=global
"""

from __future__ import annotations

import sys

from speech_transcript_embeddings_tpu import config as config_lib
from speech_transcript_embeddings_tpu.training.loop import run_experiment


_HELP = """\
usage: python -m speech_transcript_embeddings_tpu.train [preset=NAME] [k=v ...]

Presets (see docs/CV_RUNBOOK.md for full recipes):
  tiny              small synthetic smoke run (CPU or one chip)
  flagship          reference-parity best-gap recipe (pairwise loss, fusion +
                    word-alignment heads, mpnet + w2v-bert-2.0 geometry)
  flagship-roberta  the reference's all-roberta-large-v1 text encoder variant
  retrieval         the north-star Recall@1 recipe (global InfoNCE, fusion
                    off) — the shipped v5e-8 configuration

Overrides are dotted key=value pairs into the typed config (config.py), with
values parsed as JSON when possible:
  data.dataset=common_voice data.batch_size=128 train.num_epochs=30
  loss.kind=global model.audio.remat_policy=save_hot
  freeze.train_text_embeddings=false   # 2x frozen-bottom speed knob
  train.init_checkpoint=converted/mpnet_w2vbert train.output_dir=runs/cv
  train.init_checkpoint=runs/cv/best_model_gap  # warm-start from ANY prior
                                                # training checkpoint
"""


# each preset's data.tokenizer is its TEXT ENCODER's own tokenizer — the
# reference's invariant (trainer_unfreeze.py:1387 tokenizes with
# AutoTokenizer.from_pretrained(text_model_name)); it travels with every
# checkpoint via metadata.json (see DataConfig.tokenizer)
_MPNET_TOKENIZER = "sentence-transformers/paraphrase-multilingual-mpnet-base-v2"


def build_config(argv) -> config_lib.ExperimentConfig:
    argv = list(argv)
    if any(a in ("--help", "-h", "help") for a in argv):
        raise SystemExit(_HELP)
    preset = None
    for item in list(argv):
        if item.startswith("preset="):
            preset = item.split("=", 1)[1]
            argv.remove(item)
    cfg = config_lib.ExperimentConfig()
    if preset == "tiny":
        cfg = config_lib.ExperimentConfig(
            model=config_lib.tiny_model_config(),
            data=config_lib.DataConfig(
                dataset="synthetic", batch_size=8, max_text_length=16,
                audio_buckets=(16000, 48000), max_audio_samples=48000,
                num_synthetic_samples=64),
            optimizer=config_lib.OptimizerConfig(
                learning_rate=1e-3, warmup_steps=5),
            train=config_lib.TrainConfig(num_epochs=2, accumulation_steps=1,
                                         plot_every=1),
        )
    elif preset == "flagship":
        # the reference's best-gap recipe (5+5 unfrozen, mpnet + w2v-bert-2.0
        # geometry) with the frozen bottoms scanned for fast compilation, the
        # fused Pallas log-mel frontend, and Pallas flash attention (both
        # measured wins on v5e — ROUND2.md; both fall back to the XLA paths
        # off-TPU automatically)
        cfg = config_lib.ExperimentConfig(
            model=config_lib.flagship_model_config(),
            freeze=config_lib.FreezeConfig(
                mode="partial", text_layers_to_unfreeze=5,
                audio_layers_to_unfreeze=5),
            optimizer=config_lib.OptimizerConfig(mu_dtype="bfloat16"),
            data=config_lib.DataConfig(tokenizer=_MPNET_TOKENIZER),
        )
    elif preset == "retrieval":
        # the north-star Recall@1 recipe (BASELINE.json): flagship geometry
        # and kernels, fusion heads off (plain dual-encoder — fused embeddings
        # are pair-dependent and rank at chance), global in-batch-negative
        # InfoNCE with negatives all-gathered over the data mesh axis. This is
        # the configuration the framework ships for the v5e-8; see
        # docs/CV_RUNBOOK.md and config.retrieval_model_config's rationale.
        cfg = config_lib.ExperimentConfig(
            model=config_lib.retrieval_model_config(),
            freeze=config_lib.FreezeConfig(
                mode="partial", text_layers_to_unfreeze=5,
                audio_layers_to_unfreeze=5),
            loss=config_lib.LossConfig(kind="global"),
            optimizer=config_lib.OptimizerConfig(mu_dtype="bfloat16"),
            data=config_lib.DataConfig(tokenizer=_MPNET_TOKENIZER),
        )
    elif preset == "flagship-roberta":
        # the reference's all-roberta-large-v1 configuration (BASELINE.md's
        # 5_layers_wo_alignment run: text 24×1024, proj 1024, 5+5 unfrozen,
        # lr 3e-5, word alignment off) — see config.roberta_model_config
        cfg = config_lib.ExperimentConfig(
            model=config_lib.roberta_model_config(),
            freeze=config_lib.FreezeConfig(
                mode="partial", text_layers_to_unfreeze=5,
                audio_layers_to_unfreeze=5),
            optimizer=config_lib.OptimizerConfig(learning_rate=3e-5,
                                                 mu_dtype="bfloat16"),
            data=config_lib.DataConfig(
                tokenizer="sentence-transformers/all-roberta-large-v1"),
        )
    elif preset is not None:
        raise SystemExit(
            f"Unknown preset {preset!r} "
            "(use tiny|flagship|flagship-roberta|retrieval)")
    overrides = config_lib.parse_overrides(argv)
    return cfg.with_overrides(overrides)


def main(argv=None):
    from speech_transcript_embeddings_tpu.utils.compilation_cache import enable
    from speech_transcript_embeddings_tpu.utils.env import load_dotenv
    load_dotenv()   # HF_TOKEN convenience, reference trainer_unfreeze.py:31-32
    enable()
    cfg = build_config(sys.argv[1:] if argv is None else argv)
    if cfg.mesh.multihost:
        # must run before the first backend touch so jax.devices() is global
        from speech_transcript_embeddings_tpu.parallel import mesh as mesh_lib
        mesh_lib.maybe_initialize_distributed(True)
    run_experiment(cfg)


if __name__ == "__main__":
    main()
