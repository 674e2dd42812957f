"""Pretrained-encoder conversion CLI.

Converts the HF torch checkpoints the reference consumes via
``AutoModel.from_pretrained`` (model.py:150-152) into a params-only orbax
checkpoint for this framework: both encoders' weights are mapped onto the native
Flax modules (models/convert.py) and the heads are freshly initialised. Training
then starts from it with ``train.init_checkpoint=<dir>``.

    python -m speech_transcript_embeddings_tpu.convert_checkpoint \
        --text-model sentence-transformers/paraphrase-multilingual-mpnet-base-v2 \
        --audio-model facebook/w2v-bert-2.0 \
        --projection-dim 768 --output ./converted/mpnet_w2vbert
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import numpy as np


def build_converted_params(text_hf, audio_hf, heads_cfg=None, seed: int = 0,
                           dtype: str = "bfloat16", remat: bool = True):
    """(torch text model, torch audio model) → (ExperimentConfig, params pytree).

    ``text_hf`` / ``audio_hf`` are instantiated HF torch models (any size — tests
    use tiny random ones). Heads are initialised from ``seed``.
    """
    from speech_transcript_embeddings_tpu import config as config_lib
    from speech_transcript_embeddings_tpu.models import convert
    from speech_transcript_embeddings_tpu.models.dual_encoder import (
        DualEncoderModel, init_params,
    )

    text_cfg = convert.text_config_from_hf(text_hf.config)
    audio_cfg = convert.audio_config_from_hf(audio_hf.config)
    heads_cfg = heads_cfg or config_lib.HeadsConfig()
    frontend_cfg = config_lib.FrontendConfig()
    if frontend_cfg.num_mel_bins * frontend_cfg.stride != audio_cfg.feature_dim:
        frontend_cfg = dataclasses.replace(
            frontend_cfg,
            num_mel_bins=audio_cfg.feature_dim // frontend_cfg.stride)
    model_cfg = config_lib.ModelConfig(
        text=text_cfg, audio=audio_cfg, heads=heads_cfg,
        frontend=frontend_cfg, dtype=dtype, remat=remat)
    cfg = config_lib.ExperimentConfig(model=model_cfg)

    model = DualEncoderModel(model_cfg)
    params = init_params(model, jax.random.PRNGKey(seed))
    params = jax.tree.map(np.asarray, params)   # host-side, mutable

    def np_sd(m):
        return {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}

    params["text_encoder"] = convert.convert_text_encoder(np_sd(text_hf), text_cfg)
    # merge: keep init values for params the HF checkpoint lacks (e.g.
    # masked_spec_embed when the source was exported without spec augment)
    params["audio_encoder"] = {**params["audio_encoder"],
                               **convert.convert_audio_encoder(np_sd(audio_hf),
                                                               audio_cfg)}
    return cfg, params


def main(argv=None):
    from speech_transcript_embeddings_tpu.utils.env import load_dotenv
    load_dotenv()   # HF_TOKEN convenience (the hub models are gated/private)
    p = argparse.ArgumentParser(description="Convert HF encoders to a params checkpoint")
    p.add_argument("--text-model",
                   default="sentence-transformers/paraphrase-multilingual-mpnet-base-v2")
    p.add_argument("--audio-model", default="facebook/w2v-bert-2.0")
    p.add_argument("--projection-dim", type=int, default=768)
    p.add_argument("--no-word-alignment", action="store_true")
    p.add_argument("--no-cross-modal", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--from-torch", metavar="CKPT_PT",
                   help="ingest a trained reference torch checkpoint "
                        "(best_model_gap.pt etc.) instead of HF encoders; "
                        "config is reconstructed from its metadata/keys")
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    from speech_transcript_embeddings_tpu import config as config_lib
    from speech_transcript_embeddings_tpu.training import checkpoints as ckpt_lib

    if args.from_torch:
        from speech_transcript_embeddings_tpu.models import ingest_torch
        print(f"Ingesting reference checkpoint {args.from_torch} ...")
        cfg, params = ingest_torch.load_reference_checkpoint(args.from_torch)
        ckpt_lib.save_params_checkpoint(
            args.output, params, cfg, info={"source": args.from_torch,
                                            "kind_detail": "reference_torch"})
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        print(f"Saved {n:,}-param checkpoint to {args.output}")
        return

    from transformers import AutoModel

    print(f"Loading {args.text_model} ...")
    text_hf = AutoModel.from_pretrained(args.text_model)
    print(f"Loading {args.audio_model} ...")
    audio_hf = AutoModel.from_pretrained(args.audio_model)

    heads = config_lib.HeadsConfig(
        projection_dim=args.projection_dim,
        use_cross_modal=not args.no_cross_modal,
        use_word_alignment=not args.no_word_alignment)
    cfg, params = build_converted_params(text_hf, audio_hf, heads, args.seed)
    ckpt_lib.save_params_checkpoint(
        args.output, params, cfg,
        info={"text_model": args.text_model, "audio_model": args.audio_model})
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"Saved {n:,}-param checkpoint to {args.output}")


if __name__ == "__main__":
    main()
