#!/usr/bin/env python
"""Inference (embedding) throughput at flagship geometry on the real chip —
the counterpart of the reference's eval throughput (~12.5 clips/s on V100,
BASELINE.md). Measures the jitted embed step: on-device log-mel frontend +
conformer + attentive pooling + projection, audio side, B=64, 10 s clips,
plus the text side at T=64. Distinct device-resident batches per step.

``--int8`` quantizes every Dense kernel to int8 (dynamic W8A8,
``ops/quant.py``) before the measurement — the serving configuration of
``serve.py --int8`` (the v5e MXU runs int8 at 2x the bf16 rate and int8
weights halve the HBM weight traffic)."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, AUDIO_SECONDS, TLEN = 64, 10, 64


def main():
    import dataclasses

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--int8", action="store_true",
                    help="quantize Dense kernels to int8 (W8A8) before timing")
    args = ap.parse_args()
    mode = "int8" if args.int8 else "fp"

    import jax

    from speech_transcript_embeddings_tpu.utils.compilation_cache import enable
    enable()
    from speech_transcript_embeddings_tpu import config as config_lib
    from speech_transcript_embeddings_tpu.models.dual_encoder import (
        DualEncoderModel, template_params,
    )
    from speech_transcript_embeddings_tpu.ops import make_frontend
    from speech_transcript_embeddings_tpu.training.train_step import (
        make_embed_step,
    )
    from speech_transcript_embeddings_tpu.training import optimizer as opt_lib

    asamps = AUDIO_SECONDS * 16000
    # flagship kernels; no remat for inference (no backward to save for)
    m = dataclasses.replace(config_lib.flagship_model_config(), remat=False)
    model = DualEncoderModel(m)
    frontend = make_frontend(m.frontend)
    params = template_params(model)
    freeze = config_lib.FreezeConfig()
    labels = opt_lib.param_labels(params, freeze, m)
    trainable, frozen = opt_lib.split_params(params, labels)
    if args.int8:
        # timing is data-independent; zero template params quantize fine
        from flax import traverse_util
        from speech_transcript_embeddings_tpu.ops import quant
        merged = opt_lib.merge_params(trainable, frozen)

        def fwd(p, ids, mask, feats, amask):
            return model.apply({"params": p}, {
                "input_ids": ids, "attention_mask": mask,
                "input_features": feats, "attention_mask_audio": amask})

        import jax.numpy as jnp
        feats_s, amask_s = jax.eval_shape(
            frontend, jax.ShapeDtypeStruct((1, asamps), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32))
        paths = quant.dense_param_paths(
            fwd, merged, jax.ShapeDtypeStruct((1, TLEN), jnp.int32),
            jax.ShapeDtypeStruct((1, TLEN), jnp.int32), feats_s, amask_s)
        merged = jax.jit(quant.quantize_dense_params,
                         static_argnums=(1,))(merged, paths)
        trainable = traverse_util.flatten_dict(merged, sep="/")
        frozen = {}
        print(f"int8: quantized {len(paths)} Dense kernels", flush=True)
    embed = make_embed_step(model, frontend)

    rng = np.random.default_rng(0)

    def make_batch():
        return jax.device_put({
            "waveform": rng.normal(scale=0.05,
                                   size=(B, asamps)).astype(np.float32),
            "num_samples": rng.integers(asamps // 2, asamps,
                                        size=B).astype(np.int32),
            "input_ids": rng.integers(4, m.text.vocab_size,
                                      size=(B, TLEN)).astype(np.int32),
            "attention_mask": np.ones((B, TLEN), np.int32),
        })

    n = 12
    batches = [make_batch() for _ in range(2 + n)]
    jax.block_until_ready(batches)
    for i in range(2):
        out = embed(trainable, frozen, batches[i])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = embed(trainable, frozen, batches[2 + i])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"embed step [{mode}] (text+audio, B={B}, 10 s): {dt*1e3:.1f} ms "
          f"= {B/dt:.1f} clips/s/chip "
          f"(reference eval ~12.5 clips/s)", flush=True)


if __name__ == "__main__":
    main()
