#!/usr/bin/env python
"""Inference (embedding) throughput at flagship geometry on the real chip —
the counterpart of the reference's eval throughput (~12.5 clips/s on V100,
BASELINE.md). Measures the jitted embed step: on-device log-mel frontend +
conformer + attentive pooling + projection, audio side, B=64, 10 s clips,
plus the text side at T=64. Distinct device-resident batches per step."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, AUDIO_SECONDS, TLEN = 64, 10, 64


def main():
    import dataclasses

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
    print(f"embed step (text+audio, B={B}, 10 s): {dt*1e3:.1f} ms "
          f"= {B/dt:.1f} clips/s/chip "
          f"(reference eval ~12.5 clips/s)", flush=True)


if __name__ == "__main__":
    main()
