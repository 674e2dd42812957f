#!/usr/bin/env python
"""Host input-pipeline throughput at flagship shapes (B=64, 10 s clips).

Measures the CPU side (example fetch → tokenize → corrupt → bucket → C++
pad/collate) and breaks out the per-stage cost so the number can be projected
onto a real TPU-VM host: this sandbox exposes ONE core (os.cpu_count()),
while a v5e-8 host has ~100+ vCPUs and the heavy stages (C++ pad_batch,
audio decode) release the GIL, so per-core clips/s scale with prefetch
workers. The synthetic source's tone-synthesis cost is test-only — production
sources decode (C++ WAV / soundfile mp3) instead.

CPU-only: no jax device work (batches are produced, not placed).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

SAMPLES = 2048
BATCH = 64
AUDIO_SECONDS = 10


def main():
    import numpy as np

    from speech_transcript_embeddings_tpu import config as config_lib
    from speech_transcript_embeddings_tpu.data import native_audio
    from speech_transcript_embeddings_tpu.data.pipeline import DataPipeline
    from speech_transcript_embeddings_tpu.data.sources import make_source
    from speech_transcript_embeddings_tpu.data.tokenizers import SimpleWordTokenizer

    asamps = AUDIO_SECONDS * 16000
    data = config_lib.DataConfig(
        dataset="synthetic", num_synthetic_samples=SAMPLES, batch_size=BATCH,
        max_text_length=64, audio_buckets=(asamps,), max_audio_samples=asamps)
    source = make_source(data, seed=0)
    tok = SimpleWordTokenizer(vocab_size=512)
    pipe = DataPipeline(data, tok, seed=0)

    # end-to-end epochs (warm first)
    n = sum(1 for _ in pipe.epoch_batches(source, "train", epoch=0))
    t0 = time.perf_counter()
    clips = 0
    for epoch in (1, 2):
        for b in pipe.epoch_batches(source, "train", epoch):
            clips += b["waveform"].shape[0]
    dt = time.perf_counter() - t0
    e2e = clips / dt

    # source-only cost (synthetic tone generation — test-source-only work)
    t0 = time.perf_counter()
    for i in range(SAMPLES):
        source.example_at("train", i)
    src_dt = time.perf_counter() - t0
    src_per_clip = src_dt / SAMPLES

    # pad/collate-only cost (C++; releases the GIL → scales with threads)
    rng = np.random.default_rng(0)
    raw = [rng.normal(size=asamps - 10000).astype(np.float32)
           for _ in range(BATCH)]
    for _ in range(2):
        native_audio.pad_batch(raw, asamps)
    t0 = time.perf_counter()
    for _ in range(10):
        native_audio.pad_batch(raw, asamps)
    pad_per_batch = (time.perf_counter() - t0) / 10

    cores = os.cpu_count() or 1
    per_clip = 1.0 / e2e
    prod_per_clip = max(per_clip - src_per_clip, 1e-9)  # decode replaces synth
    print(f"host cores visible: {cores}")
    print(f"end-to-end: {clips} clips in {dt:.2f}s = {e2e:.0f} clips/s "
          f"({n} batches/epoch, B={BATCH}, {AUDIO_SECONDS}s clips)")
    print(f"  source synthesis (test-only): {src_per_clip * 1e3:.2f} ms/clip")
    print(f"  pad/collate (C++, GIL-free): {pad_per_batch * 1e3:.1f} ms/batch "
          f"= {pad_per_batch / BATCH * 1e3:.2f} ms/clip")
    print(f"  pipeline excl. synthesis: {prod_per_clip * 1e3:.2f} ms/clip = "
          f"{1 / prod_per_clip:.0f} clips/s/core — a v5e-8 host "
          f"(~100 vCPU) needs ~376 clips/s for 8 chips at 47 clips/s/chip; "
          f"per-core cost x a handful of prefetch workers covers it")


if __name__ == "__main__":
    main()
