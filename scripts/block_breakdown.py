#!/usr/bin/env python
"""Per-component fwd and fwd+bwd timing of the conformer block at flagship
shapes — finds the next single-chip lever after flash attention.

Times each sub-module of ConformerBlock (ffn1, attention, conv, ffn2) and the
whole block, forward and value_and_grad, at [B, T, H] = [32, 499, 1024] bf16.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=499)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from speech_transcript_embeddings_tpu.utils.compilation_cache import enable
    enable()
    from speech_transcript_embeddings_tpu import config as config_lib
    from speech_transcript_embeddings_tpu.models import audio_encoder as ae

    b, t = args.batch, args.frames
    acfg = config_lib.AudioEncoderConfig(use_flash_attention=True)
    dtype = jnp.bfloat16
    h = acfg.hidden_size

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, h)).astype(np.float32)).astype(dtype)
    mask = jnp.ones((b, t), jnp.int32)
    w = jnp.asarray(rng.normal(size=(b, t, h)).astype(np.float32)).astype(dtype)

    modules = {
        "ffn1": (ae.AudioFeedForward(acfg, dtype), (x,), {}),
        "attention_flash": (ae.RelPositionAttention(acfg, dtype), (x, mask), {}),
        "conv": (ae.ConvModule(acfg, dtype), (x, mask), {}),
        "block": (ae.ConformerBlock(acfg, dtype), (x, mask), {}),
    }
    acfg_xla = config_lib.AudioEncoderConfig(use_flash_attention=False)
    modules["attention_xla"] = (ae.RelPositionAttention(acfg_xla, dtype),
                                (x, mask), {})

    results = []
    for name, (mod, inputs, kw) in modules.items():
        params = mod.init(jax.random.PRNGKey(0), *inputs, deterministic=True,
                          **kw)["params"]

        fwd = jax.jit(lambda p, *i: mod.apply({"params": p}, *i,
                                              deterministic=True, **kw))

        def loss(p, *i):
            o = mod.apply({"params": p}, *i, deterministic=True, **kw)
            return jnp.sum((o * w).astype(jnp.float32))

        # grads w.r.t. params AND input activations (the train-path shape:
        # cotangents flow through every block)
        vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

        t_fwd = timeit(fwd, params, *inputs)
        t_vg = timeit(vg, params, *inputs)
        results.append({"what": name, "fwd_ms": round(t_fwd * 1e3, 2),
                        "fwd_bwd_ms": round(t_vg * 1e3, 2)})
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
