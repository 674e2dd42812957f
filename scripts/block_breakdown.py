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


def chained_times(mod, params, x, mask, kw, k1=2, k2=6):
    """Per-iteration fwd and fwd+bwd time of one module application, measured
    as the slope between two in-jit chain lengths (cancels dispatch overhead
    and defeats relay-side result caching — see ROUND2.md 'Measurement
    methodology'). The carry is RMS-renormalised between iterations so
    magnitudes stay finite; that adds one elementwise pass (<2% of any module
    here)."""
    import jax
    import jax.numpy as jnp

    def chain(k):
        def fwd(p, c):
            def step(cc, _):
                y = mod.apply({"params": p}, cc,
                              *((mask,) if mask is not None else ()),
                              deterministic=True, **kw)
                y = y * jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-6)
                return y.astype(cc.dtype), None

            out, _ = jax.lax.scan(step, c, None, length=k)
            return out

        def loss(p, c):
            return jnp.sum(fwd(p, c).astype(jnp.float32))

        return (jax.jit(fwd), jax.jit(jax.value_and_grad(loss, argnums=(0, 1))))

    # distinct device-resident inputs per call — identical re-executions can
    # be served from a relay-side cache (ROUND2.md measurement rule), which
    # would zero out the slope
    key = jax.random.PRNGKey(17)
    xs = [jax.block_until_ready(x + 1e-3 * jax.random.normal(
        jax.random.fold_in(key, i), x.shape, x.dtype)) for i in range(8)]

    def timed(fn, n=12, warmup=3):
        # median of per-call blocked durations: the relay adds several ms of
        # per-dispatch jitter, which a mean over a short run cannot reject;
        # the blocking sync cost is a constant and cancels in the slope
        import time
        for i in range(warmup):
            jax.block_until_ready(fn(params, xs[i % len(xs)]))
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, xs[i % len(xs)]))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    f1, g1 = chain(k1)
    f2, g2 = chain(k2)
    tf = (timed(f2) - timed(f1)) / (k2 - k1)
    tg = (timed(g2) - timed(g1)) / (k2 - k1)
    return tf, tg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=499)
    ap.add_argument("--chained", action="store_true",
                    help="slope-based in-jit chained timing (true kernel cost)")
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

        if args.chained:
            m = inputs[1] if len(inputs) > 1 else None
            # memory-light modules get long chains (bigger slope deltas);
            # attention/block backward chains hold per-step activations
            ks = {"ffn1": (8, 24), "conv": (8, 24)}.get(name, (2, 8))
            try:
                tf, tg = chained_times(mod, params, inputs[0], m, kw,
                                       k1=ks[0], k2=ks[1])
            except Exception as e:  # e.g. HBM OOM on the long chain
                print(json.dumps({"what": name,
                                  "error": type(e).__name__}), flush=True)
                continue
            results.append({"what": name, "fwd_ms": round(tf * 1e3, 2),
                            "fwd_bwd_ms": round(tg * 1e3, 2)})
            print(json.dumps(results[-1]), flush=True)
            continue

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
