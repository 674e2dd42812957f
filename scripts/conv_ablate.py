#!/usr/bin/env python
"""Ablate the conformer ConvModule's forward on the real chip at flagship
shapes: where do 2.45 ms go (theory: ~0.6 ms of matmul + ~0.2 ms depthwise)?
Each variant removes one stage; not numerically meaningful, timing only."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, H, K = 32, 499, 1024, 31


def timeit(fn, *args, n=20):
    import jax
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(H, 2 * H)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    dw = jnp.asarray(rng.normal(size=(K, 1, H)).astype(np.float32))
    g = jnp.ones((H,), jnp.float32)

    def ln(v, name_scale=g):
        m = jnp.mean(v.astype(jnp.float32), axis=-1, keepdims=True)
        c = v.astype(jnp.float32) - m
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        return (c * jax.lax.rsqrt(var + 1e-5)).astype(v.dtype)

    def depthwise(v):
        return jax.lax.conv_general_dilated(
            v, dw.astype(v.dtype), window_strides=(1,),
            padding=[(K - 1, 0)],
            dimension_numbers=("NTC", "TIO", "NTC"), feature_group_count=H)

    def full(x):
        y = ln(x)
        y = jnp.dot(y, w1)
        a, b = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(b)
        y = depthwise(y)
        y = ln(y)
        y = y * jax.nn.sigmoid(y)
        return jnp.dot(y, w2)

    def no_depthwise(x):
        y = ln(x)
        y = jnp.dot(y, w1)
        a, b = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(b)
        y = ln(y)
        y = y * jax.nn.sigmoid(y)
        return jnp.dot(y, w2)

    def no_lns(x):
        y = jnp.dot(x, w1)
        a, b = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(b)
        y = depthwise(y)
        y = y * jax.nn.sigmoid(y)
        return jnp.dot(y, w2)

    def matmuls_only(x):
        y = jnp.dot(x, w1)
        a, b = jnp.split(y, 2, axis=-1)
        return jnp.dot(a * jax.nn.sigmoid(b), w2)

    for name, fn in (("full", full), ("no_depthwise", no_depthwise),
                     ("no_lns", no_lns), ("matmuls_only", matmuls_only)):
        jfn = jax.jit(fn)
        print(f"{name}: {timeit(jfn, x)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
