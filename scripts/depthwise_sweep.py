#!/usr/bin/env python
"""Compare depthwise-conv formulations for the conformer conv module on the
real chip at flagship shapes: lax.conv_general_dilated (feature groups) vs an
explicit shift-and-scale sum. Both causal (left-pad kernel-1)."""

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
    w = jnp.asarray(rng.normal(size=(K, 1, H)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32)
                      ).astype(jnp.bfloat16)

    def conv_grouped(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1,),
            padding=[(K - 1, 0)],
            dimension_numbers=("NTC", "TIO", "NTC"), feature_group_count=H)

    def conv_shift(x, w):
        xp = jnp.pad(x, ((0, 0), (K - 1, 0), (0, 0)))
        acc = jnp.zeros_like(x, dtype=jnp.float32)
        for k in range(K):
            acc = acc + (xp[:, k:k + T] * w[k, 0].astype(x.dtype)
                         ).astype(jnp.float32)
        return acc.astype(x.dtype)

    out_a = jax.jit(conv_grouped)(x, w)
    out_b = jax.jit(conv_shift)(x, w)
    err = float(jnp.max(jnp.abs((out_a - out_b).astype(jnp.float32))))
    print(f"parity max err: {err:.4f}")

    for name, fn in (("grouped", conv_grouped), ("shift", conv_shift)):
        fwd = jax.jit(fn)

        def vg(x, w, _fn=fn):
            def loss(x, w):
                return jnp.sum((_fn(x, w) * cot).astype(jnp.float32))
            return jax.value_and_grad(loss, argnums=(0, 1))(x, w)

        jvg = jax.jit(vg)
        print(f"{name}: fwd {timeit(fwd, x, w)*1e3:.2f} ms, "
              f"fwd+bwd {timeit(jvg, x, w)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
