#!/usr/bin/env python
"""Ablate the flash kernel's internals on the real chip: time fwd and fwd+bwd
with (a) the full kernel, (b) the rel-bias replaced by zero, (c) bias and
softmax replaced by identity-ish ops — locating where the 9.4 ms/layer goes.
Results guide kernel optimization; parity is NOT expected for (b)/(c)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, NH, T, HD, L, R = 32, 16, 499, 64, 64, 8


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

    from speech_transcript_embeddings_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(
        rng.normal(size=s).astype(np.float32)).astype(jnp.bfloat16)
    q, k, v = mk(B * NH, T, HD), mk(B * NH, T, HD), mk(B * NH, T, HD)
    e = mk(L + R + 1, HD)
    mask = jnp.ones((B, T), jnp.float32)
    w = mk(B * NH, T, HD)

    bias_orig = fa._bias_rows
    dqe_orig = fa._dqe_rows

    def run(tag):
        def loss(q, k, v, e):
            o = fa.flash_attention(q, k, v, e, mask, num_heads=NH, left_max=L)
            return jnp.sum((o * w).astype(jnp.float32))
        jvg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        print(f"{tag}: fwd+bwd {timeit(jvg, q, k, v, e)*1e3:.2f} ms",
              flush=True)
        jax.clear_caches()

    run("full")

    fa._bias_rows = lambda qe, sel_ref, selmap, q0, t_pad, left, num_pos: 0.0
    run("no_bias_fwdside")                      # dqe (bwd bias grad) still on

    fa._dqe_rows = (lambda ds, sel_ref, selmap, q0, t_pad, left, num_pos:
                    jnp.zeros((ds.shape[0], fa.BLOCK), jnp.float32))
    run("no_bias_no_dqe")

    fa._bias_rows = bias_orig
    fa._dqe_rows = dqe_orig


if __name__ == "__main__":
    main()
