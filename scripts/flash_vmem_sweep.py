#!/usr/bin/env python
"""Time the flash attention kernel (fwd and fwd+bwd) at flagship shapes on
the real chip, varying the backward q-chunk.

History: a rows-per-grid-step sweep ran here in round 2 — folding 1/2/4
batch·head rows per grid step measured *flat* (9.5-9.8 ms fwd+bwd at B=32,
T=499) and 8 rows OOMed scoped VMEM, so the kernels keep one row per grid
step; the wins that stuck were the host-built Sel stack, the
transposed-contraction dqe, input-dtype gradient stores, and bwd chunk 256
(13.75 → ~9.5 ms fwd+bwd per layer)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, NH, T, HD, L, R = 32, 16, 499, 64, 64, 8


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

    def loss(q, k, v, e):
        o = fa.flash_attention(q, k, v, e, mask, num_heads=NH, left_max=L)
        return jnp.sum((o * w).astype(jnp.float32))

    for bq in (512, 256, 128):
        fa._bwd_chunk = lambda t_pad, _bq=bq: min(512, _bq)
        try:
            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
            gv = g(q, k, v, e)
            jax.block_until_ready(gv)
            t0 = time.perf_counter()
            n = 10
            for _ in range(n):
                gv = g(q, k, v, e)
            jax.block_until_ready(gv)
            dt = (time.perf_counter() - t0) / n
            print(f"bwd bq={bq}: {dt*1e3:.2f} ms fwd+bwd", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"bwd bq={bq}: FAIL {str(ex)[:160]}", flush=True)
        jax.clear_caches()


if __name__ == "__main__":
    main()
