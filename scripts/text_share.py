#!/usr/bin/env python
"""Quantify the text encoder's share of the flagship train step — bounds the
win available from a text-side flash-attention kernel (VERDICT r2 weak #2
named "text-encoder attention is still the XLA path" as an untried lever).

Times TextEncoder forward and value_and_grad at the train-path shape
([2B, T=128] — pos+neg folded into one batched call, dual_encoder.py), plus
the attention-only sub-module, at flagship geometry (12×768, mpnet-class).
Compare against the full-step time from scripts/ab_remat.py.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args_list, n=10, warmup=2):
    import jax
    for i in range(warmup):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128,
                    help="folded batch (2x the clip batch: pos+neg)")
    ap.add_argument("--tlen", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from speech_transcript_embeddings_tpu.utils.compilation_cache import enable
    enable()
    from speech_transcript_embeddings_tpu import config as config_lib
    from speech_transcript_embeddings_tpu.models.text_encoder import (
        TextEncoder, TextSelfAttention,
    )

    m = config_lib.flagship_model_config()
    tcfg = m.text
    dtype = jnp.bfloat16
    b, t = args.batch, args.tlen
    rng = np.random.default_rng(0)

    # one DISTINCT device batch per measured step (bench.py measurement rule:
    # repeating one device batch lets a relay-cached execution short-circuit)
    n_steps = 12
    ids_list = [jnp.asarray(rng.integers(4, tcfg.vocab_size,
                                         size=(b, t)).astype(np.int32))
                for _ in range(n_steps)]
    mask = jnp.ones((b, t), jnp.int32)
    x_list = [jnp.asarray(rng.normal(size=(b, t, tcfg.hidden_size))
                          .astype(np.float32)).astype(dtype)
              for _ in range(n_steps)]
    w = jnp.asarray(rng.normal(size=(b, t, tcfg.hidden_size))
                    .astype(np.float32)).astype(dtype)

    enc = TextEncoder(tcfg, dtype, remat=m.remat)  # matches DualEncoderModel
    params = enc.init(jax.random.PRNGKey(0), ids_list[0], mask,
                      deterministic=True)["params"]

    fwd = jax.jit(lambda p, i, mk: enc.apply({"params": p}, i, mk,
                                             deterministic=True))

    def loss(p, i, mk):
        return jnp.sum((enc.apply({"params": p}, i, mk,
                                  deterministic=True) * w).astype(jnp.float32))

    vg = jax.jit(jax.value_and_grad(loss))

    t_fwd = timeit(fwd, [(params, i, mask) for i in ids_list])
    t_vg = timeit(vg, [(params, i, mask) for i in ids_list])
    print(f"text encoder ({tcfg.num_layers}x{tcfg.hidden_size}, "
          f"B={b}, T={t}): fwd {t_fwd*1e3:.2f} ms, "
          f"fwd+bwd {t_vg*1e3:.2f} ms")

    attn = TextSelfAttention(tcfg, dtype)
    aparams = attn.init(jax.random.PRNGKey(0), x_list[0], mask,
                        deterministic=True)["params"]
    afwd = jax.jit(lambda p, xx, mk: attn.apply({"params": p}, xx, mk,
                                                deterministic=True))

    def aloss(p, xx, mk):
        return jnp.sum((attn.apply({"params": p}, xx, mk,
                                   deterministic=True) * w).astype(jnp.float32))

    avg = jax.jit(jax.value_and_grad(aloss, argnums=(0, 1)))
    t_afwd = timeit(afwd, [(aparams, xx, mask) for xx in x_list])
    t_avg = timeit(avg, [(aparams, xx, mask) for xx in x_list])
    print(f"one attention block (incl. qkv/out proj + LN): fwd {t_afwd*1e3:.3f} ms, "
          f"fwd+bwd {t_avg*1e3:.3f} ms -> x{tcfg.num_layers} layers = "
          f"{t_avg*tcfg.num_layers*1e3:.1f} ms")


if __name__ == "__main__":
    main()
