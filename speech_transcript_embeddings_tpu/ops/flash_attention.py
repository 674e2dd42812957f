"""Pallas TPU flash attention with the in-tile banded relative_key bias.

Reference behavior: the w2v-bert-2.0 conformer's self-attention with
``position_embeddings_type='relative_key'`` (loaded by the reference via
``AutoModel.from_pretrained``, trainer_unfreeze.py:343):

    scores[i, j] = (q_i · k_j  +  q_i · E[clip(j - i, -L, R)]) / sqrt(hd)

The XLA path (``models/audio_encoder.RelPositionAttention``) materialises the
``[B, h, T, T]`` score matrix in HBM — ~500 MB per layer pass at the flagship
geometry and the measured single-chip bottleneck (43% MFU, ROUND1.md item 4).
This kernel streams k/v tiles through VMEM with an online softmax, and computes
the banded Shaw-style bias *without gathers* (per-(q,k) gathers lower to scalar
loads on Mosaic — 200× slowdowns measured in round 1):

For a 128×128 tile pair at offset Δ = 128·(k_tile − q_tile), write m = (j−i)
mod 128. Then ``bias[i, j] = qE[i, c(Δ + j − i)]`` splits by the sign of j−i
into two *column selections* of ``qE = q·Eᵀ`` with static-per-tile maps
m → clip(Δ + m + L) (j ≥ i) and m → clip(Δ + m − 128 + L) (j < i). Each
selection is a one-hot matmul ``qE @ Sel`` on the MXU (Sel built in-register
from iotas), aligned onto the (i, j) grid by one per-row circular shift
(``pltpu.roll`` with ``stride=1`` — a shear), and combined with the triangular
mask j ≥ i. Cost: two extra 128³ matmuls + two rolls per tile pair — MXU work,
which attention has spare capacity for; zero HBM score traffic.

The backward pass is two more Pallas kernels (dq+dE and dk+dv) using the same
bias machinery transposed: dS is un-sheared (``stride = 127 ≡ −1 mod 128``)
back to diagonal-band coordinates, and the Sel matmuls run in reverse to give
the gradient through qE — including dE, the learned distance embedding's
gradient, accumulated per (batch·head) tile and reduced in XLA.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
NEG = -1e30


def _rel_bias(q_s, e, qi, ki, num_pos, left):
    """Banded Shaw bias for one 128×128 tile pair (see module docstring).

    q_s: [BLOCK, hd] pre-scaled queries; e: [BLOCK(pad), hd] distance embedding
    (rows ≥ num_pos zero). Returns f32 [BLOCK, BLOCK] with
    bias[i, j] = q_s[i] · e[clip(Δ + j - i + left, 0, num_pos-1)].
    """
    delta = (ki - qi) * BLOCK
    qe = jax.lax.dot_general(q_s, e, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [i, d=128]
    dd = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)   # d rows
    mm = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)   # m cols
    sel_a = (jnp.clip(delta + mm + left, 0, num_pos - 1) == dd)
    sel_b = (jnp.clip(delta + mm - BLOCK + left, 0, num_pos - 1) == dd)
    a = jax.lax.dot_general(qe, sel_a.astype(jnp.float32),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)   # [i, m]
    b = jax.lax.dot_general(qe, sel_b.astype(jnp.float32),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # shear onto the (i, j) grid: rolled[i, j] = x[i, (j - i) mod 128]
    a = pltpu.roll(a, shift=0, axis=1, stride=1, stride_axis=0)
    b = pltpu.roll(b, shift=0, axis=1, stride=1, stride_axis=0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    return jnp.where(jj >= ii, a, b)


def _unshear(x):
    """Inverse of the stride-1 shear: u[i, m] = x[i, (m + i) mod 128].

    Mosaic's dynamic_rotate caps the max per-vreg shift at the vreg width, so
    the direct ``stride = 127 (≡ -1)`` roll does not lower; decompose the
    row-dependent rotate into 7 constant rotates selected by the row index's
    bits (shift -i = Σ_b -2^b over i's set bits, composed additively).
    """
    ii = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    for b in range(7):                       # 2^7 == BLOCK
        rolled = pltpu.roll(x, shift=BLOCK - (1 << b), axis=1)
        x = jnp.where((ii >> b) & 1 == 1, rolled, x)
    return x


def _scores(q_s, k, e, limit, qi, ki, num_pos, left):
    """Masked, biased, scaled attention scores for one tile pair (f32).

    ``limit`` is this batch row's valid key count: key masks are contiguous
    prefixes here (frame validity from the frontend), which lets the mask live
    as one scalar in SMEM instead of a vector input Mosaic cannot block as
    (1, 128).
    """
    s = jax.lax.dot_general(q_s, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + _rel_bias(q_s, e, qi, ki, num_pos, left)
    jj = ki * BLOCK + jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    return jnp.where(jj < limit, s, NEG)


def _fwd_kernel(nh, num_pos, left, nk,
                q_ref, k_ref, v_ref, e_ref, len_ref,
                out_ref, lse_ref, m_scr, l_scr, acc_scr):
    bh, qi, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s = _scores(q_ref[0], k_ref[0], e_ref[:], len_ref[bh // nh], qi, ki,
                num_pos, left)
    m_prev, l_prev = m_scr[:], l_scr[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)                  # [128, 1]
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    corr = jnp.exp(m_prev[:, :1] - m_next[:, :1])              # [128, 1]
    p = jnp.exp(s - m_next[:, :1])                             # [128, 128]
    l_cur = jnp.sum(p, axis=1, keepdims=True)
    m_scr[:] = m_next
    l_scr[:] = l_prev * corr + jnp.broadcast_to(l_cur, l_prev.shape)
    acc_scr[:] = (acc_scr[:] * corr
                  + jax.lax.dot_general(
                      p.astype(v_ref.dtype), v_ref[0],
                      (((1,), (0,)), ((), ())),
                      preferred_element_type=jnp.float32))

    @pl.when(ki == nk - 1)
    def _fin():
        l = jnp.maximum(l_scr[:, :1], 1e-30)
        out_ref[0] = (acc_scr[:] / l).astype(out_ref.dtype)
        lse_ref[0, 0] = m_scr[:, :1] + jnp.log(l)


def _dq_kernel(nh, num_pos, left, nk,
               q_ref, k_ref, v_ref, e_ref, len_ref, do_ref, lse_ref, dd_ref,
               dq_ref, de_ref, dq_scr, de_scr):
    bh, qi, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

        @pl.when(qi == 0)
        def _():
            de_scr[:] = jnp.zeros_like(de_scr)

    s = _scores(q_ref[0], k_ref[0], e_ref[:], len_ref[bh // nh], qi, ki,
                num_pos, left)
    p = jnp.exp(s - lse_ref[0, 0])                             # [128q, 128k]
    dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dd_ref[0, 0])                               # [128q, 128k]
    # plain qk term
    dq_scr[:] += jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # rel-bias term: unshear ds back to (i, m) band coordinates, then reverse
    # the one-hot column selections to recover d(qE)
    delta = (ki - qi) * BLOCK
    ii = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    da_sh = jnp.where(jj >= ii, ds, 0.0)
    db_sh = jnp.where(jj >= ii, 0.0, ds)
    da = _unshear(da_sh)
    db = _unshear(db_sh)
    mm = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)   # m rows
    dd_i = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)  # d cols
    sel_a_t = (jnp.clip(delta + mm + left, 0, num_pos - 1) == dd_i)
    sel_b_t = (jnp.clip(delta + mm - BLOCK + left, 0, num_pos - 1) == dd_i)
    dqe = (jax.lax.dot_general(da, sel_a_t.astype(jnp.float32),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           + jax.lax.dot_general(db, sel_b_t.astype(jnp.float32),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32))
    dq_scr[:] += jax.lax.dot_general(
        dqe.astype(e_ref.dtype), e_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dE accumulates over every (qi, ki) of this batch·head slice
    de_scr[:] += jax.lax.dot_general(
        dqe, q_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _fin():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)

        @pl.when(qi == pl.num_programs(1) - 1)
        def _():
            de_ref[0] = de_scr[:]


def _dkv_kernel(nh, num_pos, left, nq,
                q_ref, k_ref, v_ref, e_ref, len_ref, do_ref, lse_ref, dd_ref,
                dk_ref, dv_ref, dk_scr, dv_scr):
    bh, ki, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    s = _scores(q_ref[0], k_ref[0], e_ref[:], len_ref[bh // nh], qi, ki,
                num_pos, left)
    p = jnp.exp(s - lse_ref[0, 0])
    dv_scr[:] += jax.lax.dot_general(
        p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dd_ref[0, 0])
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(qi == nq - 1)
    def _fin():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _pad_t(x, t_pad):
    t = x.shape[1]
    return x if t == t_pad else jnp.pad(
        x, [(0, 0), (0, t_pad - t)] + [(0, 0)] * (x.ndim - 2))


def _common_specs(hd):
    """BlockSpecs shared by all three kernels, in (bh, a, b) grid order where
    the q-index and k-index positions are given per kernel."""
    def qkv(which):     # which: 1 → grid axis 1, 2 → grid axis 2
        return pl.BlockSpec((1, BLOCK, hd),
                            lambda bh, a, b, w=which: (bh, (a, b)[w - 1], 0))
    def col(which):     # [BH, n, BLOCK, 1] per-row stats (lse, D)
        return pl.BlockSpec((1, 1, BLOCK, 1),
                            lambda bh, a, b, w=which: (bh, (a, b)[w - 1], 0, 0))
    e_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec(memory_space=pltpu.SMEM)   # [B] int32 valid lengths
    return qkv, col, e_spec, len_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash(q, k, v, e_pad, kmask, nh: int, num_pos: int, left: int,
           interpret: bool = False):
    out, _ = _flash_fwd_impl(q, k, v, e_pad, kmask, nh, num_pos, left,
                             interpret)
    return out


def _flash_fwd_impl(q, k, v, e_pad, kmask, nh, num_pos, left, interpret):
    bh, t, hd = q.shape
    t_pad = -(-t // BLOCK) * BLOCK
    nt = t_pad // BLOCK
    inv_s = 1.0 / (hd ** 0.5)
    q_s = _pad_t(q * jnp.asarray(inv_s, q.dtype), t_pad)
    kp, vp = _pad_t(k, t_pad), _pad_t(v, t_pad)
    # contiguous-prefix key masks → one scalar valid length per batch row
    lengths = jnp.sum(kmask > 0, axis=-1).astype(jnp.int32)
    qkv, col, e_spec, len_spec = _common_specs(hd)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, nh, num_pos, left, nt),
        grid=(bh, nt, nt),
        in_specs=[qkv(1), qkv(2), qkv(2), e_spec, len_spec],
        out_specs=[qkv(1), col(1)],
        out_shape=[jax.ShapeDtypeStruct((bh, t_pad, hd), q.dtype),
                   jax.ShapeDtypeStruct((bh, nt, BLOCK, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((BLOCK, 128), jnp.float32),
                        pltpu.VMEM((BLOCK, 128), jnp.float32),
                        pltpu.VMEM((BLOCK, hd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q_s, kp, vp, e_pad, lengths)
    return out[:, :t], (q_s, kp, vp, e_pad, lengths, kmask, out, lse)


def _flash_fwd(q, k, v, e_pad, kmask, nh, num_pos, left, interpret):
    out, res = _flash_fwd_impl(q, k, v, e_pad, kmask, nh, num_pos, left,
                               interpret)
    return out, res


def _flash_bwd(nh, num_pos, left, interpret, res, dout):
    q_s, kp, vp, e_pad, lengths, kmask, out_pad, lse = res
    bh, t_pad, hd = q_s.shape
    nt = t_pad // BLOCK
    t = dout.shape[1]
    inv_s = 1.0 / (hd ** 0.5)
    do = _pad_t(dout, t_pad)
    dd = jnp.sum(do.astype(jnp.float32) * out_pad.astype(jnp.float32),
                 axis=-1).reshape(bh, nt, BLOCK, 1)
    qkv, col, e_spec, len_spec = _common_specs(hd)

    dq, de_bh = pl.pallas_call(
        functools.partial(_dq_kernel, nh, num_pos, left, nt),
        grid=(bh, nt, nt),
        in_specs=[qkv(1), qkv(2), qkv(2), e_spec, len_spec, qkv(1),
                  col(1), col(1)],
        out_specs=[qkv(1),
                   pl.BlockSpec((1, BLOCK, hd), lambda bh_, a, b: (bh_, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((bh, t_pad, hd), jnp.float32),
                   jax.ShapeDtypeStruct((bh, BLOCK, hd), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((BLOCK, hd), jnp.float32),
                        pltpu.VMEM((BLOCK, hd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(q_s, kp, vp, e_pad, lengths, do, lse, dd)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, nh, num_pos, left, nt),
        grid=(bh, nt, nt),
        in_specs=[qkv(2), qkv(1), qkv(1), e_spec, len_spec, qkv(2),
                  col(2), col(2)],
        out_specs=[qkv(1), qkv(1)],
        out_shape=[jax.ShapeDtypeStruct((bh, t_pad, hd), jnp.float32),
                   jax.ShapeDtypeStruct((bh, t_pad, hd), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((BLOCK, hd), jnp.float32),
                        pltpu.VMEM((BLOCK, hd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q_s, kp, vp, e_pad, lengths, do, lse, dd)

    dq = (dq[:, :t] * inv_s).astype(q_s.dtype)
    de = jnp.sum(de_bh, axis=0).astype(e_pad.dtype)
    return (dq, dk[:, :t].astype(kp.dtype), dv[:, :t].astype(vp.dtype),
            de, jnp.zeros_like(kmask))


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    dist_embedding: jax.Array, kv_mask: jax.Array,
                    *, num_heads: int, left_max: int,
                    interpret: bool = False) -> jax.Array:
    """Relative_key flash attention.

    Args:
      q, k, v: ``[B·num_heads, T, head_dim]`` (q unscaled).
      dist_embedding: ``[num_pos, head_dim]`` learned distance embedding with
        ``num_pos = left_max + right_max + 1 ≤ 128`` (shared across heads).
      kv_mask: ``[B, T]`` 0/1 key validity mask. Must be a contiguous prefix
        mask (all valid keys before all padding — true for frame-validity
        masks from the frontend): the kernel reduces it to one valid-length
        scalar per row, held in SMEM.
      num_heads: heads per batch row (for mask indexing).
      left_max: the distance clamp's left extent L (clip(j-i, -L, R)).

    Returns ``[B·num_heads, T, head_dim]`` attention outputs (pre out-proj).
    """
    num_pos, hd = dist_embedding.shape
    if num_pos > BLOCK:
        raise ValueError(f"num_pos {num_pos} exceeds one lane tile ({BLOCK})")
    e_pad = jnp.zeros((BLOCK, hd), dist_embedding.dtype).at[:num_pos].set(
        dist_embedding)
    return _flash(q, k, v, e_pad, kv_mask.astype(jnp.float32),
                  num_heads, num_pos, left_max, interpret)
