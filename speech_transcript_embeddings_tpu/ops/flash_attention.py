"""Pallas TPU flash attention with the in-tile banded relative_key bias.

Reference behavior: the w2v-bert-2.0 conformer's self-attention with
``position_embeddings_type='relative_key'`` (loaded by the reference via
``AutoModel.from_pretrained``, trainer_unfreeze.py:343):

    scores[i, j] = (q_i · k_j  +  q_i · E[clip(j - i, -L, R)]) / sqrt(hd)

The XLA path (``models/audio_encoder.RelPositionAttention``) materialises the
``[B, h, T, T]`` score matrix in HBM — ~500 MB per layer pass at the flagship
geometry and the measured single-chip bottleneck (43% MFU, ROUND1.md item 4).
This kernel keeps all score/softmax work in VMEM.

Structure (chosen by measurement — a classic (bh, q_tile, k_tile) online-
softmax grid ran *slower* than XLA here because 8k grid steps of ~0.2 µs of
MXU work each are pure per-step overhead): ONE grid step per batch·head row;
inside the kernel, static Python loops walk q chunks (``bq`` rows, sized to
VMEM) against the full key range, so each step does whole-row softmax with no
online state and no scratch carries.

The Shaw bias is computed without gathers (per-(q,k) gathers lower to scalar
loads on Mosaic — 200× slowdowns measured in round 1). For a 128×128
sub-block at static offset Δ, with m = (j−i) mod 128, ``bias[i,j] =
qE[i, c(Δ + j − i)]`` splits by the sign of j−i into two column-selections of
``qE = q·Eᵀ``:

  * fully clipped ranges (|Δ| past the clamp window, most sub-blocks at long
    T) collapse to a broadcast of one qE column — no matmul, no shift;
  * banded ranges build a one-hot map Sel in-register from iotas, take
    ``qE @ Sel`` on the MXU **in the input dtype** (a pure column selection —
    bf16-exact up to qE's own rounding), and align it onto the (i, j) grid
    with one per-row circular shift (``pltpu.roll`` with ``stride=1``);

the two cases merge under the triangular mask j ≥ i. The backward pass is one
more kernel producing dq, dk, dv **and dE** (the learned distance embedding's
gradient): dS is un-sheared back to band coordinates via rev∘shear∘rev (one
supported ``stride=1`` roll between two anti-identity MXU matmuls, the
trailing one folded into the column-reversed Sel stack) and the Sel matmuls
contract over their transposed dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
NEG = -1e30


# The backward must un-shear dS back to band coordinates: u[i, m] =
# x[i, (m + i) mod 128]. Mosaic only lowers non-negative per-vreg roll
# strides capped at the vreg width, so neither ``stride=-1`` nor
# ``stride=127`` exists. Instead use rev∘shear∘rev: with J the anti-identity,
# unshear(x) = (roll(x·J, stride=1))·J, and the trailing ·J folds into the
# Sel selection host-side (``_banded_sels(reverse_cols=True)``) — one
# supported roll plus MXU matmuls, replacing the previous 7-rotate/select
# ladder (ablated at ~2.9 ms of the 8.3 ms/layer backward).


def _part_kind(lo: int, hi: int, left: int, num_pos: int):
    """Classify a distance range [lo, hi]: fully left-clipped, fully
    right-clipped, or banded. num_pos = L + R + 1 → right clamp R =
    num_pos - 1 - left."""
    right = num_pos - 1 - left
    if lo >= right:
        return ("const", num_pos - 1)
    if hi <= -left:
        return ("const", 0)
    return ("band", None)


def _sel_matrix(delta: int, offs: int, left: int, num_pos: int, dtype):
    """One-hot Sel[d, m] = [clip(delta + m + offs + left) == d], built from
    iotas so the column selection runs as one MXU matmul. The matrices are
    static per (delta, offs): they are built HOST-side once and shipped into
    the kernel as a stacked VMEM input (``_banded_sels``) — constructing them
    in-kernel per sub-block was the kernel's VPU bottleneck (~6.5 µs/grid-step
    of iota/clip/eq against ~1 µs of MXU work, measured round 2)."""
    dd = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    mm = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    return (jnp.clip(delta + mm + offs + left, 0, num_pos - 1) == dd).astype(dtype)


@functools.lru_cache(maxsize=None)
def _selmap_for(t_pad: int, left: int, num_pos: int):
    """Static ((delta, offs) → index) table of the banded sub-block cases at
    this geometry — O(window/128) entries (4 at the flagship L=64/R=8),
    independent of T. Shared by the wrapper (which builds the matching Sel
    stack) and both kernels (which index it)."""
    entries = []
    nblk = t_pad // BLOCK
    for d in range(-(nblk - 1), nblk):
        delta = d * BLOCK
        for offs in (0, -BLOCK):
            lo = delta + (0 if offs == 0 else -BLOCK + 1)
            hi = delta + (BLOCK - 1 if offs == 0 else -1)
            if _part_kind(lo, hi, left, num_pos)[0] == "band":
                entries.append(((delta, offs), len(entries)))
    return tuple(entries)


def _banded_sels(t_pad: int, left: int, num_pos: int, dtype,
                 reverse_cols: bool = False):
    """Host-built [n(+1), 128, 128] stack of the banded Sel matrices, in the
    order of ``_selmap_for``.

    With ``reverse_cols`` (the backward's stack) each Sel gets its columns
    reversed — folding the trailing anti-identity of the rev∘shear∘rev
    unshear into the selection — and the anti-identity J itself is appended
    as the LAST slice (index ``len(selmap)``) for the in-kernel ``x·J``."""
    selmap = _selmap_for(t_pad, left, num_pos)
    mats = [_sel_matrix(delta, offs, left, num_pos, dtype)
            for (delta, offs), _ in selmap]
    if reverse_cols:
        mats = [m[:, ::-1] for m in mats]
        ii = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
        mats.append((jj == BLOCK - 1 - ii).astype(dtype))          # J
    if not mats:                       # degenerate window: keep a valid input
        mats.append(jnp.zeros((BLOCK, BLOCK), dtype))
    return jnp.stack(mats)


def _sub_bias(qe, sel_ref, selmap, delta: int, left: int, num_pos: int):
    """Bias for one 128×128 sub-block at static offset delta (f32).

    qe: [128, 128] (d-padded) in compute dtype. Case A covers j ≥ i
    (distances [delta, delta+127]), case B covers j < i ([delta-127, -1])."""
    def part(lo, hi, offs):
        kind, col = _part_kind(lo, hi, left, num_pos)
        if kind == "const":
            return qe[:, col:col + 1].astype(jnp.float32)       # [128, 1]
        sel = sel_ref[selmap[(delta, offs)]]
        a = jax.lax.dot_general(qe, sel, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # shear onto the (i, j) grid: out[i, j] = a[i, (j - i) mod 128]
        return pltpu.roll(a, shift=0, axis=1, stride=1, stride_axis=0)

    part_a = part(delta, delta + BLOCK - 1, 0)
    part_b = part(delta - BLOCK + 1, delta - 1, -BLOCK)
    ii = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    return jnp.where(jj >= ii, part_a, part_b)


def _bias_rows(qe, sel_ref, selmap, q0: int, t_pad: int, left: int,
               num_pos: int):
    """Bias strip [bq, t_pad] (f32) for q rows [q0, q0+bq), assembled from
    128-aligned sub-blocks (Mosaic concatenates aligned tiles cheaply)."""
    bq = qe.shape[0]
    strips = []
    for qs in range(bq // BLOCK):
        qe_blk = qe[qs * BLOCK:(qs + 1) * BLOCK]
        row = [jnp.broadcast_to(
                   _sub_bias(qe_blk, sel_ref, selmap,
                             ks * BLOCK - (q0 + qs * BLOCK), left,
                             num_pos), (BLOCK, BLOCK))
               for ks in range(t_pad // BLOCK)]
        strips.append(jnp.concatenate(row, axis=1) if len(row) > 1 else row[0])
    return jnp.concatenate(strips, axis=0) if len(strips) > 1 else strips[0]


def _dqe_rows(ds, selb_ref, selmap, q0: int, t_pad: int, left: int,
              num_pos: int):
    """Gradient through the bias: d(qE) strip [bq, 128] (f32) from dS.

    ``selb_ref`` is the backward Sel stack (columns reversed, anti-identity J
    appended): the banded contribution ``unshear(x)·selᵀ`` is computed as
    ``roll(x·J, stride=1)·sel_revᵀ`` — one supported strided roll plus two
    MXU matmuls per banded sub-block (see the unshear note above)."""
    bq = ds.shape[0]
    n_j = len(selmap)                       # J's slice index in the stack
    ii = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    tri_a = (jj >= ii).astype(jnp.float32)

    def onehot_col(c):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
        return (lane == c).astype(jnp.float32)

    strips = []
    for qs in range(bq // BLOCK):
        acc = jnp.zeros((BLOCK, BLOCK), jnp.float32)
        for ks in range(t_pad // BLOCK):
            delta = ks * BLOCK - (q0 + qs * BLOCK)
            sub = ds[qs * BLOCK:(qs + 1) * BLOCK,
                     ks * BLOCK:(ks + 1) * BLOCK]
            for offs, mask in ((0, tri_a), (-BLOCK, 1.0 - tri_a)):
                lo = delta + (0 if offs == 0 else -BLOCK + 1)
                hi = delta + (BLOCK - 1 if offs == 0 else -1)
                kind, col = _part_kind(lo, hi, left, num_pos)
                masked = sub * mask
                if kind == "const":
                    acc += (jnp.sum(masked, axis=1, keepdims=True)
                            * onehot_col(col))
                else:
                    # one-hot entries are bf16-exact: casting the shipped
                    # compute-dtype matrices to f32 is lossless
                    jmat = selb_ref[n_j].astype(jnp.float32)
                    sel2 = selb_ref[selmap[(delta, offs)]].astype(jnp.float32)
                    w = jax.lax.dot_general(
                        masked, jmat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    w = pltpu.roll(w, shift=0, axis=1, stride=1,
                                   stride_axis=0)
                    # x·selᵀ == dot_general contracting dim 1 with dim 1
                    acc += jax.lax.dot_general(
                        w, sel2, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
        strips.append(acc)
    return jnp.concatenate(strips, axis=0) if len(strips) > 1 else strips[0]


_STACK_BUDGET = 10 * 2 ** 20       # fwd q-chunk temporaries VMEM budget
_BWD_STACK_BUDGET = 8 * 2 ** 20    # bwd keeps ~9 temporaries live → tighter


def _chunk(t_pad: int) -> int:
    """Forward q-chunk rows per in-kernel iteration: the largest power-of-two
    multiple of BLOCK (≤512) whose ~5 live [bq, t_pad] f32 temporaries
    (scores, probs, bias strip, qe, acc) fit the ``_STACK_BUDGET`` (10 MB) —
    t_pad 512 → 512, 1024 → 512 (tight: passes only under the full 10 MB),
    1536-3072 → 256, beyond → 128."""
    for bq in (512, 256, 128):
        if 5 * bq * t_pad * 4 <= _STACK_BUDGET:
            return bq
    return BLOCK




def _fwd_kernel(nh, num_pos, left, t_pad, selmap,
                q_ref, k_ref, v_ref, e_ref, sel_ref, len_ref,
                out_ref, lse_ref):
    selmap = dict(selmap)
    bq = _chunk(t_pad)
    limit = len_ref[pl.program_id(0) // nh]
    k, v = k_ref[0], v_ref[0]
    kmask = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, t_pad), 1) < limit, 0.0, NEG)
    for q0 in range(0, t_pad, bq):
        q = q_ref[0, q0:q0 + bq]
        qe = jax.lax.dot_general(q, e_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(q.dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + _bias_rows(qe, sel_ref, selmap, q0, t_pad, left,
                           num_pos) + kmask
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = jax.lax.dot_general(p.astype(v.dtype), v,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out_ref[0, q0:q0 + bq] = (acc / l).astype(out_ref.dtype)
        lse_ref[0, q0:q0 + bq] = m + jnp.log(l)


def _bwd_chunk(t_pad: int) -> int:
    """Backward q-chunk: smaller than the forward's — the bwd body keeps ~9
    [bq, t_pad] f32 temporaries live (s, p, dp, ds, bias strip, unshear/dqe
    intermediates). 256 measured fastest at the flagship t_pad=512; longer
    buckets shrink the chunk to keep the stack under the budget (t_pad=1536,
    the 30 s bucket, needs 128 — 256 would put 14.2 MB of temporaries on the
    ~16 MB VMEM stack before block IO)."""
    for bq in (256, 128):
        if 9 * bq * t_pad * 4 <= _BWD_STACK_BUDGET:
            return bq
    return BLOCK


def _bwd_kernel(nh, num_pos, left, t_pad, selmap,
                q_ref, k_ref, v_ref, e_ref, sel_ref, selb_ref, len_ref,
                do_ref, lse_ref, dd_ref, dq_ref, dk_ref, dv_ref, de_ref):
    selmap = dict(selmap)
    bq = _bwd_chunk(t_pad)
    e = e_ref[:]
    limit = len_ref[pl.program_id(0) // nh]
    k, v = k_ref[0], v_ref[0]
    kmask = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, t_pad), 1) < limit, 0.0, NEG)
    hd = k.shape[-1]
    dk_acc = jnp.zeros((t_pad, hd), jnp.float32)
    dv_acc = jnp.zeros((t_pad, hd), jnp.float32)
    de_acc = jnp.zeros((BLOCK, hd), jnp.float32)
    for q0 in range(0, t_pad, bq):
        q = q_ref[0, q0:q0 + bq]
        do = do_ref[0, q0:q0 + bq]
        qe = jax.lax.dot_general(q, e, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(q.dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + _bias_rows(qe, sel_ref, selmap, q0, t_pad, left,
                           num_pos) + kmask
        p = jnp.exp(s - lse_ref[0, q0:q0 + bq])
        dv_acc += jax.lax.dot_general(p.astype(do.dtype), do,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dd_ref[0, q0:q0 + bq])
        ds_c = ds.astype(q.dtype)
        dq = jax.lax.dot_general(ds_c, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk_acc += jax.lax.dot_general(ds_c, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dqe = _dqe_rows(ds, selb_ref, selmap, q0, t_pad, left,
                        num_pos)
        dq = dq + jax.lax.dot_general(dqe.astype(e.dtype), e,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        de_acc += jax.lax.dot_general(dqe, q.astype(jnp.float32),
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dq_ref[0, q0:q0 + bq] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)
    de_ref[0] = de_acc


def _pad_t(x, t_pad):
    t = x.shape[1]
    return x if t == t_pad else jnp.pad(
        x, [(0, 0), (0, t_pad - t)] + [(0, 0)] * (x.ndim - 2))


def _specs(t_pad, hd):
    full = pl.BlockSpec((1, t_pad, hd), lambda i: (i, 0, 0))
    col = pl.BlockSpec((1, t_pad, 1), lambda i: (i, 0, 0))
    e_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return full, col, e_spec, len_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _flash(q, k, v, e_pad, sels, kmask, nh: int, num_pos: int, left: int,
           interpret: bool = False):
    out, _ = _flash_fwd_impl(q, k, v, e_pad, sels, kmask, nh, num_pos, left,
                             interpret)
    return out


def _prep_inputs(q, k, v, kmask):
    """Scale q, pad all three to a BLOCK multiple, reduce the prefix mask to
    per-row valid lengths."""
    bh, t, hd = q.shape
    t_pad = -(-t // BLOCK) * BLOCK
    inv_s = 1.0 / (hd ** 0.5)
    q_s = _pad_t(q * jnp.asarray(inv_s, q.dtype), t_pad)
    kp, vp = _pad_t(k, t_pad), _pad_t(v, t_pad)
    # contiguous-prefix key masks → one scalar valid length per batch row
    lengths = jnp.sum(kmask > 0, axis=-1).astype(jnp.int32)
    return q_s, kp, vp, lengths, t_pad


def _fwd_call(q_s, kp, vp, e_pad, sels, lengths, nh, num_pos, left, t_pad,
              interpret):
    bh, _, hd = q_s.shape
    full, col, e_spec, len_spec = _specs(t_pad, hd)
    selmap = _selmap_for(t_pad, left, num_pos)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nh, num_pos, left, t_pad, selmap),
        grid=(bh,),
        in_specs=[full, full, full, e_spec, e_spec, len_spec],
        out_specs=[full, col],
        out_shape=[jax.ShapeDtypeStruct((bh, t_pad, hd), q_s.dtype),
                   jax.ShapeDtypeStruct((bh, t_pad, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q_s, kp, vp, e_pad, sels, lengths)


def _flash_fwd_impl(q, k, v, e_pad, sels, kmask, nh, num_pos, left,
                    interpret):
    t = q.shape[1]
    q_s, kp, vp, lengths, t_pad = _prep_inputs(q, k, v, kmask)
    out, lse = _fwd_call(q_s, kp, vp, e_pad, sels, lengths, nh, num_pos, left,
                         t_pad, interpret)
    return out[:, :t], (q_s, kp, vp, e_pad, sels, lengths, kmask, out, lse)


def _flash_fwd(q, k, v, e_pad, sels, kmask, nh, num_pos, left, interpret):
    return _flash_fwd_impl(q, k, v, e_pad, sels, kmask, nh, num_pos, left,
                           interpret)


def _flash_bwd(nh, num_pos, left, interpret, res, dout):
    q_s, kp, vp, e_pad, sels, lengths, kmask, out_pad, lse = res
    bh, t_pad, hd = q_s.shape
    t = dout.shape[1]
    inv_s = 1.0 / (hd ** 0.5)
    do = _pad_t(dout, t_pad)
    dd = jnp.sum(do.astype(jnp.float32) * out_pad.astype(jnp.float32),
                 axis=-1, keepdims=True)                    # [bh, t_pad, 1]
    # dq/dk/dv leave the kernel in the INPUT dtype: accumulation stays f32
    # in-VMEM, only the final store downcasts (downstream casts to the input
    # dtype anyway) — halves output VMEM + HBM traffic. One row per grid
    # step: scripts/flash_vmem_sweep.py measured fwd+bwd flat across 1-4
    # rows folded per step (the kernels pipeline DMAs across grid steps
    # fine), so take the smallest VMEM footprint.
    grad_dtype = q_s.dtype
    full, col, e_spec, len_spec = _specs(t_pad, hd)
    selmap = _selmap_for(t_pad, left, num_pos)
    # backward Sel stack (reversed cols + J), a trace-time constant
    selsb = _banded_sels(t_pad, left, num_pos, sels.dtype, reverse_cols=True)

    dq, dk, dv, de_bh = pl.pallas_call(
        functools.partial(_bwd_kernel, nh, num_pos, left, t_pad, selmap),
        grid=(bh,),
        in_specs=[full, full, full, e_spec, e_spec, e_spec, len_spec, full,
                  col, col],
        out_specs=[full,
                   pl.BlockSpec((1, t_pad, hd), lambda i: (i, 0, 0)),
                   pl.BlockSpec((1, t_pad, hd), lambda i: (i, 0, 0)),
                   pl.BlockSpec((1, BLOCK, hd), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((bh, t_pad, hd), grad_dtype),
                   jax.ShapeDtypeStruct((bh, t_pad, hd), grad_dtype),
                   jax.ShapeDtypeStruct((bh, t_pad, hd), grad_dtype),
                   jax.ShapeDtypeStruct((bh, BLOCK, hd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q_s, kp, vp, e_pad, sels, selsb, lengths, do, lse, dd)

    dq = (dq[:, :t].astype(jnp.float32) * inv_s).astype(q_s.dtype)
    de = jnp.sum(de_bh, axis=0).astype(e_pad.dtype)
    return (dq, dk[:, :t].astype(kp.dtype), dv[:, :t].astype(vp.dtype),
            de, jnp.zeros_like(sels), jnp.zeros_like(kmask))


_flash.defvjp(_flash_fwd, _flash_bwd)


# Residual-saving variant for remat policies
# -------------------------------------------
# Under full per-block remat the backward replay re-runs the forward kernel
# just to rebuild its (out, lse) residuals — the single most expensive piece
# of the replay. This variant splits the op in two: the kernel runs once with
# no vjp attached, its outputs are tagged with ``checkpoint_name`` so a
# ``save_only_these_names('flash_out', 'flash_lse')`` remat policy keeps them,
# and a second custom_vjp op consumes (q, k, v, E, mask, out, lse) — identity
# on ``out`` forward, the flash backward kernel in reverse. The replay then
# recomputes only the cheap projection matmuls feeding q/k/v.

FLASH_SAVE_NAMES = ("flash_out", "flash_lse")

# longest padded sequence the kernels are verified to compile at (the 30 s
# audio bucket → conformer t_pad=1536; a 60 s probe OOMs scoped VMEM in the
# forward in a chunk-size-independent way). Callers should fall back to the
# XLA attention path beyond this.
MAX_T_PAD = 1536


def supports_length(t: int) -> bool:
    """True when the kernels handle sequence length ``t`` (after BLOCK
    padding) within the verified VMEM envelope."""
    return -(-t // BLOCK) * BLOCK <= MAX_T_PAD


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _flash_apply(q, k, v, e_pad, sels, kmask, out_pad, lse,
                 nh, num_pos, left, interpret):
    return out_pad[:, :q.shape[1]]


def _flash_apply_fwd(q, k, v, e_pad, sels, kmask, out_pad, lse,
                     nh, num_pos, left, interpret):
    t_pad = out_pad.shape[1]
    q_s, kp, vp, lengths, t_pad2 = _prep_inputs(q, k, v, kmask)
    assert t_pad2 == t_pad, (t_pad2, t_pad)
    res = (q_s, kp, vp, e_pad, sels, lengths, kmask, out_pad, lse)
    return out_pad[:, :q.shape[1]], res


def _flash_apply_bwd(nh, num_pos, left, interpret, res, dout):
    dq, dk, dv, de, dsels, dkmask = _flash_bwd(nh, num_pos, left, interpret,
                                               res, dout)
    out_pad, lse = res[7], res[8]
    return (dq, dk, dv, de, dsels, dkmask,
            jnp.zeros_like(out_pad), jnp.zeros_like(lse))


_flash_apply.defvjp(_flash_apply_fwd, _flash_apply_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    dist_embedding: jax.Array, kv_mask: jax.Array,
                    *, num_heads: int, left_max: int,
                    save_residuals: bool = False,
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
      save_residuals: tag the kernel's (out, lse) with
        ``checkpoint_name('flash_out'/'flash_lse')`` so a
        ``save_only_these_names(*FLASH_SAVE_NAMES)`` remat policy skips
        re-running the forward kernel in the backward replay.

    Returns ``[B·num_heads, T, head_dim]`` attention outputs (pre out-proj).
    """
    num_pos, hd = dist_embedding.shape
    if num_pos > BLOCK:
        raise ValueError(f"num_pos {num_pos} exceeds one lane tile ({BLOCK})")
    e_pad = jnp.zeros((BLOCK, hd), dist_embedding.dtype).at[:num_pos].set(
        dist_embedding)
    kmask = kv_mask.astype(jnp.float32)
    t_pad = -(-q.shape[1] // BLOCK) * BLOCK
    # static one-hot column-selection matrices for the banded sub-blocks,
    # built host-side once (XLA constant-folds them) instead of per grid step
    sels = _banded_sels(t_pad, left_max, num_pos, q.dtype)
    if not save_residuals:
        return _flash(q, k, v, e_pad, sels, kmask, num_heads, num_pos,
                      left_max, interpret)
    from jax.ad_checkpoint import checkpoint_name
    q_s, kp, vp, lengths, t_pad2 = _prep_inputs(
        jax.lax.stop_gradient(q), jax.lax.stop_gradient(k),
        jax.lax.stop_gradient(v), kmask)
    out_pad, lse = _fwd_call(q_s, kp, vp, jax.lax.stop_gradient(e_pad),
                             jax.lax.stop_gradient(sels),
                             lengths, num_heads, num_pos, left_max, t_pad2,
                             interpret)
    out_pad = checkpoint_name(out_pad, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return _flash_apply(q, k, v, e_pad, sels, kmask, out_pad, lse,
                        num_heads, num_pos, left_max, interpret)
