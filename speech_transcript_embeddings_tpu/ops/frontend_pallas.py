"""Fused Pallas TPU kernel for the log-mel frontend.

Computes the unnormalised log-mel spectrogram (the heavy part of
``ops/frontend.py``) as one kernel per 128-frame tile:

    HBM waveform tile ──DMA──▶ VMEM ─reshape trick─▶ frames [128, 400]
        ─MXU─▶ DFT cos|sin [128, 1024] ─VPU─▶ power [128, 512]
        ─MXU─▶ mel [128, 128] ─VPU─▶ log ──▶ out tile

Why a kernel: the XLA path materialises the overlapping frame matrix
``[B, T, 400]`` in HBM (≈19 MB per 30 s clip) between the gather and the DFT
matmul; here frames are built in VMEM from a strided view of the raw samples
(three static row-slices of a ``[131, 160]`` tile — hop 160 divides into the
400-sample window as 2.5 rows), so HBM traffic is just samples in (0.64 MB/clip)
and log-mels out.

Packing: the fused DFT matrix (remove-DC ∘ preemphasis ∘ window ∘ DFT, see
``make_frame_transform``) is laid out ``[400, 1024]`` with the 257 cos columns at
0 and the 257 sin columns at 512 so the power-spectrum split lands on aligned
128-lane boundaries; the mel filter bank is ``[512, 128]`` (rows ≥257 and cols
≥80 zero). Masked per-bin normalisation and stride-2 stacking stay in XLA (they
are cheap and fuse into the consumer).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from speech_transcript_embeddings_tpu.config import FrontendConfig
from speech_transcript_embeddings_tpu.ops import frontend as fe

FRAMES_PER_TILE = 128
ROWS_PER_TILE = FRAMES_PER_TILE + 3      # 131 hop-rows cover 128 frames + window tail
COS_OFFSET, SIN_OFFSET, PACK_WIDTH = 0, 512, 1024
MEL_ROWS, MEL_COLS = 512, 128


def packed_transform(cfg: FrontendConfig) -> np.ndarray:
    """[3, hop, 1024] cos‖sin packing of the fused DFT matrix, split into three
    hop-length row blocks so the kernel computes the frame matmul as
    ``A@T0 + B@T1 + C@T2`` over whole hop-row tiles (no overlapping-frame
    concatenation — Mosaic cannot concat offset layouts). Block 2 covers the
    final 80 window samples; its tail rows are zero."""
    tr = fe.make_frame_transform(cfg)                  # [400, 514]
    num_freq = cfg.fft_length // 2 + 1
    hop = cfg.hop_length
    packed = np.zeros((3, hop, PACK_WIDTH), np.float32)
    full = np.zeros((3 * hop, PACK_WIDTH), np.float32)
    full[: cfg.frame_length, COS_OFFSET:COS_OFFSET + num_freq] = tr[:, :num_freq]
    full[: cfg.frame_length, SIN_OFFSET:SIN_OFFSET + num_freq] = tr[:, num_freq:]
    for r in range(3):
        packed[r] = full[r * hop:(r + 1) * hop]
    return packed


def packed_mel(cfg: FrontendConfig) -> np.ndarray:
    """[512, 128] zero-padded mel filter bank."""
    mel = fe.make_mel_filters(cfg)                     # [257, 80]
    out = np.zeros((MEL_ROWS, MEL_COLS), np.float32)
    out[: mel.shape[0], : mel.shape[1]] = mel
    return out


def _kernel(cfg: FrontendConfig, w0_ref, w1_ref, w2_ref, transform_ref, mel_ref,
            out_ref):
    scale = jnp.float32(2.0 ** 15)                     # Kaldi 16-bit compliance
    # frame f spans hop-rows f, f+1, f+2: fold the overlap into three matmuls
    # over the three row-shifted tile views (pipelined into VMEM by BlockSpec)
    spec = (
        jnp.dot(w0_ref[0] * scale, transform_ref[0],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(w1_ref[0] * scale, transform_ref[1],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(w2_ref[0] * scale, transform_ref[2],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    )                                                  # [128, 1024]
    power = spec[:, :SIN_OFFSET] ** 2 + spec[:, SIN_OFFSET:] ** 2   # [128, 512]
    mels = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = jnp.log(jnp.maximum(mels, cfg.mel_floor))


@functools.partial(jax.jit, static_argnums=(0, 4))
def pallas_log_mel(cfg: FrontendConfig, transform: jax.Array, mel: jax.Array,
                   waveform: jax.Array, interpret: bool = False) -> jax.Array:
    """Unnormalised log-mel ``[B, num_frames, num_mel_bins]`` for a padded
    waveform batch ``[B, N]`` (frames as in ``frames_for_samples``)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if cfg.frame_length != 400 or cfg.hop_length != 160:
        raise ValueError("pallas kernel assumes the w2v-bert 25ms/10ms framing")
    b, n = waveform.shape
    num_frames = fe.frames_for_samples(cfg, n)
    t_pad = ((num_frames + FRAMES_PER_TILE - 1) // FRAMES_PER_TILE
             * FRAMES_PER_TILE)
    rows = t_pad + 3
    n_pad = rows * cfg.hop_length
    if n_pad > n:
        waveform = jnp.pad(waveform, ((0, 0), (0, n_pad - n)))
    else:
        waveform = waveform[:, :n_pad]
    wave_rows = waveform.reshape(b, rows, cfg.hop_length)
    # three row-shifted views: tile t of view r covers hop-rows t·128+r …
    # (Mosaic cannot slice tiled memrefs at sublane offsets +1/+2, so the shift
    # happens here in XLA; the copies are small — 3 × samples)
    w0 = wave_rows[:, 0:t_pad]
    w1 = wave_rows[:, 1:t_pad + 1]
    w2 = wave_rows[:, 2:t_pad + 2]

    grid = (b, t_pad // FRAMES_PER_TILE)
    tile_spec = pl.BlockSpec((1, FRAMES_PER_TILE, cfg.hop_length),
                             lambda bi, ti: (bi, ti, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, cfg),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, MEL_COLS), jnp.float32),
        grid=grid,
        in_specs=[
            tile_spec, tile_spec, tile_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAMES_PER_TILE, MEL_COLS),
            lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(w0, w1, w2, transform, mel)
    return out[:, :num_frames, : cfg.num_mel_bins]


def _fused_kernel(cfg: FrontendConfig, nt: int, w0_ref, w1_ref, w2_ref,
                  transform_ref, mel_ref, nvalid_ref, out_ref, lm_scr):
    """Whole-clip kernel: log-mel tiles into VMEM scratch, then the masked
    per-utterance per-bin normalisation (mean / ddof-1 std over valid frames)
    in the same kernel — the intermediate never round-trips through HBM."""
    scale = jnp.float32(2.0 ** 15)
    for ti in range(nt):                     # static unroll over frame tiles
        rows = slice(ti * FRAMES_PER_TILE, (ti + 1) * FRAMES_PER_TILE)
        spec = (
            jnp.dot(w0_ref[0, rows] * scale, transform_ref[0],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(w1_ref[0, rows] * scale, transform_ref[1],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(w2_ref[0, rows] * scale, transform_ref[2],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        )
        power = spec[:, :SIN_OFFSET] ** 2 + spec[:, SIN_OFFSET:] ** 2
        mels = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        lm_scr[rows] = jnp.log(jnp.maximum(mels, cfg.mel_floor))

    valid = nvalid_ref[pl.program_id(0)]
    t_pad = nt * FRAMES_PER_TILE
    fmask = (jax.lax.broadcasted_iota(jnp.int32, (t_pad, MEL_COLS), 0)
             < valid).astype(jnp.float32)
    lm = lm_scr[:]
    if cfg.per_bin_normalize:
        count = jnp.maximum(valid.astype(jnp.float32), 1.0)
        mean = jnp.sum(lm * fmask, axis=0, keepdims=True) / count
        centred = (lm - mean) * fmask
        var = (jnp.sum(centred * centred, axis=0, keepdims=True)
               / jnp.maximum(count - 1.0, 1.0))
        out_ref[0] = centred * jax.lax.rsqrt(var + 1e-7)
    else:
        out_ref[0] = lm * fmask


@functools.partial(jax.jit, static_argnums=(0, 5))
def pallas_log_mel_fused(cfg: FrontendConfig, transform: jax.Array,
                         mel: jax.Array, waveform: jax.Array,
                         num_samples: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """Normalised (masked, per-bin) log-mel ``[B, num_frames, MEL_COLS]`` for a
    padded waveform batch — framing, DFT, mel, log and normalisation in one
    kernel pass per clip. Stacking stays in XLA (it fuses into the consumer)."""
    from jax.experimental.pallas import tpu as pltpu

    if cfg.frame_length != 400 or cfg.hop_length != 160:
        raise ValueError("pallas kernel assumes the w2v-bert 25ms/10ms framing")
    b, n = waveform.shape
    num_frames = fe.frames_for_samples(cfg, n)
    t_pad = ((num_frames + FRAMES_PER_TILE - 1) // FRAMES_PER_TILE
             * FRAMES_PER_TILE)
    nt = t_pad // FRAMES_PER_TILE
    rows = t_pad + 3
    n_pad = rows * cfg.hop_length
    if n_pad > n:
        waveform = jnp.pad(waveform, ((0, 0), (0, n_pad - n)))
    else:
        waveform = waveform[:, :n_pad]
    wave_rows = waveform.reshape(b, rows, cfg.hop_length)
    w0 = wave_rows[:, 0:t_pad]
    w1 = wave_rows[:, 1:t_pad + 1]
    w2 = wave_rows[:, 2:t_pad + 2]
    nvalid = fe.num_valid_frames(cfg, num_samples).astype(jnp.int32)

    clip_spec = pl.BlockSpec((1, t_pad, cfg.hop_length),
                             lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, cfg, nt),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, MEL_COLS), jnp.float32),
        grid=(b,),
        in_specs=[
            clip_spec, clip_spec, clip_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, t_pad, MEL_COLS), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t_pad, MEL_COLS), jnp.float32)],
        interpret=interpret,
    )(w0, w1, w2, transform, mel, nvalid)
    return out[:, :num_frames]


def _fused_fits_vmem(cfg: FrontendConfig, t_pad: int) -> bool:
    """The whole-clip fused kernel holds 3 input views (double-buffered), the
    output (double-buffered), the log-mel scratch and the packed transforms in
    VMEM at once — ~18.7 MB at the 30 s bucket (t_pad=3072), past the ~16 MB
    limit. Estimate and gate; beyond it the tiled kernel (+XLA normalisation)
    runs at any length."""
    per_frame = (3 * cfg.hop_length * 4 * 2      # w0/w1/w2, pipelined
                 + MEL_COLS * 4 * 2              # output, pipelined
                 + MEL_COLS * 4)                 # lm scratch
    fixed = (3 * cfg.hop_length * PACK_WIDTH + MEL_ROWS * MEL_COLS) * 4
    return t_pad * per_frame + fixed <= 14 * 2 ** 20


class PallasLogMelFrontend(fe.LogMelFrontend):
    """Drop-in LogMelFrontend with the framing+DFT+mel(+normalisation) stages
    fused in Pallas. ``fused=True`` (default) runs one whole-clip kernel that
    also normalises in VMEM where the clip fits the VMEM budget (clips up to
    ~20 s), the tiled log-mel kernel with normalisation in XLA otherwise;
    ``fused=False`` always takes the tiled path."""

    def __init__(self, cfg: FrontendConfig = None, interpret: bool = False,
                 fused: bool = True):
        super().__init__(cfg)
        # host numpy for the same reason as LogMelFrontend.__init__: these
        # lower as closed-over constants inside the training jits, and a
        # device-resident constant forces a blocking d2h during lowering
        self._packed_transform = np.asarray(packed_transform(self.cfg))
        self._packed_mel = np.asarray(packed_mel(self.cfg))
        self._interpret = interpret
        self._fused = fused

    def __call__(self, waveform: jax.Array, num_samples: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        num_frames = fe.frames_for_samples(self.cfg, waveform.shape[1])
        t_pad = ((num_frames + FRAMES_PER_TILE - 1) // FRAMES_PER_TILE
                 * FRAMES_PER_TILE)
        if self._fused and _fused_fits_vmem(self.cfg, t_pad):
            return _pallas_frontend_fused_impl(
                self.cfg, self._packed_transform, self._packed_mel,
                waveform, num_samples, self._interpret)
        return _pallas_frontend_impl(
            self.cfg, self._packed_transform, self._packed_mel,
            waveform, num_samples, self._interpret)


@functools.partial(jax.jit, static_argnums=(0, 5))
def _pallas_frontend_impl(cfg: FrontendConfig, transform, mel, waveform,
                          num_samples, interpret):
    # pallas_log_mel returns exactly frames_for_samples(cfg, n) frames (already
    # a stride multiple); normalisation/stacking is shared with the jnp oracle
    logmel = pallas_log_mel(cfg, transform, mel, waveform, interpret)
    return fe.normalize_and_stack(cfg, logmel, num_samples)


@functools.partial(jax.jit, static_argnums=(0, 5))
def _pallas_frontend_fused_impl(cfg: FrontendConfig, transform, mel, waveform,
                                num_samples, interpret):
    norm = pallas_log_mel_fused(cfg, transform, mel, waveform, num_samples,
                                interpret)
    b, num_frames, _ = norm.shape
    t2 = num_frames // cfg.stride
    # stride-stacking (cheap — fuses into the consumer): feature row t2 is the
    # concat of the stride frames' first num_mel_bins lanes
    r = norm.reshape(b, t2, cfg.stride * MEL_COLS)
    features = jnp.concatenate(
        [r[:, :, i * MEL_COLS:i * MEL_COLS + cfg.num_mel_bins]
         for i in range(cfg.stride)], axis=-1)
    valid = fe.num_valid_frames(cfg, num_samples)
    frame_mask = (jnp.arange(num_frames)[None, :] < valid[:, None])
    mask = frame_mask.reshape(b, t2, cfg.stride)[:, :, cfg.stride - 1].astype(
        jnp.int32)
    return features, mask
