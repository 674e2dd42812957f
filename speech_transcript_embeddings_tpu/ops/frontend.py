"""TPU-native log-mel audio frontend (w2v-bert-2.0 / SeamlessM4T numerics).

Replaces the reference's CPU-side ``transformers.AutoFeatureExtractor`` call
(reference processor.py:101-105, trainer_unfreeze.py:856-866), which runs a per-frame
Python loop over NumPy FFTs in DataLoader worker processes. Here the whole frontend is
a batched, statically-shaped JAX function that runs on the TPU itself.

Design: the per-frame chain *remove-DC → preemphasis → Povey window → rFFT(512)* is a
single linear map of the 400-sample frame, so we fold it into one precomputed
``[400, 514]`` matrix (cos|sin halves) and compute the power spectrum as two MXU
matmuls — a GEMM-native DFT. The mel projection is a third matmul. This keeps the
whole frontend on the MXU with zero scalar loops (cf. PAPERS.md "MelT: GEMM-Native
NDFT"). Numerics match ``SeamlessM4TFeatureExtractor`` (kaldi-scale mel filters on a
2^15-scaled waveform, mel floor 2^-23, natural log, per-utterance per-bin
normalisation with ddof=1, stride-2 frame stacking with mask taken at odd indices).

An optional fused Pallas kernel for the framing+DFT+mel stage lives in
``frontend_pallas.py``; this module is the reference implementation and test oracle.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speech_transcript_embeddings_tpu.config import FrontendConfig


def _hertz_to_mel_kaldi(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def make_mel_filters(cfg: FrontendConfig) -> np.ndarray:
    """Kaldi-scale triangular mel filter bank, triangularised in mel space.

    Matches ``transformers.audio_utils.mel_filter_bank(num_frequency_bins=257,
    num_mel_filters=80, min_frequency=20, max_frequency=8000, norm=None,
    mel_scale='kaldi', triangularize_in_mel_space=True)``.
    Returns ``[fft_length // 2 + 1, num_mel_bins]`` float64.
    """
    num_freq = cfg.fft_length // 2 + 1
    mel_min = _hertz_to_mel_kaldi(cfg.min_frequency)
    mel_max = _hertz_to_mel_kaldi(cfg.max_frequency)
    filter_freqs = np.linspace(mel_min, mel_max, cfg.num_mel_bins + 2)
    fft_bin_width = cfg.sampling_rate / ((num_freq - 1) * 2)
    fft_freqs = _hertz_to_mel_kaldi(fft_bin_width * np.arange(num_freq))

    filter_diff = np.diff(filter_freqs)
    slopes = filter_freqs[None, :] - fft_freqs[:, None]
    down_slopes = -slopes[:, :-2] / filter_diff[:-1]
    up_slopes = slopes[:, 2:] / filter_diff[1:]
    return np.maximum(0.0, np.minimum(down_slopes, up_slopes))


def make_frame_transform(cfg: FrontendConfig) -> np.ndarray:
    """Fold remove-DC, preemphasis, Povey window and the real DFT into one matrix.

    For a frame ``x`` of ``frame_length`` samples the HF extractor computes
    ``rfft(window * preemph(remove_dc(x)), fft_length)``; every step is linear in
    ``x``, so the cos and sin parts of the DFT are ``x @ A_cos`` / ``x @ A_sin``.
    Returns ``[frame_length, 2 * (fft_length // 2 + 1)]`` float64 (cos ‖ sin halves).
    """
    n, f = cfg.frame_length, cfg.fft_length
    num_freq = f // 2 + 1
    # remove DC offset: x - mean(x)
    dc = np.eye(n) - np.full((n, n), 1.0 / n)
    # preemphasis: y[0] = (1-p) x[0]; y[j] = x[j] - p x[j-1]
    p = cfg.preemphasis
    pre = np.eye(n)
    pre[0, 0] = 1.0 - p
    for j in range(1, n):
        pre[j - 1, j] = -p
    # Povey window: hann(n)^0.85, symmetric
    window = np.hanning(n) ** 0.85
    # real DFT of the zero-padded frame: bins k = 0..f/2
    t = np.arange(n)[:, None]
    k = np.arange(num_freq)[None, :]
    ang = 2.0 * np.pi * t * k / f
    dft_cos = np.cos(ang)
    dft_sin = -np.sin(ang)
    lin = dc @ pre @ np.diag(window)
    return np.concatenate([lin @ dft_cos, lin @ dft_sin], axis=1)


def num_valid_frames(cfg: FrontendConfig, num_samples):
    """Frames fully contained in the first ``num_samples`` samples (center=False)."""
    return jnp.where(
        num_samples >= cfg.frame_length,
        1 + (num_samples - cfg.frame_length) // cfg.hop_length,
        0,
    )


def frames_for_samples(cfg: FrontendConfig, num_samples: int) -> int:
    """Static frame count for a padded waveform of ``num_samples`` samples,
    rounded up to a multiple of ``stride`` (HF pad_to_multiple_of=2)."""
    if num_samples < cfg.frame_length:
        raise ValueError(f"audio bucket {num_samples} shorter than one frame")
    t = 1 + (num_samples - cfg.frame_length) // cfg.hop_length
    return ((t + cfg.stride - 1) // cfg.stride) * cfg.stride


class LogMelFrontend:
    """Batched, jittable log-mel feature extractor with static shapes.

    Call with a zero-padded waveform batch ``[B, N]`` (float32, values in [-1, 1])
    and per-row valid sample counts ``[B]``; returns stacked features
    ``[B, T, num_mel_bins * stride]`` and an attention mask ``[B, T]``, matching the
    HF extractor's output for each row up to float32 precision.
    """

    def __init__(self, cfg: Optional[FrontendConfig] = None):
        self.cfg = cfg or FrontendConfig()
        # HOST numpy, deliberately: every training/eval/embed jit closes over
        # the frontend, so these matrices lower as inline constants. A
        # device-resident jnp constant makes MLIR lowering fetch its value
        # back (jax _array_mlir_constant_handler → Array._value, a blocking
        # d2h) — observed to stall for minutes on the axon relay. Host arrays
        # embed directly with no device round-trip and produce the same HLO.
        self._transform = np.asarray(make_frame_transform(self.cfg), np.float32)
        self._mel = np.asarray(make_mel_filters(self.cfg), np.float32)

    def __call__(self, waveform: jax.Array, num_samples: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        return _frontend_impl(self.cfg, self._transform, self._mel,
                              waveform, num_samples)


@functools.partial(jax.jit, static_argnums=0)
def _frontend_impl(cfg: FrontendConfig, transform: jax.Array, mel: jax.Array,
                   waveform: jax.Array, num_samples: jax.Array):
    if waveform.ndim != 2:
        raise ValueError(f"expected [B, N] waveform, got {waveform.shape}")
    b, n = waveform.shape
    num_frames = frames_for_samples(cfg, n)
    num_freq = cfg.fft_length // 2 + 1

    logmel = _log_mel_spectrogram(cfg, transform, mel, waveform, num_frames, num_freq)
    return normalize_and_stack(cfg, logmel, num_samples)


def normalize_and_stack(cfg: FrontendConfig, logmel: jax.Array,
                        num_samples: jax.Array):
    """Masked per-utterance, per-mel-bin normalisation (ddof=1, padding → 0.0)
    followed by stride-frame stacking; the mask is subsampled at the last index
    of each stride group (HF: indices % stride == stride-1). Shared by the jnp
    and Pallas frontends."""
    b, num_frames, _ = logmel.shape
    valid = num_valid_frames(cfg, num_samples)  # [B]
    frame_idx = jnp.arange(num_frames)[None, :]
    frame_mask = (frame_idx < valid[:, None])
    if cfg.per_bin_normalize:
        fmask = frame_mask[..., None].astype(jnp.float32)
        count = jnp.maximum(valid.astype(jnp.float32), 1.0)[:, None, None]
        mean = jnp.sum(logmel * fmask, axis=1, keepdims=True) / count
        centred = (logmel - mean) * fmask
        var = jnp.sum(centred * centred, axis=1, keepdims=True) / jnp.maximum(count - 1.0, 1.0)
        logmel = centred * jax.lax.rsqrt(var + 1e-7)
    else:
        logmel = logmel * frame_mask[..., None]

    t2 = num_frames // cfg.stride
    features = logmel.reshape(b, t2, cfg.num_mel_bins * cfg.stride)
    mask = frame_mask.reshape(b, t2, cfg.stride)[:, :, cfg.stride - 1].astype(jnp.int32)
    return features, mask


def _log_mel_spectrogram(cfg, transform, mel, waveform, num_frames, num_freq):
    """framing → fused linear DFT (2 matmuls) → power → mel matmul → ln."""
    scaled = waveform * jnp.float32(2.0 ** 15)  # Kaldi 16-bit compliance
    # frame gather: [B, T, frame_length]
    idx = (jnp.arange(num_frames)[:, None] * cfg.hop_length
           + jnp.arange(cfg.frame_length)[None, :])
    idx = jnp.minimum(idx, waveform.shape[1] - 1)  # trailing frames read padding
    frames = scaled[:, idx]
    # GEMM-native DFT: power[k] = (x·A_cos[k])² + (x·A_sin[k])²
    spec = jnp.einsum("btn,nk->btk", frames, transform,
                      precision=jax.lax.Precision.HIGHEST)
    power = spec[..., :num_freq] ** 2 + spec[..., num_freq:] ** 2
    melspec = jnp.einsum("btk,km->btm", power, mel,
                         precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.maximum(melspec, cfg.mel_floor))
