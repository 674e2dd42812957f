"""w2v-bert-2.0-style conformer speech encoder in Flax.

The reference loads ``facebook/w2v-bert-2.0`` via ``AutoModel.from_pretrained``
(model.py:152, trainer_unfreeze.py:343). This module implements the same
architecture natively in JAX (transformers' Wav2Vec2BertModel semantics, studied for
behavior only):

  * feature projection: LayerNorm(160) → Dense(→H) → dropout,
  * 24 conformer blocks, each: half-step macaron FFN₁ → self-attention with
    relative_key position bias (learned distance embedding, distances clamped to
    [-left_max, right_max]) → convolution module (LayerNorm → masked fill →
    pointwise conv ×2 + GLU → causal depthwise conv → LayerNorm → swish →
    pointwise conv) → half-step FFN₂ → final LayerNorm,
  * padded positions are zeroed before the block stack and masked additively in
    attention.

TPU-first choices: the depthwise convolution is expressed as a feature-group-count
``lax.conv_general_dilated`` (maps to the VPU/MXU, static left padding instead of a
separate pad op), relative-position bias is one einsum against a ``[Tq, Tk, hd]``
gathered table, softmax in f32, bf16 elsewhere when configured, optional remat per
block.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from speech_transcript_embeddings_tpu.config import AudioEncoderConfig

NEG_INF = jnp.finfo(jnp.float32).min

# remat policies that save named activations (vs 'full' recompute); each
# successive policy saves a superset of the previous one's names
SAVE_POLICIES = ("save_flash", "save_hot", "save_hot2", "save_hot3")


def swish(x):
    return x * jax.nn.sigmoid(x)


def _spec_augment_time(x, masked_embed, attention_mask, cfg, rng):
    """SpecAugment time masking with static shapes.

    Per utterance, samples ``max(round(prob·valid/len), min_masks)`` spans of
    ``mask_time_length`` frames — the span *count* follows the per-utterance
    valid length and span *starts* land inside the valid region, matching HF's
    sampler statistics (``_compute_mask_indices`` draws from the real input
    length, so short clips in long buckets are not over-masked). Shapes stay
    static by drawing ``S_max`` candidate starts and enabling only the first
    ``k(valid)`` of them. Only valid (unpadded) positions are masked.
    """
    b, t, _ = x.shape
    length = cfg.mask_time_length
    if t <= length:
        return x
    s_max = max(int(round(cfg.mask_time_prob * t / length)),
                cfg.mask_time_min_masks)
    if attention_mask is not None:
        valid = jnp.sum(attention_mask > 0, axis=-1)                # [B]
    else:
        valid = jnp.full((b,), t, jnp.int32)
    k = jnp.maximum(
        jnp.round(cfg.mask_time_prob * valid / length).astype(jnp.int32),
        cfg.mask_time_min_masks)                                    # [B]
    u = jax.random.uniform(rng, (b, s_max))
    max_start = jnp.maximum(valid - length, 1).astype(jnp.float32)  # [B]
    starts = jnp.floor(u * max_start[:, None]).astype(jnp.int32)    # [B, S]
    span_on = jnp.arange(s_max)[None, :] < k[:, None]               # [B, S]
    pos = jnp.arange(t)[None, None, :]                              # [1, 1, T]
    in_span = ((pos >= starts[..., None]) & (pos < starts[..., None] + length)
               & span_on[..., None])
    mask = jnp.any(in_span, axis=1)                                 # [B, T]
    if attention_mask is not None:
        mask = mask & (attention_mask > 0)
    return jnp.where(mask[..., None], masked_embed[None, None, :], x)


class AudioFeedForward(nn.Module):
    cfg: AudioEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True):
        c = self.cfg
        x = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        x = swish(x)
        x = nn.Dropout(c.activation_dropout, deterministic=deterministic)(x)
        x = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(x)
        return nn.Dropout(c.hidden_dropout, deterministic=deterministic)(x)


class RelPositionAttention(nn.Module):
    """Self-attention with Shaw-style relative_key position bias.

    scores = (q·kᵀ + q·E[clamp(j-i)]ᵀ) / sqrt(head_dim), where E is a learned
    embedding over distances in [-left_max, right_max].
    """

    cfg: AudioEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array], *,
                 deterministic: bool = True):
        c = self.cfg
        h, nh, hd = c.hidden_size, c.num_heads, c.head_dim
        t = x.shape[1]

        def split(v):
            return v.reshape(*v.shape[:-1], nh, hd)

        q = split(nn.Dense(h, dtype=self.dtype, name="query")(x))
        k = split(nn.Dense(h, dtype=self.dtype, name="key")(x))
        v = split(nn.Dense(h, dtype=self.dtype, name="value")(x))
        if c.remat_policy == "save_hot3":
            # keep the projected q/k/v (+3×[B,T,H]/block): the backward
            # replay skips the three projection matmuls, and the flash
            # kernel's backward consumes the saved tensors directly
            from jax.ad_checkpoint import checkpoint_name
            q = checkpoint_name(q, "attn_q")
            k = checkpoint_name(k, "attn_k")
            v = checkpoint_name(v, "attn_v")

        num_pos = c.left_max_rel_pos + c.right_max_rel_pos + 1
        dist_emb = self.param(
            "distance_embedding", nn.initializers.normal(0.02), (num_pos, hd),
            jnp.float32)

        # fused Pallas path: streams k/v tiles through VMEM with the banded
        # rel bias computed in-tile — no [B,h,T,T] score matrix in HBM. Probs
        # dropout cannot run inside the kernel, so fall back when it is
        # active; sequences past the kernel's verified VMEM envelope (the
        # 30 s bucket) also fall back. NB the kernel requires contiguous
        # prefix masks (frontend frame-validity masks are) — it reduces the
        # mask to one valid length per row; the XLA path honours arbitrary
        # masks.
        from speech_transcript_embeddings_tpu.ops.flash_attention import (
            flash_attention, supports_length,
        )
        if (c.use_flash_attention and supports_length(t)
                and (deterministic or c.attention_dropout == 0)):
            b = x.shape[0]
            fold = lambda a: a.transpose(0, 2, 1, 3).reshape(b * nh, t, hd)
            kv_mask = (mask if mask is not None
                       else jnp.ones((b, t), jnp.float32))
            out = flash_attention(
                fold(q), fold(k), fold(v), dist_emb.astype(q.dtype), kv_mask,
                num_heads=nh, left_max=c.left_max_rel_pos,
                save_residuals=c.remat_policy in SAVE_POLICIES,
                interpret=jax.default_backend() != "tpu")
            out = out.reshape(b, nh, t, hd).transpose(0, 2, 1, 3).reshape(x.shape)
            return nn.Dense(h, dtype=self.dtype, name="out")(out)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        # XLA path: Shaw-style bias via the gathered [Tq, Tk, hd] distance
        # table, exactly as HF computes it. Measured fastest of three XLA
        # formulations on v5e (vs contract-then-gather: 200x slower — scalar
        # gather; vs contract-then-skew pad/reshape: 1.8x slower — relayouts).
        pos = jnp.arange(t)
        distance = jnp.clip(pos[None, :] - pos[:, None],
                            -c.left_max_rel_pos, c.right_max_rel_pos)
        rel = dist_emb[distance + c.left_max_rel_pos].astype(q.dtype)
        scores = (scores + jnp.einsum("bqhd,qkd->bhqk", q, rel)) / (hd ** 0.5)

        if mask is not None:
            scores = scores + (1.0 - mask[:, None, None, :].astype(scores.dtype)) * NEG_INF
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
        probs = nn.Dropout(c.attention_dropout, deterministic=deterministic)(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(x.shape)
        return nn.Dense(h, dtype=self.dtype, name="out")(out)


class ConvModule(nn.Module):
    """Conformer convolution block with causal depthwise conv."""

    cfg: AudioEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array], *,
                 deterministic: bool = True):
        c = self.cfg
        h = c.hidden_size
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="norm")(x)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        # pointwise conv1 (no bias) + GLU over the channel split
        x = nn.Dense(2 * h, use_bias=False, dtype=self.dtype, name="pointwise1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)
        # causal depthwise conv: left-pad kernel-1, feature_group_count = channels
        kernel = self.param(
            "depthwise_kernel", nn.initializers.lecun_normal(),
            (c.conv_kernel_size, 1, h), jnp.float32)
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1,), padding=[(c.conv_kernel_size - 1, 0)],
            dimension_numbers=("NTC", "TIO", "NTC"), feature_group_count=h)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="depthwise_norm")(x)
        x = swish(x)
        x = nn.Dense(h, use_bias=False, dtype=self.dtype, name="pointwise2")(x)
        return nn.Dropout(c.conv_dropout, deterministic=deterministic)(x)


class ConformerBlock(nn.Module):
    cfg: AudioEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array],
                 deterministic: bool = True):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                                       name=name)
        ffn1_out = AudioFeedForward(c, self.dtype, name="ffn1")(
            ln("ffn1_norm")(x), deterministic=deterministic)
        if c.remat_policy in ("save_hot2", "save_hot3"):
            from jax.ad_checkpoint import checkpoint_name
            ffn1_out = checkpoint_name(ffn1_out, "ffn1_out")
        x = x + 0.5 * ffn1_out
        attn = RelPositionAttention(c, self.dtype, name="attention")(
            ln("attention_norm")(x), mask, deterministic=deterministic)
        x = x + nn.Dropout(c.attention_dropout,
                           deterministic=deterministic)(attn)
        conv_out = ConvModule(c, self.dtype, name="conv")(
            x, mask, deterministic=deterministic)
        if c.remat_policy in ("save_hot", "save_hot2", "save_hot3"):
            # tag for save_only_these_names: the replay skips the conv module
            # (GLU + depthwise + pointwise convs) at +[B,T,H]/block residency
            from jax.ad_checkpoint import checkpoint_name
            conv_out = checkpoint_name(conv_out, "conv_out")
        x = x + conv_out
        x = x + 0.5 * AudioFeedForward(c, self.dtype, name="ffn2")(
            ln("ffn2_norm")(x), deterministic=deterministic)
        return ln("final_norm")(x)


class AudioEncoder(nn.Module):
    """Stacked log-mel features ``[B, T, feature_dim]`` → hidden states ``[B, T, H]``."""

    cfg: AudioEncoderConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, features: jax.Array,
                 attention_mask: Optional[jax.Array] = None, *,
                 deterministic: bool = True) -> jax.Array:
        c = self.cfg
        if c.remat_policy not in ("full",) + SAVE_POLICIES:
            # an unrecognized value would otherwise silently degrade to full
            # recompute (only exact policy strings select a policy)
            raise ValueError(
                f"Unknown remat_policy {c.remat_policy!r}; use 'full', "
                "'save_flash', 'save_hot', 'save_hot2' or 'save_hot3'")
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="feature_norm")(features)
        x = nn.Dense(c.hidden_size, dtype=self.dtype, name="feature_projection")(x)
        x = nn.Dropout(c.feat_proj_dropout, deterministic=deterministic)(x)
        if c.apply_spec_augment and c.mask_time_prob > 0:
            masked_embed = self.param(
                "masked_spec_embed",
                nn.initializers.uniform(scale=1.0), (c.hidden_size,), jnp.float32)
            if not deterministic:
                x = _spec_augment_time(
                    x, masked_embed.astype(x.dtype), attention_mask, c,
                    self.make_rng("dropout"))
        if attention_mask is not None:
            x = x * attention_mask[..., None].astype(x.dtype)
        x = nn.Dropout(c.hidden_dropout, deterministic=deterministic)(x)
        if self.remat:
            policy = None
            if c.remat_policy in SAVE_POLICIES:
                names = []
                if c.use_flash_attention:
                    # the flash kernel's (out, lse) — tagged only when the
                    # flash path runs; the XLA attention path has no named
                    # residuals to keep
                    from speech_transcript_embeddings_tpu.ops.flash_attention import (
                        FLASH_SAVE_NAMES,
                    )
                    names += list(FLASH_SAVE_NAMES)
                if c.remat_policy in ("save_hot", "save_hot2"):
                    # also keep the conv module output (r2 measured this WORSE
                    # under f32 frozen storage — HBM copy/spill traffic at
                    # B=64 — retried under the ~1 GB freed by bf16 frozen
                    # storage, FreezeConfig.frozen_dtype). Tagged in
                    # ConformerBlock independent of flash attention.
                    names.append("conv_out")
                if c.remat_policy in ("save_hot2", "save_hot3"):
                    # + the ffn1 output: the replay also skips the first
                    # feed-forward (+[B,T,H]/block) — fits only under the
                    # bf16-frozen + bf16-mu freed-HBM budget
                    names.append("ffn1_out")
                if c.remat_policy == "save_hot3":
                    # + projected q/k/v (+3×[B,T,H]/block): the replay skips
                    # the attention projections and the flash backward reads
                    # the saved tensors
                    names += ["attn_q", "attn_k", "attn_v"]
                if names:
                    policy = jax.checkpoint_policies.save_only_these_names(
                        *names)
            block_cls = nn.remat(ConformerBlock, static_argnums=(3,),
                                 policy=policy)
        else:
            block_cls = ConformerBlock
        if c.scan_bottom:
            if not 0 < c.scan_bottom <= c.num_layers:
                raise ValueError(f"scan_bottom {c.scan_bottom} out of range")
            x = scan_block_stack(block_cls, c, self.dtype, c.scan_bottom,
                                 name="bottom_stack")(
                x, attention_mask, deterministic)
        for i in range(c.scan_bottom, c.num_layers):
            x = block_cls(c, self.dtype, name=f"layer_{i}")(
                x, attention_mask, deterministic)
        return x


def scan_block_stack(block_cls, cfg, dtype, length: int, name: str):
    """A stack of ``length`` homogeneous blocks as one ``nn.scan`` (params
    stacked on a leading layer axis under ``<name>/scan/block``). Traces and
    compiles once for the whole stack instead of per block — designed for the
    frozen bottom of a partially-unfrozen encoder."""

    class _Step(nn.Module):
        deterministic: bool

        @nn.compact
        def __call__(self, x, mask):
            y = block_cls(cfg, dtype, name="block")(x, mask, self.deterministic)
            return y, None

    class _Stack(nn.Module):
        @nn.compact
        def __call__(self, x, mask, deterministic=True):
            scanned = nn.scan(
                _Step,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,       # mask is shared by every layer
                length=length,
            )(deterministic, name="scan")
            y, _ = scanned(x, mask)
            return y

    return _Stack(name=name)
