"""RoBERTa/XLM-R-style bidirectional text encoder in Flax.

Covers both text encoders used by the reference (SURVEY.md §2 "Pretrained
encoders"): ``sentence-transformers/paraphrase-multilingual-mpnet-base-v2`` (XLM-R
base geometry, 12×768) and ``sentence-transformers/all-roberta-large-v1`` (24×1024).
The reference loads them via ``AutoModel.from_pretrained`` (model.py:151,
trainer_unfreeze.py:342); here the architecture is implemented natively in JAX and
pretrained weights are brought over with ``models/convert.py``.

Semantics matched to the HF torch implementation:
  * position ids are ``cumsum(mask) * mask + pad_token_id`` (RoBERTa offset scheme),
  * post-LayerNorm blocks, erf-GELU FFN, additive -inf-style attention mask,
  * LayerNorm eps 1e-5.

TPU-first choices: the frozen bottom of the stack can run as one ``nn.scan``
(``cfg.scan_bottom`` — traces/compiles once for the whole prefix) with the
unfrozen top layers unrolled so XLA can pipeline and fuse them; optional
per-block rematerialisation, bf16 compute with f32 params and f32 softmax.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from speech_transcript_embeddings_tpu.config import TextEncoderConfig

NEG_INF = jnp.finfo(jnp.float32).min


def roberta_position_ids(input_ids: jax.Array, pad_token_id: int) -> jax.Array:
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_token_id


class TextEmbeddings(nn.Module):
    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, *, deterministic: bool = True):
        c = self.cfg
        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos_ids = roberta_position_ids(input_ids, c.pad_token_id)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size, dtype=self.dtype,
                       name="position_embeddings")(pos_ids)
        tok = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=self.dtype,
                       name="token_type_embeddings")(jnp.zeros_like(input_ids))
        x = word + pos + tok
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="norm")(x)
        return nn.Dropout(c.hidden_dropout, deterministic=deterministic)(x)


class TextSelfAttention(nn.Module):
    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array], *,
                 deterministic: bool = True):
        c = self.cfg
        h, nh, hd = c.hidden_size, c.num_heads, c.head_dim

        def split(t):
            return t.reshape(*t.shape[:-1], nh, hd)

        q = split(nn.Dense(h, dtype=self.dtype, name="query")(x))
        k = split(nn.Dense(h, dtype=self.dtype, name="key")(x))
        v = split(nn.Dense(h, dtype=self.dtype, name="value")(x))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)
        if mask is not None:
            scores = scores + (1.0 - mask[:, None, None, :].astype(scores.dtype)) * NEG_INF
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
        probs = nn.Dropout(c.attention_dropout, deterministic=deterministic)(probs)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(x.shape)
        out = nn.Dense(h, dtype=self.dtype, name="out")(ctx)
        out = nn.Dropout(c.hidden_dropout, deterministic=deterministic)(out)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="norm")(x + out)


class TextLayer(nn.Module):
    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array],
                 deterministic: bool = True):
        c = self.cfg
        x = TextSelfAttention(c, self.dtype, name="attention")(
            x, mask, deterministic=deterministic)
        y = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(y)
        y = nn.Dropout(c.hidden_dropout, deterministic=deterministic)(y)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="norm")(x + y)


class TextEncoder(nn.Module):
    """Returns the final hidden states ``[B, T, H]``."""

    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None, *,
                 deterministic: bool = True) -> jax.Array:
        c = self.cfg
        x = TextEmbeddings(c, self.dtype, name="embeddings")(
            input_ids, deterministic=deterministic)
        layer_cls = nn.remat(TextLayer, static_argnums=(3,)) if self.remat else TextLayer
        if c.scan_bottom:
            from speech_transcript_embeddings_tpu.models.audio_encoder import (
                scan_block_stack,
            )
            if not 0 < c.scan_bottom <= c.num_layers:
                raise ValueError(f"scan_bottom {c.scan_bottom} out of range")
            x = scan_block_stack(layer_cls, c, self.dtype, c.scan_bottom,
                                 name="bottom_stack")(
                x, attention_mask, deterministic)
        for i in range(c.scan_bottom, c.num_layers):
            x = layer_cls(c, self.dtype, name=f"layer_{i}")(
                x, attention_mask, deterministic)
        return x
