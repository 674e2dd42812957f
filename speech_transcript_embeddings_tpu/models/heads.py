"""Projection / pooling / fusion heads of the dual-encoder model.

Behavioral parity targets in the reference (implemented here from scratch in Flax):
  * ``EnhancedProjection``    — reference model.py:13-44, trainer_unfreeze.py:66-99
  * ``CrossModalAttention``   — reference model.py:47-100, trainer_unfreeze.py:102-168
  * ``AttentivePooling``      — reference model.py:103-130, trainer_unfreeze.py:171-211
  * ``WordLevelAlignment``    — reference trainer_unfreeze.py:214-310

All masks use the convention 1 = keep, 0 = pad. Masked logits are filled with -1e9
before softmax (same constant as the reference) so the softmax output matches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9


class EnhancedProjection(nn.Module):
    """2-layer MLP into the shared space: Dense → act → Dropout → Dense → LayerNorm."""

    projection_dim: int
    hidden_dim: Optional[int] = None
    dropout: float = 0.1
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        hidden = self.hidden_dim or 2 * self.projection_dim
        # exact (erf) gelu, matching torch.nn.GELU's default
        act = {"gelu": lambda x: nn.gelu(x, approximate=False),
               "relu": nn.relu}[self.activation]
        x = nn.Dense(hidden, dtype=self.dtype, name="dense_in")(x)
        x = act(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.projection_dim, dtype=self.dtype, name="dense_out")(x)
        # torch LayerNorm default eps
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class CrossModalAttention(nn.Module):
    """Multi-head attention of a pooled query over the other modality's sequence.

    q from ``x`` [B, Tq, D]; k/v from ``context`` [B, Tk, D]; ``mask`` [B, Tk]
    (1 = keep). scale = head_dim**-0.5; dropout on attention probabilities.
    """

    num_heads: int = 8
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array,
                 mask: Optional[jax.Array] = None, *,
                 deterministic: bool = True) -> jax.Array:
        d = x.shape[-1]
        if d % self.num_heads:
            raise ValueError(f"dim {d} not divisible by {self.num_heads} heads")
        head_dim = d // self.num_heads

        def split(h):
            return h.reshape(*h.shape[:-1], self.num_heads, head_dim)

        q = split(nn.Dense(d, dtype=self.dtype, name="query")(x))
        k = split(nn.Dense(d, dtype=self.dtype, name="key")(context))
        v = split(nn.Dense(d, dtype=self.dtype, name="value")(context))

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (head_dim ** -0.5)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :] == 0, NEG_INF, scores)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(*x.shape[:-1], d)
        return nn.Dense(d, dtype=self.dtype, name="out")(out)


class AttentivePooling(nn.Module):
    """Learned softmax pooling over time: Dense(h/2) → tanh → Dense(1) → softmax."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        h = hidden.shape[-1]
        s = nn.Dense(h // 2, dtype=self.dtype, name="score_in")(hidden)
        s = jnp.tanh(s)
        s = nn.Dense(1, dtype=self.dtype, name="score_out")(s)[..., 0]  # [B, T]
        if mask is not None:
            s = jnp.where(mask == 0, NEG_INF, s)
        w = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(hidden.dtype)
        return jnp.einsum("bt,bth->bh", w, hidden)


class WordLevelAlignment(nn.Module):
    """Soft alignment of text tokens onto audio frames.

    Text tokens (queries) attend to audio frames (keys/values) in a shared
    ``alignment_dim`` space via standard multi-head attention; the attended
    representation is residually combined and layer-normed, then a small MLP scores
    each token's alignment confidence. Returns (aligned [B,Tt,D], scores [B,Tt],
    alignment matrix [B,Tt,Ta] averaged over heads).

    Dimension fix vs the reference (SURVEY.md §2): the reference's residual adds the
    *raw* text hidden states, which only typechecks when text_hidden == alignment_dim
    (trainer_unfreeze.py:298-300). We use the raw-hidden residual in that case (exact
    parity) and the projected text representation otherwise.
    """

    alignment_dim: int
    num_heads: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_hidden: jax.Array, audio_hidden: jax.Array,
                 text_mask: Optional[jax.Array] = None,
                 audio_mask: Optional[jax.Array] = None, *,
                 deterministic: bool = True
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        d = self.alignment_dim
        head_dim = d // self.num_heads
        text_proj = nn.Dense(d, dtype=self.dtype, name="text_proj")(text_hidden)
        audio_proj = nn.Dense(d, dtype=self.dtype, name="audio_proj")(audio_hidden)

        # torch.nn.MultiheadAttention-equivalent attention (q=text, k=v=audio):
        # in-projections, per-head scaled dot product with key padding mask,
        # dropout on probs, out-projection.
        def split(h):
            return h.reshape(*h.shape[:-1], self.num_heads, head_dim)

        q = split(nn.Dense(d, dtype=self.dtype, name="attn_q")(text_proj))
        k = split(nn.Dense(d, dtype=self.dtype, name="attn_k")(audio_proj))
        v = split(nn.Dense(d, dtype=self.dtype, name="attn_v")(audio_proj))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (head_dim ** 0.5)
        if audio_mask is not None:
            # -1e9, not -inf: a clip short enough to have zero valid audio
            # frames would make every row all--inf → softmax NaN → poisoned run
            scores = jnp.where(audio_mask[:, None, None, :] == 0, NEG_INF, scores)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
        attended = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        attended = attended.reshape(*text_proj.shape)
        attended = nn.Dense(d, dtype=self.dtype, name="attn_out")(attended)
        alignment_matrix = jnp.mean(probs, axis=1)  # [B, Tt, Ta]

        residual = text_hidden if text_hidden.shape[-1] == d else text_proj
        out = nn.Dense(d, dtype=self.dtype, name="output_proj")(attended)
        aligned = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(residual + out)

        conf = nn.Dense(d // 2, dtype=self.dtype, name="confidence_in")(aligned)
        conf = nn.relu(conf)
        scores_tok = nn.Dense(1, dtype=self.dtype, name="confidence_out")(conf)[..., 0]
        if text_mask is not None:
            scores_tok = scores_tok * text_mask.astype(scores_tok.dtype)
        return aligned, scores_tok, alignment_matrix
