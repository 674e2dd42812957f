"""The dual-encoder speech↔transcript embedding model.

Unifies the reference's two divergent model classes (inference model.py:133-328 vs
training trainer_unfreeze.py:315-697 — see SURVEY.md §2 "model divergence") into one
module that always uses the trainer's *corrected* cross-modal formulation: sequence
hidden states are mapped into projection space by dedicated linears before
cross-attention (trainer_unfreeze.py:451-458, 652-653), so any combination of
encoder hidden sizes and projection dim typechecks.

Public methods (mirroring the reference API):
  * ``encode_text(input_ids, mask)``        → (projected [B,D], hidden [B,T,H])
  * ``encode_audio(features, mask)``        → (projected [B,D], hidden [B,T,H])
  * ``forward_pair(batch)``                 → (text_emb, audio_emb)   [inference]
  * ``forward_pos_neg(batch)``              → PosNegOutput            [training]

TPU-first notes: positive and corrupted transcripts are encoded in one batched text
encoder call (2B rows — one big MXU matmul instead of two), and the two cross-modal
fusions share one batched attention call. Embeddings are L2-normalised in f32.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from speech_transcript_embeddings_tpu.config import ModelConfig
from speech_transcript_embeddings_tpu.models.audio_encoder import AudioEncoder
from speech_transcript_embeddings_tpu.models.heads import (
    AttentivePooling,
    CrossModalAttention,
    EnhancedProjection,
    WordLevelAlignment,
)
from speech_transcript_embeddings_tpu.models.text_encoder import TextEncoder


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    # rsqrt(sum+eps) instead of /max(norm, eps): same values at unit scale, but
    # the gradient at an exactly-zero vector is 0 instead of NaN (norm's
    # backward divides by itself)
    x = x.astype(jnp.float32)
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


class PosNegOutput(NamedTuple):
    text_pos: jax.Array          # [B, D] normalised
    text_neg: jax.Array          # [B, D] normalised
    audio: jax.Array             # [B, D] normalised
    alignment_scores: Optional[jax.Array]   # [B, T_text] or None
    alignment_matrix: Optional[jax.Array]   # [B, T_text, T_audio] or None


class DualEncoderModel(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        heads = c.heads
        self.text_encoder = TextEncoder(c.text, dtype=dtype, remat=c.remat)
        self.audio_encoder = AudioEncoder(c.audio, dtype=dtype, remat=c.remat)
        self.text_projection = EnhancedProjection(
            projection_dim=heads.projection_dim,
            hidden_dim=heads.projection_hidden_dim, dropout=heads.dropout,
            activation=heads.activation)
        self.audio_projection = EnhancedProjection(
            projection_dim=heads.projection_dim,
            hidden_dim=heads.projection_hidden_dim, dropout=heads.dropout,
            activation=heads.activation)
        if heads.use_attentive_pooling:
            self.text_pooling = AttentivePooling()
            self.audio_pooling = AttentivePooling()
        if heads.use_cross_modal:
            self.text_seq_to_projection = nn.Dense(heads.projection_dim)
            self.audio_seq_to_projection = nn.Dense(heads.projection_dim)
            self.text_to_audio_attention = CrossModalAttention(
                num_heads=heads.cross_modal_heads, dropout=heads.dropout)
            self.audio_to_text_attention = CrossModalAttention(
                num_heads=heads.cross_modal_heads, dropout=heads.dropout)
            self.text_fusion = nn.Dense(heads.projection_dim)
            self.text_fusion_norm = nn.LayerNorm(epsilon=1e-5)
            self.audio_fusion = nn.Dense(heads.projection_dim)
            self.audio_fusion_norm = nn.LayerNorm(epsilon=1e-5)
        if heads.use_word_alignment:
            self.word_level_alignment = WordLevelAlignment(
                alignment_dim=heads.projection_dim,
                num_heads=heads.alignment_heads, dropout=heads.dropout)

    # ---- encoding ------------------------------------------------------------

    def encode_text(self, input_ids, attention_mask=None, *, deterministic=True):
        hidden = self.text_encoder(input_ids, attention_mask,
                                   deterministic=deterministic)
        if self.cfg.heads.use_attentive_pooling:
            pooled = self.text_pooling(hidden, attention_mask)
        else:
            pooled = hidden[:, 0, :]   # CLS token
        projected = self.text_projection(pooled, deterministic=deterministic)
        return projected, hidden

    def encode_audio(self, features, attention_mask=None, *, deterministic=True):
        hidden = self.audio_encoder(features, attention_mask,
                                    deterministic=deterministic)
        if self.cfg.heads.use_attentive_pooling:
            pooled = self.audio_pooling(hidden, attention_mask)
        elif attention_mask is not None:
            m = attention_mask[..., None].astype(hidden.dtype)
            pooled = (hidden * m).sum(1) / jnp.maximum(m.sum(1), 1e-9)
        else:
            pooled = hidden.mean(axis=1)
        projected = self.audio_projection(pooled, deterministic=deterministic)
        return projected, hidden

    # ---- cross-modal fusion --------------------------------------------------

    def apply_cross_modal(self, text_projected, text_hidden, text_mask,
                          audio_projected, audio_hidden, audio_mask, *,
                          deterministic=True):
        """Fuse pooled projections with attention over the other modality's
        sequence (in projection space)."""
        if not self.cfg.heads.use_cross_modal:
            return text_projected, audio_projected
        audio_seq = self.audio_seq_to_projection(audio_hidden)
        text_seq = self.text_seq_to_projection(text_hidden)
        text_attended = self.text_to_audio_attention(
            text_projected[:, None, :], audio_seq, audio_mask,
            deterministic=deterministic)[:, 0, :]
        audio_attended = self.audio_to_text_attention(
            audio_projected[:, None, :], text_seq, text_mask,
            deterministic=deterministic)[:, 0, :]
        text_fused = self.text_fusion_norm(self.text_fusion(
            jnp.concatenate([text_projected, text_attended], axis=-1)))
        audio_fused = self.audio_fusion_norm(self.audio_fusion(
            jnp.concatenate([audio_projected, audio_attended], axis=-1)))
        return text_fused, audio_fused

    # ---- forward passes ------------------------------------------------------

    def forward_pair(self, batch, *, deterministic=True):
        """Inference: one transcript per clip → (text_emb, audio_emb), normalised."""
        text_projected, text_hidden = self.encode_text(
            batch["input_ids"], batch["attention_mask"],
            deterministic=deterministic)
        audio_projected, audio_hidden = self.encode_audio(
            batch["input_features"], batch["attention_mask_audio"],
            deterministic=deterministic)
        text_emb, audio_emb = self.apply_cross_modal(
            text_projected, text_hidden, batch["attention_mask"],
            audio_projected, audio_hidden, batch["attention_mask_audio"],
            deterministic=deterministic)
        return l2_normalize(text_emb), l2_normalize(audio_emb)

    def forward_pos_neg(self, batch, *, deterministic=True) -> PosNegOutput:
        """Training/eval: clean + corrupted transcript vs one audio clip.

        Mirrors compute_pos_neg_embeddings (trainer_unfreeze.py:502-565) but encodes
        pos and neg transcripts in a single batched text-encoder call, and runs both
        cross-modal fusions in one batched attention call.
        """
        b = batch["input_ids_pos"].shape[0]
        ids = jnp.concatenate([batch["input_ids_pos"], batch["input_ids_neg"]], 0)
        tmask = jnp.concatenate(
            [batch["attention_mask_pos"], batch["attention_mask_neg"]], 0)
        text_projected, text_hidden = self.encode_text(
            ids, tmask, deterministic=deterministic)
        audio_projected, audio_hidden = self.encode_audio(
            batch["input_features"], batch["attention_mask_audio"],
            deterministic=deterministic)

        if self.cfg.heads.use_cross_modal:
            # pos and neg attend to the same audio: tile audio along batch
            audio_projected2 = jnp.concatenate([audio_projected] * 2, 0)
            audio_hidden2 = jnp.concatenate([audio_hidden] * 2, 0)
            amask2 = jnp.concatenate([batch["attention_mask_audio"]] * 2, 0)
            text_fused, audio_fused2 = self.apply_cross_modal(
                text_projected, text_hidden, tmask,
                audio_projected2, audio_hidden2, amask2,
                deterministic=deterministic)
            text_pos, text_neg = text_fused[:b], text_fused[b:]
            # reference semantics: the audio embedding used downstream is the one
            # fused against the *positive* transcript (trainer_unfreeze.py:525-532)
            audio_out = audio_fused2[:b]
        else:
            text_pos, text_neg = text_projected[:b], text_projected[b:]
            audio_out = audio_projected

        align_scores = align_matrix = None
        if self.cfg.heads.use_word_alignment:
            _, align_scores, align_matrix = self.word_level_alignment(
                text_hidden[:b], audio_hidden,
                batch["attention_mask_pos"], batch["attention_mask_audio"],
                deterministic=deterministic)

        return PosNegOutput(
            text_pos=l2_normalize(text_pos),
            text_neg=l2_normalize(text_neg),
            audio=l2_normalize(audio_out),
            alignment_scores=align_scores,
            alignment_matrix=align_matrix,
        )

    def __call__(self, batch, *, deterministic=True):
        if "input_ids_pos" in batch:
            return self.forward_pos_neg(batch, deterministic=deterministic)
        return self.forward_pair(batch, deterministic=deterministic)


def init_params(model: DualEncoderModel, rng: jax.Array, *,
                batch_size: int = 2, text_len: int = 8, audio_len: int = 6):
    """Initialise parameters with a tiny dummy batch (shapes don't constrain use).

    The init runs as ONE jitted program — eager init of a ~900M-param model
    dispatches thousands of tiny ops, which is pathologically slow through a
    remote-compile TPU tunnel.
    """
    cfg = model.cfg
    dummy = {
        "input_ids_pos": jnp.ones((batch_size, text_len), jnp.int32),
        "attention_mask_pos": jnp.ones((batch_size, text_len), jnp.int32),
        "input_ids_neg": jnp.ones((batch_size, text_len), jnp.int32),
        "attention_mask_neg": jnp.ones((batch_size, text_len), jnp.int32),
        "input_features": jnp.zeros((batch_size, audio_len, cfg.audio.feature_dim),
                                    jnp.float32),
        "attention_mask_audio": jnp.ones((batch_size, audio_len), jnp.int32),
    }
    # scan-wrapped blocks declare a split dropout rng, which flax requires at
    # init even in deterministic mode — provide both streams
    return jax.jit(lambda r: model.init(
        {"params": r, "dropout": jax.random.fold_in(r, 1)}, dummy)["params"])(rng)


def _dummy_batch(cfg, batch_size=2, text_len=8, audio_len=6):
    return {
        "input_ids_pos": jnp.ones((batch_size, text_len), jnp.int32),
        "attention_mask_pos": jnp.ones((batch_size, text_len), jnp.int32),
        "input_ids_neg": jnp.ones((batch_size, text_len), jnp.int32),
        "attention_mask_neg": jnp.ones((batch_size, text_len), jnp.int32),
        "input_features": jnp.zeros((batch_size, audio_len, cfg.audio.feature_dim),
                                    jnp.float32),
        "attention_mask_audio": jnp.ones((batch_size, audio_len), jnp.int32),
    }


def abstract_params(model: DualEncoderModel):
    """Parameter ShapeDtypeStructs without any computation."""
    return jax.eval_shape(
        lambda r: model.init(r, _dummy_batch(model.cfg))["params"],
        jax.random.PRNGKey(0))


def template_params(model: DualEncoderModel):
    """Structurally correct zero params, materialised as one trivial program.

    For compile checks and throughput benchmarks only (dense-op timing is
    data-independent); NOT a usable training init — real runs use
    ``init_params``. Exists because a full random init of ~900M params is a
    large threefry program that is very slow through a remote-compile tunnel.
    """
    shapes = abstract_params(model)
    return jax.jit(
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))()
