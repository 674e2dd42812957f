"""speech_transcript_embeddings_tpu — a TPU-native speech↔transcript dual-encoder framework.

A from-scratch JAX/Flax/pjit/Pallas framework with the capabilities of the reference
project ``yuriyvnv/speech_transcript_embeddings`` (PyTorch, single-GPU): a dual-encoder
embedding model (w2v-bert-2.0-style conformer speech encoder + RoBERTa/XLM-R-style text
encoder) with projection heads, cross-modal attention, attentive pooling and word-level
alignment, trained contrastively on speech/transcript pairs with corrupted-transcript
hard negatives, partial encoder unfreezing with discriminative learning rates, and
batched embedding + cosine-similarity inference.

Everything here is designed TPU-first:
  * compute path is pure JAX/XLA (static shapes, ``lax`` control flow, bf16 matmuls),
  * the audio log-mel frontend runs on-device (jnp reference + fused Pallas kernel),
  * scaling is expressed as ``jax.sharding`` over a device Mesh (data/model axes) with
    XLA collectives — in-batch negatives are all-gathered over ICI,
  * checkpoints are Orbax with explicit JSON metadata (no state-dict key sniffing).
"""

__version__ = "0.1.0"

from speech_transcript_embeddings_tpu import config as config  # noqa: F401
