"""Batched embedding + cosine-similarity inference API.

The TPU replacement for the reference's inference stack (model.py +
processor.py + inference.py:26-163 + cv_inference.py:27-237): one ``Embedder``
that loads a self-describing checkpoint (config from ``metadata.json`` — no
state-dict key sniffing) and exposes:

  * ``embed_pair(text, audio)``   — fused forward, similarity via the full model
  * ``embed_texts / embed_audios``— batched projection-space embeddings (the
    reference processor's path: encoder → pooling → projection, no cross-modal
    fusion, L2-normalised)
  * ``similarity(a, b)``          — cosine similarity of normalised embeddings
  * ``retrieval_metrics``         — speech→text Recall@K over embedding sets
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speech_transcript_embeddings_tpu.config import ExperimentConfig
from speech_transcript_embeddings_tpu.data.tokenizers import (
    Tokenizer, resolve_tokenizer,
)
from speech_transcript_embeddings_tpu.models.dual_encoder import (
    DualEncoderModel, init_params, l2_normalize,
)
from speech_transcript_embeddings_tpu.ops import make_frontend, quant
from speech_transcript_embeddings_tpu.training import checkpoints as ckpt_lib
from speech_transcript_embeddings_tpu.training import optimizer as opt_lib


class Embedder:
    def __init__(self, cfg: ExperimentConfig, params: dict,
                 tokenizer: Optional[Tokenizer] = None):
        self.cfg = cfg
        self.model = DualEncoderModel(cfg.model)
        self.frontend = make_frontend(cfg.model.frontend)
        self.params = params
        # no explicit tokenizer → resolve from the config, exactly as training
        # did (for checkpoints, cfg IS the training config from metadata.json,
        # so a common_voice-trained model gets its training tokenizer back —
        # or a loud error if the metadata lacks one, never a silent hash
        # fallback that would garble real text)
        self.tokenizer = tokenizer or resolve_tokenizer(cfg, context="inference")
        self._embed_text_jit = jax.jit(self._embed_text)
        self._embed_audio_jit = jax.jit(self._embed_audio)
        self._pair_jit = jax.jit(self._pair)
        self._pair_full_jit = jax.jit(self._pair_full)

    # ---- loading -------------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, path: str,
                        tokenizer: Optional[Tokenizer] = None) -> "Embedder":
        meta = ckpt_lib.load_metadata(path)
        cfg = ExperimentConfig.from_json(__import__("json").dumps(meta["config"]))
        model = DualEncoderModel(cfg.model)
        params = jax.eval_shape(
            lambda: init_params(model, jax.random.PRNGKey(0)))
        labels = opt_lib.param_labels(params, cfg.freeze, cfg.model)
        if meta.get("kind") == "params_only":
            merged = ckpt_lib.restore_params_checkpoint(path, params)
        else:
            trainable_s, frozen_s = opt_lib.split_params(params, labels)
            trainable, frozen = ckpt_lib.restore_model_params(
                path, {"trainable": trainable_s, "frozen": frozen_s})
            merged = opt_lib.merge_params(dict(trainable), dict(frozen))
        return cls(cfg, merged, tokenizer)

    # ---- int8 quantization -----------------------------------------------------

    def quantize_int8(self) -> "Embedder":
        """Quantize every Dense kernel on the inference path to int8 (dynamic
        W8A8, ``ops/quant.py``) in place. The jitted applies below always run
        under the int8 interceptor — a no-op for full-precision params — so
        the structure change of the params pytree alone triggers fresh traces
        on the quantized path. Returns self for chaining."""
        L = self.cfg.data.max_text_length
        bucket = min(self.cfg.data.audio_buckets)
        args = (self.params,
                jax.ShapeDtypeStruct((1, L), jnp.int32),
                jax.ShapeDtypeStruct((1, L), jnp.int32),
                jax.ShapeDtypeStruct((1, bucket), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.int32))
        paths = quant.dense_param_paths(self._pair_full, *args)
        self.params = jax.jit(quant.quantize_dense_params,
                              static_argnums=(1,))(self.params, paths)
        return self

    # ---- jitted kernels ------------------------------------------------------
    # every apply runs under the int8 interceptor: full-precision params fall
    # straight through (trace-time isinstance check only), quantized params
    # (kernel_q present) take the dynamic int8 matmul path.

    def _embed_text(self, params, input_ids, attention_mask):
        with quant.intercept_int8():
            proj, _ = self.model.apply({"params": params}, input_ids,
                                       attention_mask,
                                       method=DualEncoderModel.encode_text)
        return l2_normalize(proj)

    def _embed_audio(self, params, waveform, num_samples):
        features, mask = self.frontend(waveform, num_samples)
        with quant.intercept_int8():
            proj, _ = self.model.apply({"params": params}, features, mask,
                                       method=DualEncoderModel.encode_audio)
        return l2_normalize(proj)

    def _pair(self, params, batch):
        with quant.intercept_int8():
            return self.model.apply({"params": params}, batch)

    def _pair_full(self, params, ids, mask, wav, lens):
        features, amask = self.frontend(wav, lens)
        batch = {"input_ids": ids, "attention_mask": mask,
                 "input_features": features, "attention_mask_audio": amask}
        with quant.intercept_int8():
            return self.model.apply({"params": params}, batch)

    # ---- public API ----------------------------------------------------------

    @staticmethod
    def _row_bucket(n: int) -> int:
        """Pad the batch dimension to a power of two so arbitrary request sizes
        reuse a small set of compiled programs (serving path)."""
        b = 1
        while b < n:
            b *= 2
        return b

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        n = len(texts)
        ids, masks = zip(*(self.tokenizer.encode(t, self.cfg.data.max_text_length)
                           for t in texts))
        ids = np.stack(ids)
        masks = np.stack(masks)
        b = self._row_bucket(n)
        if b > n:
            ids = np.concatenate([ids, np.tile(ids[:1], (b - n, 1))])
            masks = np.concatenate([masks, np.tile(masks[:1], (b - n, 1))])
        out = self._embed_text_jit(self.params, jnp.asarray(ids),
                                   jnp.asarray(masks))
        return np.asarray(out)[:n]

    def _pad_audio(self, audios: Sequence[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
        max_len = self.cfg.data.max_audio_samples
        lens = [min(len(a), max_len) for a in audios]
        buckets = sorted(self.cfg.data.audio_buckets)
        import bisect
        bucket = buckets[min(bisect.bisect_left(buckets, max(lens)),
                             len(buckets) - 1)]
        wav = np.zeros((len(audios), bucket), np.float32)
        for i, a in enumerate(audios):
            a = np.asarray(a, np.float32)[: bucket]
            peak = np.abs(a).max() if len(a) else 0.0
            if peak > 1.0:
                a = a / peak
            wav[i, : len(a)] = a
            lens[i] = min(lens[i], bucket)
        return wav, np.asarray(lens, np.int32)

    def embed_audios(self, audios: Sequence[np.ndarray]) -> np.ndarray:
        n = len(audios)
        wav, lens = self._pad_audio(audios)
        b = self._row_bucket(n)
        if b > n:
            wav = np.concatenate([wav, np.tile(wav[:1], (b - n, 1))])
            lens = np.concatenate([lens, np.tile(lens[:1], b - n)])
        out = self._embed_audio_jit(self.params, jnp.asarray(wav), jnp.asarray(lens))
        return np.asarray(out)[:n]

    def pair_similarities(self, texts: Sequence[str],
                          audios: Sequence[np.ndarray]) -> np.ndarray:
        """Batched fused-forward similarity per (text, audio) pair — the
        reference's ``model.forward`` path that its batch inference stores in
        the CSV (cv_inference.py:148-163), with cross-modal fusion applied.
        One jitted call per row bucket instead of per sample."""
        n = len(texts)
        assert n == len(audios)
        ids, masks = zip(*(self.tokenizer.encode(t, self.cfg.data.max_text_length)
                           for t in texts))
        ids = np.stack(ids)
        masks = np.stack(masks)
        wav, lens = self._pad_audio(audios)
        b = self._row_bucket(n)
        if b > n:
            ids = np.concatenate([ids, np.tile(ids[:1], (b - n, 1))])
            masks = np.concatenate([masks, np.tile(masks[:1], (b - n, 1))])
            wav = np.concatenate([wav, np.tile(wav[:1], (b - n, 1))])
            lens = np.concatenate([lens, np.tile(lens[:1], b - n)])
        te, ae = self._pair_full_jit(self.params, jnp.asarray(ids),
                                     jnp.asarray(masks), jnp.asarray(wav),
                                     jnp.asarray(lens))
        return np.sum(np.asarray(te)[:n] * np.asarray(ae)[:n], axis=1)

    def embed_pair(self, text: str, audio: np.ndarray) -> Tuple[float, np.ndarray, np.ndarray]:
        """Full fused forward (cross-modal attention included), like the
        reference's ``model.forward`` path. → (similarity, text_emb, audio_emb)."""
        ids, mask = self.tokenizer.encode(text, self.cfg.data.max_text_length)
        wav, lens = self._pad_audio([audio])
        features, amask = self.frontend(jnp.asarray(wav), jnp.asarray(lens))
        batch = {
            "input_ids": jnp.asarray(ids)[None],
            "attention_mask": jnp.asarray(mask)[None],
            "input_features": features,
            "attention_mask_audio": amask,
        }
        text_emb, audio_emb = self._pair_jit(self.params, batch)
        sim = float(np.sum(np.asarray(text_emb[0]) * np.asarray(audio_emb[0])))
        return sim, np.asarray(text_emb[0]), np.asarray(audio_emb[0])

    @staticmethod
    def similarity(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        a = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
        b = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
        return np.sum(a * b, axis=-1)


def retrieval_metrics(audio_embs: np.ndarray, text_embs: np.ndarray,
                      ks: Sequence[int] = (1, 5, 10)) -> dict:
    """Speech→text retrieval Recall@K (row i's positive is text i)."""
    sims = audio_embs @ text_embs.T                       # [N, N]
    n = sims.shape[0]
    order = np.argsort(-sims, axis=1)
    ranks = np.empty(n, np.int64)
    for i in range(n):
        ranks[i] = int(np.nonzero(order[i] == i)[0][0])
    out = {f"recall@{k}": float(np.mean(ranks < k)) for k in ks}
    out["mean_rank"] = float(ranks.mean() + 1)
    out["mrr"] = float(np.mean(1.0 / (ranks + 1)))
    return out
