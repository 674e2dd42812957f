"""The tokenizer travels with the model (VERDICT r3 item 1).

The reference always tokenizes with the text model's own tokenizer
(trainer_unfreeze.py:1387, processor.py:33 — both
``AutoTokenizer.from_pretrained(text_model_name)``, inherited by the inference
scripts through ``AudioTextProcessor``). Here that identity is
``DataConfig.tokenizer``: set by the presets, stored in every checkpoint's
metadata.json, and resolved by ONE function (``resolve_tokenizer``) for
training, inference and serving alike.

HF tokenizers are stubbed (offline test env): the stub records the requested
name and reports the real models' vocab sizes, which is exactly what the
resolution + vocab-compatibility logic consumes.
"""

import json
import os

import jax
import numpy as np
import pytest

from speech_transcript_embeddings_tpu.config import (
    DataConfig, ExperimentConfig, FreezeConfig, TrainConfig, tiny_model_config,
)
from speech_transcript_embeddings_tpu.data.tokenizers import (
    HFTokenizer, SimpleWordTokenizer, resolve_tokenizer,
)
from speech_transcript_embeddings_tpu.train import build_config

MPNET = "sentence-transformers/paraphrase-multilingual-mpnet-base-v2"
ROBERTA = "sentence-transformers/all-roberta-large-v1"
_VOCABS = {MPNET: 250002, ROBERTA: 50265, "stub-tiny-tok": 100}


class _StubHFTok:
    pad_token_id = 1

    def __init__(self, name):
        self.name_or_path = name
        self._n = _VOCABS[name]

    def __len__(self):
        return self._n

    def __call__(self, text, max_length, padding, truncation, return_tensors):
        ids = np.full((1, max_length), 5, np.int64)
        mask = np.ones((1, max_length), np.int64)
        return {"input_ids": ids, "attention_mask": mask}


@pytest.fixture()
def stub_hf(monkeypatch):
    import transformers
    calls = []

    def fake(name, *a, **k):
        calls.append(name)
        return _StubHFTok(name)

    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        staticmethod(fake))
    return calls


def test_presets_carry_their_text_encoders_tokenizer():
    assert build_config(["preset=flagship"]).data.tokenizer == MPNET
    assert build_config(["preset=retrieval"]).data.tokenizer == MPNET
    assert build_config(["preset=flagship-roberta"]).data.tokenizer == ROBERTA
    # user override still wins
    cfg = build_config(["preset=retrieval", "data.tokenizer=hash"])
    assert cfg.data.tokenizer == "hash"


def test_roberta_preset_tokenizes_with_vocab_50265(stub_hf):
    cfg = build_config(["preset=flagship-roberta", "data.dataset=common_voice"])
    tok = resolve_tokenizer(cfg)
    assert isinstance(tok, HFTokenizer)
    assert stub_hf == [ROBERTA]
    assert tok.vocab_size == 50265
    assert tok.vocab_size <= cfg.model.text.vocab_size
    ids, mask = tok.encode("uma frase qualquer", 16)
    assert ids.shape == (16,) and mask.shape == (16,)


def test_wrong_vocab_tokenizer_raises(stub_hf):
    # the r3 failure mode: the roberta-large encoder (50265-row embedding
    # table) fed by the hard-coded mpnet tokenizer (250002 ids) — must be a
    # loud error, not silent out-of-range indexing at data time
    cfg = build_config(["preset=flagship-roberta", "data.dataset=common_voice",
                        f"data.tokenizer={MPNET}"])
    with pytest.raises(ValueError, match="out of range"):
        resolve_tokenizer(cfg)


def test_common_voice_without_tokenizer_raises():
    cfg = ExperimentConfig(data=DataConfig(dataset="common_voice"))
    with pytest.raises(ValueError, match="data.tokenizer is not set"):
        resolve_tokenizer(cfg)
    # training resolves through the same path
    from speech_transcript_embeddings_tpu.training.loop import default_tokenizer
    with pytest.raises(ValueError, match="data.tokenizer is not set"):
        default_tokenizer(cfg)


def test_synthetic_data_always_uses_hash_tokenizer(monkeypatch):
    # preset=retrieval carries the mpnet tokenizer name, but synthetic text is
    # generated pseudo-words — resolution must not touch HF at all
    import transformers

    def boom(*a, **k):
        raise AssertionError("AutoTokenizer must not be loaded for synthetic data")

    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        staticmethod(boom))
    cfg = build_config(["preset=retrieval", "data.dataset=synthetic",
                        "model.text.vocab_size=512"])
    tok = resolve_tokenizer(cfg)
    assert isinstance(tok, SimpleWordTokenizer)
    assert tok.vocab_size == 512


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    from speech_transcript_embeddings_tpu.models.dual_encoder import (
        DualEncoderModel, init_params,
    )
    from speech_transcript_embeddings_tpu.training import checkpoints as ckpt_lib
    from speech_transcript_embeddings_tpu.training import optimizer as opt_lib
    from speech_transcript_embeddings_tpu.training.train_step import create_train_state

    tmp = tmp_path_factory.mktemp("tok_ckpt")
    cfg = ExperimentConfig(
        model=tiny_model_config(),
        freeze=FreezeConfig(mode="partial", text_layers_to_unfreeze=1,
                            audio_layers_to_unfreeze=1),
        data=DataConfig(dataset="common_voice", tokenizer="stub-tiny-tok",
                        batch_size=4, max_text_length=12,
                        audio_buckets=(16000,), max_audio_samples=16000),
        train=TrainConfig(accumulation_steps=1, output_dir=str(tmp)),
    )
    model = DualEncoderModel(cfg.model)
    params = init_params(model, jax.random.PRNGKey(0))
    labels = opt_lib.param_labels(params, cfg.freeze, cfg.model)
    trainable_labels, _ = opt_lib.split_params(labels, labels)
    tx = opt_lib.make_optimizer(cfg.optimizer, cfg.freeze, trainable_labels, 10,
                                accumulation_steps=1)
    state = create_train_state(params, labels, tx)
    path = os.path.join(str(tmp), "best_model_gap")
    ckpt_lib.save_checkpoint(path, state, cfg, epoch=1, metrics={})
    return path


def test_embedder_restores_training_tokenizer(tiny_checkpoint, stub_hf):
    from speech_transcript_embeddings_tpu.inference.embed import Embedder

    emb = Embedder.from_checkpoint(tiny_checkpoint)
    # metadata.json carried data.tokenizer → the exact training tokenizer,
    # not a silent hash fallback (the r3 inference/serve failure mode)
    assert isinstance(emb.tokenizer, HFTokenizer)
    assert stub_hf == ["stub-tiny-tok"]
    assert emb.tokenizer.vocab_size == 100


def test_embedder_fails_loudly_without_tokenizer(tiny_checkpoint, stub_hf,
                                                 tmp_path):
    # simulate an old/real-data checkpoint whose metadata lacks the tokenizer:
    # loading must raise, never silently embed garbage
    import shutil

    from speech_transcript_embeddings_tpu.inference.embed import Embedder

    broken = tmp_path / "no_tok_ckpt"
    shutil.copytree(tiny_checkpoint, broken)
    meta_path = broken / "metadata.json"
    meta = json.loads(meta_path.read_text())
    meta["config"]["data"]["tokenizer"] = None
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="data.tokenizer is not set"):
        Embedder.from_checkpoint(str(broken))
