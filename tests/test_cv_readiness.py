"""Real-data readiness drill (VERDICT r4 item 8).

This environment has zero egress, so the actual Common Voice corpus and hub
tokenizers can't be fetched. These tests exercise the ENTIRE hub-connected
path of docs/CV_RUNBOOK.md against local fakes instead:

  * a tiny on-disk ``datasets.save_to_disk`` snapshot with the Common Voice
    schema (audio + sentence columns, train/validation/test splits) loaded
    through ``CommonVoiceSource`` via ``DataConfig.cv_local_dataset_dir`` —
    the same airgapped-snapshot path a hub-less TPU-VM would use,
  * a real HuggingFace fast tokenizer saved with ``save_pretrained`` and
    resolved through ``resolve_tokenizer`` (the vocab-vs-embedding-table
    check included),

so the first hub-connected run has no untested step: source loading, 16 kHz
cast, length-histogram caching, bucketed batching, HF tokenization, training,
checkpointing with the tokenizer identity in metadata, and test/retrieval
evaluation all run the production code paths.

Reference counterpart: trainer_unfreeze.py:1923-1927 (load_dataset +
cast_column 16 kHz) and :1387 (AutoTokenizer from the text model).
"""

import json
import os

import numpy as np
import pytest

from speech_transcript_embeddings_tpu.config import (
    DataConfig, ExperimentConfig, FreezeConfig, LossConfig, OptimizerConfig,
    TrainConfig, tiny_model_config,
)
from speech_transcript_embeddings_tpu.data.sources import (
    CommonVoiceSource, make_source, synth_audio_for_sentence,
)

_WORDS = ("casa tempo vida ano cidade mundo noite terra parte momento agua "
          "luz caminho palavra historia trabalho musica porta mar sol").split()


@pytest.fixture(scope="module")
def fake_cv_dir(tmp_path_factory):
    """A tiny Common-Voice-shaped dataset snapshot on disk.

    Audio is stored as raw float32 sample sequences (+ sampling_rate column):
    this image lacks the torchcodec backend ``datasets`` 5.x needs to encode/
    decode its Audio feature, and ``CommonVoiceSource._row_audio`` accepts
    raw-array / path / Audio-dict schemas interchangeably, so the drill still
    runs the production source path end to end.
    """
    from datasets import Dataset, DatasetDict

    rng = np.random.default_rng(5)

    def rows(n, salt):
        sentences, audios = [], []
        for i in range(n):
            k = int(rng.integers(2, 6))
            words = [_WORDS[int(rng.integers(len(_WORDS)))] for _ in range(k)]
            s = " ".join(words)
            sentences.append(s)
            audios.append(
                synth_audio_for_sentence(s, seed=salt * 1000 + i).tolist())
        return Dataset.from_dict({"audio": audios, "sentence": sentences,
                                  "sampling_rate": [16000] * n})

    dd = DatasetDict({"train": rows(24, 1), "validation": rows(8, 2),
                      "test": rows(8, 3)})
    out = tmp_path_factory.mktemp("fake_cv")
    dd.save_to_disk(str(out))
    return str(out)


@pytest.fixture(scope="module")
def fake_tokenizer_dir(tmp_path_factory):
    """A real HF fast tokenizer (WordLevel over the fixture vocabulary),
    saved the way any hub tokenizer materializes locally."""
    from tokenizers import Tokenizer as RawTokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for w in _WORDS:
        vocab[w] = len(vocab)
    raw = RawTokenizer(WordLevel(vocab, unk_token="<unk>"))
    raw.pre_tokenizer = Whitespace()
    tok = PreTrainedTokenizerFast(
        tokenizer_object=raw, bos_token="<s>", pad_token="<pad>",
        eos_token="</s>", unk_token="<unk>")
    out = tmp_path_factory.mktemp("fake_tok")
    tok.save_pretrained(str(out))
    return str(out)


def drill_cfg(fake_cv_dir, fake_tokenizer_dir, out_dir, cache_dir):
    return ExperimentConfig(
        model=tiny_model_config(),
        freeze=FreezeConfig(mode="partial", text_layers_to_unfreeze=1,
                            audio_layers_to_unfreeze=1),
        loss=LossConfig(kind="global"),
        optimizer=OptimizerConfig(learning_rate=2e-3, warmup_steps=3),
        data=DataConfig(dataset="common_voice",
                        cv_local_dataset_dir=fake_cv_dir,
                        tokenizer=fake_tokenizer_dir,
                        batch_size=4, max_text_length=12,
                        audio_buckets=(16000, 48000),
                        max_audio_samples=48000,
                        length_cache_dir=str(cache_dir)),
        train=TrainConfig(num_epochs=2, accumulation_steps=1, seed=42,
                          output_dir=str(out_dir), plot_every=1,
                          log_every_batches=1000),
    )


def test_source_loads_local_snapshot(fake_cv_dir, tmp_path):
    cfg = DataConfig(dataset="common_voice", cv_local_dataset_dir=fake_cv_dir,
                     length_cache_dir=str(tmp_path))
    src = make_source(cfg)
    assert isinstance(src, CommonVoiceSource)
    assert src.num_examples("train") == 24
    ex = src.example_at("train", 0)
    assert ex.sampling_rate == 16000 and ex.audio.dtype == np.float32
    assert ex.sentence and isinstance(ex.sentence, str)
    # the length histogram is computed once and persisted to the cache dir
    lens = src.audio_lengths("train")
    assert lens == [len(e.audio) for e in src.examples("train")]
    cached = [f for f in os.listdir(tmp_path) if f.endswith(".json")]
    assert cached, "length cache not persisted"


def test_hf_tokenizer_resolution_and_vocab_gate(fake_cv_dir,
                                                fake_tokenizer_dir, tmp_path):
    from speech_transcript_embeddings_tpu.data.tokenizers import (
        HFTokenizer, resolve_tokenizer,
    )
    cfg = drill_cfg(fake_cv_dir, fake_tokenizer_dir, tmp_path, tmp_path)
    tok = resolve_tokenizer(cfg, context="drill")
    assert isinstance(tok, HFTokenizer)
    ids, mask = tok.encode("casa tempo vida", max_length=12)
    assert ids.shape == (12,) and mask.sum() >= 3
    assert ids.max() < cfg.model.text.vocab_size
    # a missing tokenizer on common_voice fails loudly (runbook note)
    bad = cfg.with_overrides({"data": {"tokenizer": None}})
    with pytest.raises(ValueError, match="tokenizer is not set"):
        resolve_tokenizer(bad, context="drill")


def test_end_to_end_drill(fake_cv_dir, fake_tokenizer_dir, tmp_path):
    """The full CV_RUNBOOK training path, offline: train 2 epochs on the
    snapshot through the production loop, artifacts in the reference schema,
    tokenizer identity in every checkpoint's metadata."""
    from speech_transcript_embeddings_tpu.training.loop import run_experiment

    out = tmp_path / "run"
    cfg = drill_cfg(fake_cv_dir, fake_tokenizer_dir, out, tmp_path / "cache")
    results = run_experiment(cfg)
    assert len(results["val_history"]["clean"]) == 2
    assert set(results["test_metrics"]) & {"best_loss_model", "best_gap_model"}
    assert "retrieval" in results
    with open(os.path.join(str(out), "best_model_gap", "metadata.json")) as f:
        meta = json.load(f)
    # the tokenizer travels with the model (r3 item 1 invariant)
    assert meta["config"]["data"]["tokenizer"] == fake_tokenizer_dir
    assert meta["config"]["data"]["dataset"] == "common_voice"
    with open(os.path.join(str(out), "test_metrics.json")) as f:
        tm = json.load(f)
    for block in tm.values():
        assert "similarity_gap" in block
