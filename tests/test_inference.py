"""Inference API tests: checkpoint loading, embedding paths, retrieval metrics."""

import os

import numpy as np
import pytest
import jax

from speech_transcript_embeddings_tpu.config import (
    DataConfig, ExperimentConfig, FreezeConfig, LossConfig, OptimizerConfig,
    TrainConfig, tiny_model_config,
)
from speech_transcript_embeddings_tpu.data.sources import synth_audio_for_sentence
from speech_transcript_embeddings_tpu.inference.embed import Embedder, retrieval_metrics
from speech_transcript_embeddings_tpu.models.dual_encoder import (
    DualEncoderModel, init_params,
)
from speech_transcript_embeddings_tpu.training import checkpoints as ckpt_lib
from speech_transcript_embeddings_tpu.training import optimizer as opt_lib
from speech_transcript_embeddings_tpu.training.train_step import create_train_state


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("infer_ckpt")
    cfg = ExperimentConfig(
        model=tiny_model_config(),
        freeze=FreezeConfig(mode="partial", text_layers_to_unfreeze=1,
                            audio_layers_to_unfreeze=1),
        data=DataConfig(dataset="synthetic", batch_size=4, max_text_length=12,
                        audio_buckets=(16000, 48000), max_audio_samples=48000),
        train=TrainConfig(accumulation_steps=2, output_dir=str(tmp)),
    )
    model = DualEncoderModel(cfg.model)
    params = init_params(model, jax.random.PRNGKey(0))
    labels = opt_lib.param_labels(params, cfg.freeze, cfg.model)
    trainable_labels, _ = opt_lib.split_params(labels, labels)
    tx = opt_lib.make_optimizer(cfg.optimizer, cfg.freeze, trainable_labels, 10,
                                accumulation_steps=cfg.train.accumulation_steps)
    state = create_train_state(params, labels, tx)
    path = os.path.join(str(tmp), "best_model_gap")
    ckpt_lib.save_checkpoint(path, state, cfg, epoch=3,
                             metrics={"val_loss": 0.5})
    return path, cfg, params


def test_from_checkpoint_roundtrip(checkpoint_dir):
    path, cfg, params = checkpoint_dir
    emb = Embedder.from_checkpoint(path)
    assert emb.cfg.model.heads.projection_dim == cfg.model.heads.projection_dim
    from flax import traverse_util
    orig = traverse_util.flatten_dict(params, sep="/")
    got = traverse_util.flatten_dict(emb.params, sep="/")
    assert set(orig) == set(got)
    for k in orig:
        np.testing.assert_array_equal(np.asarray(orig[k]), np.asarray(got[k]), err_msg=k)


def test_embedding_shapes_and_pair(checkpoint_dir):
    path, cfg, _ = checkpoint_dir
    emb = Embedder.from_checkpoint(path)
    texts = ["casa tempo dia", "mar sol amigo flor"]
    audios = [synth_audio_for_sentence(t) for t in texts]
    te = emb.embed_texts(texts)
    ae = emb.embed_audios(audios)
    d = cfg.model.heads.projection_dim
    assert te.shape == (2, d) and ae.shape == (2, d)
    np.testing.assert_allclose(np.linalg.norm(te, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(ae, axis=1), 1.0, rtol=1e-5)
    sim, t1, a1 = emb.embed_pair(texts[0], audios[0])
    assert -1.0 <= sim <= 1.0


def test_retrieval_metrics_identity():
    embs = np.eye(6, 8, dtype=np.float32)
    m = retrieval_metrics(embs, embs, ks=(1, 5))
    assert m["recall@1"] == 1.0 and m["recall@5"] == 1.0 and m["mrr"] == 1.0


def test_retrieval_metrics_shifted():
    base = np.eye(4, 5, dtype=np.float32)
    shifted = np.roll(base, 1, axis=0)       # every query's positive ranks 2nd+
    m = retrieval_metrics(shifted, base, ks=(1,))
    assert m["recall@1"] == 0.0


def test_pair_similarities_matches_embed_pair(checkpoint_dir):
    path, cfg, _ = checkpoint_dir
    emb = Embedder.from_checkpoint(path)
    texts = ["casa tempo dia", "vida ano olhos cidade", "mar sol"]
    audios = [synth_audio_for_sentence(t) for t in texts]
    batched = emb.pair_similarities(texts, audios)
    assert batched.shape == (3,)
    singles = [emb.embed_pair(t, a)[0] for t, a in zip(texts, audios)]
    np.testing.assert_allclose(batched, singles, atol=1e-4)


def test_batch_cli_dual_path_csv(checkpoint_dir, tmp_path, capsys):
    """infer.py batch writes the fused-forward similarity as the primary CSV
    score with the projection-path score alongside (reference
    cv_inference.py:148-163 semantics) and prints both."""
    import csv

    from speech_transcript_embeddings_tpu import infer as infer_cli

    path, cfg, _ = checkpoint_dir
    results_dir = str(tmp_path / "cv_results")
    infer_cli.main(["batch", "--checkpoint", path, "--num-samples", "6",
                    "--dataset", "synthetic", "--results-dir", results_dir])
    out = capsys.readouterr().out
    assert "Average similarity (fused forward)" in out
    assert "Average similarity (projection path)" in out
    with open(os.path.join(results_dir, "cv_similarities.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 6
    assert set(rows[0]) == {"sample_id", "text", "similarity",
                            "projection_similarity"}
    emb = Embedder.from_checkpoint(path)
    from speech_transcript_embeddings_tpu.data.sources import make_source
    src = make_source(cfg.data, seed=cfg.train.seed)
    exs = [src.example_at("test", i) for i in range(6)]
    fused = emb.pair_similarities([e.sentence for e in exs],
                                  [e.audio for e in exs])
    got = np.array([float(r["similarity"]) for r in rows])
    np.testing.assert_allclose(got, fused, atol=1e-4)
