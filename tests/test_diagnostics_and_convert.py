"""Gradient-accumulation self-check + pretrained conversion checkpoint flow."""

import os

import numpy as np
import pytest
import jax

from speech_transcript_embeddings_tpu.config import (
    DataConfig, ExperimentConfig, FreezeConfig, HeadsConfig, OptimizerConfig,
    TrainConfig, tiny_model_config,
)
from speech_transcript_embeddings_tpu.data.pipeline import DataPipeline
from speech_transcript_embeddings_tpu.data.sources import SyntheticSource
from speech_transcript_embeddings_tpu.data.tokenizers import SimpleWordTokenizer
from speech_transcript_embeddings_tpu.models.dual_encoder import (
    DualEncoderModel, init_params,
)
from speech_transcript_embeddings_tpu.ops.frontend import LogMelFrontend
from speech_transcript_embeddings_tpu.training import checkpoints as ckpt_lib
from speech_transcript_embeddings_tpu.training import diagnostics
from speech_transcript_embeddings_tpu.training import optimizer as opt_lib
from speech_transcript_embeddings_tpu.training.train_step import create_train_state


def _cfg():
    return ExperimentConfig(
        model=tiny_model_config(),
        freeze=FreezeConfig(mode="partial", text_layers_to_unfreeze=1,
                            audio_layers_to_unfreeze=1),
        optimizer=OptimizerConfig(learning_rate=1e-3, warmup_steps=0),
        data=DataConfig(dataset="synthetic", batch_size=4, max_text_length=12,
                        audio_buckets=(16000,), max_audio_samples=16000,
                        num_synthetic_samples=32),
        train=TrainConfig(num_epochs=1, accumulation_steps=2, seed=0),
    )


def test_grad_accum_check_passes():
    cfg = _cfg()
    model = DualEncoderModel(cfg.model)
    frontend = LogMelFrontend(cfg.model.frontend)
    params = init_params(model, jax.random.PRNGKey(0))
    labels = opt_lib.param_labels(params, cfg.freeze, cfg.model)
    tl, _ = opt_lib.split_params(labels, labels)
    tx = opt_lib.make_optimizer(cfg.optimizer, cfg.freeze, tl, 10)
    state = create_train_state(params, labels, tx)

    src = SyntheticSource(cfg.data, seed=5)
    pipe = DataPipeline(cfg.data, SimpleWordTokenizer(vocab_size=128), seed=0)
    batches = []
    for b in pipe.epoch_batches(src, "train", epoch=0):
        batches.append(b)
        if len(batches) == 2:
            break
    report = diagnostics.validate_gradient_accumulation(
        cfg, model, frontend, state, batches)
    assert report["ok"], report
    assert report["max_grad_norm"] > 0


def test_grad_accum_check_insufficient_batches():
    cfg = _cfg()
    report = diagnostics.validate_gradient_accumulation(
        cfg, None, None, None, [])
    assert not report["ok"]


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import (
        Wav2Vec2BertConfig, Wav2Vec2BertModel, XLMRobertaConfig, XLMRobertaModel,
    )
    from speech_transcript_embeddings_tpu.convert_checkpoint import (
        build_converted_params,
    )
    torch.manual_seed(0)
    text_hf = XLMRobertaModel(XLMRobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=48,
        type_vocab_size=1, pad_token_id=1, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0), add_pooling_layer=False).eval()
    audio_hf = Wav2Vec2BertModel(Wav2Vec2BertConfig(
        feature_projection_input_dim=16, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, conv_depthwise_kernel_size=7,
        left_max_position_embeddings=8, right_max_position_embeddings=2,
        hidden_dropout=0.0, attention_dropout=0.0, conformer_conv_dropout=0.0,
        activation_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
        mask_time_prob=0.0, mask_feature_prob=0.0,
        apply_spec_augment=False)).eval()
    cfg, params = build_converted_params(
        text_hf, audio_hf,
        heads_cfg=HeadsConfig(projection_dim=24, dropout=0.0,
                              cross_modal_heads=4, alignment_heads=2),
        dtype="float32", remat=False)
    tmp = tmp_path_factory.mktemp("converted")
    path = os.path.join(str(tmp), "ckpt")
    ckpt_lib.save_params_checkpoint(path, params, cfg, info={"test": True})
    return path, cfg, params


def test_converted_checkpoint_roundtrip(converted):
    path, cfg, params = converted
    model = DualEncoderModel(cfg.model)
    fresh = init_params(model, jax.random.PRNGKey(7))
    restored = ckpt_lib.restore_params_checkpoint(path, fresh)
    from flax import traverse_util
    a = traverse_util.flatten_dict(params, sep="/")
    b = traverse_util.flatten_dict(restored, sep="/")
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def test_init_checkpoint_feeds_training(converted, tmp_path):
    path, conv_cfg, params = converted
    cfg = ExperimentConfig(
        model=conv_cfg.model,
        freeze=FreezeConfig(mode="partial", text_layers_to_unfreeze=1,
                            audio_layers_to_unfreeze=1),
        optimizer=OptimizerConfig(learning_rate=1e-3, warmup_steps=0),
        data=DataConfig(dataset="synthetic", batch_size=4, max_text_length=12,
                        audio_buckets=(16000,), max_audio_samples=16000,
                        num_synthetic_samples=8),
        train=TrainConfig(num_epochs=1, accumulation_steps=1, seed=0,
                          output_dir=str(tmp_path), init_checkpoint=path,
                          save_every=0, plot_every=100),
    )
    from speech_transcript_embeddings_tpu.training.loop import run_experiment
    results = run_experiment(cfg)
    # frozen bottom layers must still equal the converted pretrained weights
    state = results["state"]
    from flax import traverse_util
    conv_flat = traverse_util.flatten_dict(params, sep="/")
    key = "text_encoder/layer_0/attention/query/kernel"
    np.testing.assert_array_equal(np.asarray(state.frozen[key]),
                                  np.asarray(conv_flat[key]))


def test_init_checkpoint_adapts_scan_layout(converted, tmp_path):
    """A converted (unrolled) checkpoint must load into a scan_bottom model."""
    import dataclasses
    path, conv_cfg, params = converted
    mc = conv_cfg.model
    scan_mc = dataclasses.replace(
        mc, text=dataclasses.replace(mc.text, scan_bottom=1),
        audio=dataclasses.replace(mc.audio, scan_bottom=1))
    loaded = ckpt_lib.load_params_for_model(path, scan_mc)
    from flax import traverse_util
    flat = traverse_util.flatten_dict(loaded, sep="/")
    assert "text_encoder/bottom_stack/scan/block/attention/query/kernel" in flat
    # stacked layer 0 == original layer_0
    orig = traverse_util.flatten_dict(params, sep="/")
    np.testing.assert_array_equal(
        np.asarray(flat["audio_encoder/bottom_stack/scan/block/ffn1/intermediate/kernel"])[0],
        np.asarray(orig["audio_encoder/layer_0/ffn1/intermediate/kernel"]))
    # and the whole tree matches the scan model's structure
    from speech_transcript_embeddings_tpu.models.dual_encoder import (
        DualEncoderModel, init_params,
    )
    target = init_params(DualEncoderModel(scan_mc), jax.random.PRNGKey(0))
    t_flat = traverse_util.flatten_dict(target, sep="/")
    assert set(flat) == set(t_flat)
