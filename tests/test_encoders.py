"""Encoder parity: our native Flax encoders + converter vs tiny random HF torch models.

The HF models are constructed locally from small random configs (no network) and act
purely as numerical oracles for the architectures the reference uses via
``AutoModel.from_pretrained`` (reference model.py:150-152).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

from speech_transcript_embeddings_tpu.models import convert
from speech_transcript_embeddings_tpu.models.audio_encoder import AudioEncoder
from speech_transcript_embeddings_tpu.models.text_encoder import TextEncoder


def _np_state_dict(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def text_pair():
    from transformers import XLMRobertaConfig, XLMRobertaModel
    torch.manual_seed(0)
    hf_cfg = XLMRobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=48, type_vocab_size=1,
        pad_token_id=1, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    hf = XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = convert.text_config_from_hf(hf_cfg)
    params = convert.convert_text_encoder(_np_state_dict(hf), cfg)
    return hf, cfg, params


@pytest.fixture(scope="module")
def audio_pair():
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel
    torch.manual_seed(1)
    hf_cfg = Wav2Vec2BertConfig(
        feature_projection_input_dim=16, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, conv_depthwise_kernel_size=7,
        left_max_position_embeddings=8, right_max_position_embeddings=2,
        hidden_dropout=0.0, attention_dropout=0.0, conformer_conv_dropout=0.0,
        activation_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
        mask_time_prob=0.0, mask_feature_prob=0.0, apply_spec_augment=False,
    )
    hf = Wav2Vec2BertModel(hf_cfg).eval()
    cfg = convert.audio_config_from_hf(hf_cfg)
    params = convert.convert_audio_encoder(_np_state_dict(hf), cfg)
    return hf, cfg, params


def test_text_encoder_parity(text_pair):
    hf, cfg, params = text_pair
    rng = np.random.default_rng(2)
    b, t = 3, 12
    ids = rng.integers(2, 120, size=(b, t))
    lengths = [12, 7, 5]
    mask = np.zeros((b, t), np.int32)
    for i, n in enumerate(lengths):
        mask[i, :n] = 1
        ids[i, n:] = 1  # pad token

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    enc = TextEncoder(cfg)
    got = enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    got = np.asarray(got)
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], rtol=1e-3, atol=3e-4)


def test_audio_encoder_parity(audio_pair):
    hf, cfg, params = audio_pair
    rng = np.random.default_rng(3)
    b, t, f = 2, 20, 16
    feats = rng.normal(size=(b, t, f)).astype(np.float32)
    mask = np.zeros((b, t), np.int32)
    mask[0, :20] = 1
    mask[1, :13] = 1

    with torch.no_grad():
        ref = hf(input_features=torch.tensor(feats),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    enc = AudioEncoder(cfg)
    got = np.asarray(enc.apply({"params": params}, jnp.asarray(feats), jnp.asarray(mask)))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], rtol=1e-3, atol=3e-4)


def test_audio_encoder_no_mask(audio_pair):
    hf, cfg, params = audio_pair
    rng = np.random.default_rng(4)
    feats = rng.normal(size=(1, 9, 16)).astype(np.float32)
    with torch.no_grad():
        ref = hf(input_features=torch.tensor(feats)).last_hidden_state.numpy()
    enc = AudioEncoder(cfg)
    got = np.asarray(enc.apply({"params": params}, jnp.asarray(feats)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=3e-4)


def test_text_position_ids_roberta_offset(text_pair):
    """Padding rows must not advance position ids (RoBERTa offset scheme)."""
    from speech_transcript_embeddings_tpu.models.text_encoder import roberta_position_ids
    ids = jnp.asarray([[5, 6, 7, 1, 1]])
    got = np.asarray(roberta_position_ids(ids, 1))
    np.testing.assert_array_equal(got, [[2, 3, 4, 1, 1]])


def test_spec_augment_masks_in_training_mode():
    """SpecAugment replaces time spans with the learned embedding only when
    non-deterministic, and never touches padded positions."""
    import jax
    import jax.numpy as jnp
    from speech_transcript_embeddings_tpu.config import AudioEncoderConfig
    from speech_transcript_embeddings_tpu.models.audio_encoder import _spec_augment_time

    cfg = AudioEncoderConfig(
        feature_dim=8, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, conv_kernel_size=7, apply_spec_augment=True,
        mask_time_prob=0.2, mask_time_length=4, mask_time_min_masks=2)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 40, 16))
    emb = jnp.full((16,), -5.0)
    mask = jnp.ones((2, 40), jnp.int32).at[1, 20:].set(0)
    out = np.asarray(_spec_augment_time(x, emb, mask, cfg, rng))
    masked = (out[..., 0] == -5.0)
    assert masked.any()                      # some spans masked
    assert not masked[1, 20:].any()          # padding untouched
    assert (out[~masked] == 1.0).all()       # unmasked frames unchanged


def test_spec_augment_span_count_follows_valid_length():
    """The span count derives from the per-utterance valid length (HF samples
    from the real input length): a short clip in a long bucket must get fewer
    masked frames than a full-length one, and all starts land in-valid."""
    import jax
    import jax.numpy as jnp
    from speech_transcript_embeddings_tpu.config import AudioEncoderConfig
    from speech_transcript_embeddings_tpu.models.audio_encoder import _spec_augment_time

    cfg = AudioEncoderConfig(
        feature_dim=8, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, conv_kernel_size=7, apply_spec_augment=True,
        mask_time_prob=0.4, mask_time_length=4, mask_time_min_masks=1)
    t = 80
    x = jnp.ones((2, t, 16))
    emb = jnp.full((16,), -5.0)
    mask = jnp.ones((2, t), jnp.int32).at[1, 20:].set(0)
    counts = []
    for seed in range(8):
        out = np.asarray(_spec_augment_time(x, emb, mask, cfg,
                                            jax.random.PRNGKey(seed)))
        masked = (out[..., 0] == -5.0)
        assert not masked[1, 20:].any()
        # row 1: k = round(0.4*20/4) = 2 spans of 4 → at most 8 masked frames
        assert masked[1].sum() <= 8
        counts.append((masked[0].sum(), masked[1].sum()))
    # row 0 has k = 8 spans: over seeds it must mask strictly more than row 1
    assert sum(c0 for c0, _ in counts) > sum(c1 for _, c1 in counts)


def test_spec_augment_config_roundtrip_from_hf(audio_pair):
    from transformers import Wav2Vec2BertConfig
    hf_cfg = Wav2Vec2BertConfig()   # defaults model facebook/w2v-bert-2.0
    cfg = convert.audio_config_from_hf(hf_cfg)
    assert cfg.apply_spec_augment and cfg.mask_time_prob == 0.05
    assert cfg.mask_time_length == 10 and cfg.mask_time_min_masks == 2


def test_scan_bottom_parity_audio():
    """scan_bottom folds the bottom blocks into one lax.scan; outputs must equal
    the HF reference (and hence the unrolled path) exactly."""
    import dataclasses
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel
    torch.manual_seed(7)
    hf_cfg = Wav2Vec2BertConfig(
        feature_projection_input_dim=16, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=64, conv_depthwise_kernel_size=7,
        left_max_position_embeddings=8, right_max_position_embeddings=2,
        hidden_dropout=0.0, attention_dropout=0.0, conformer_conv_dropout=0.0,
        activation_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
        mask_time_prob=0.0, mask_feature_prob=0.0, apply_spec_augment=False)
    hf = Wav2Vec2BertModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = dataclasses.replace(convert.audio_config_from_hf(hf_cfg), scan_bottom=2)
    params = convert.convert_audio_encoder(sd, cfg)
    assert "bottom_stack" in params and "layer_2" in params and "layer_0" not in params

    rng = np.random.default_rng(8)
    feats = rng.normal(size=(2, 15, 16)).astype(np.float32)
    mask = np.ones((2, 15), np.int32)
    mask[1, 9:] = 0
    with torch.no_grad():
        ref = hf(input_features=torch.tensor(feats),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    got = np.asarray(AudioEncoder(cfg).apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(mask)))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], rtol=1e-3, atol=3e-4)


def test_scan_bottom_parity_text():
    import dataclasses
    from transformers import XLMRobertaConfig, XLMRobertaModel
    torch.manual_seed(9)
    hf_cfg = XLMRobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=48, type_vocab_size=1,
        pad_token_id=1, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf = XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = dataclasses.replace(convert.text_config_from_hf(hf_cfg), scan_bottom=3)
    params = convert.convert_text_encoder(sd, cfg)

    rng = np.random.default_rng(10)
    ids = rng.integers(2, 120, size=(2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    got = np.asarray(TextEncoder(cfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=3e-4)


def test_scan_bottom_freeze_labels():
    import dataclasses
    from speech_transcript_embeddings_tpu.config import (
        FreezeConfig, tiny_model_config,
    )
    from speech_transcript_embeddings_tpu.models.dual_encoder import (
        DualEncoderModel, init_params,
    )
    from speech_transcript_embeddings_tpu.training import optimizer as opt_lib
    from flax import traverse_util

    base = tiny_model_config()
    model_cfg = dataclasses.replace(
        base,
        text=dataclasses.replace(base.text, scan_bottom=1),
        audio=dataclasses.replace(base.audio, scan_bottom=1))
    model = DualEncoderModel(model_cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    fz = FreezeConfig(mode="partial", text_layers_to_unfreeze=1,
                      audio_layers_to_unfreeze=1)
    flat = traverse_util.flatten_dict(
        opt_lib.param_labels(params, fz, model_cfg), sep="/")
    stack_keys = [k for k in flat if "/bottom_stack/" in k]
    assert stack_keys and all(flat[k] == "frozen" for k in stack_keys)
    assert flat["audio_encoder/layer_1/ffn1/intermediate/kernel"] == "encoder"
    # overlap with unfrozen top layers must be rejected
    bad = FreezeConfig(mode="partial", text_layers_to_unfreeze=2,
                       audio_layers_to_unfreeze=2)
    with pytest.raises(ValueError):
        opt_lib.param_labels(params, bad, model_cfg)


def test_restack_encoder_params_roundtrip(audio_pair):
    """scan<->unrolled layout adapter: loading a checkpoint under a different
    scan_bottom must produce identical encoder outputs."""
    import dataclasses
    hf, cfg, params = audio_pair          # unrolled (scan_bottom=0), 2 layers
    scan_cfg = dataclasses.replace(cfg, scan_bottom=1)
    stacked = convert.restack_encoder_params(params, 0, 1, cfg.num_layers)
    back = convert.restack_encoder_params(stacked, 1, 0, cfg.num_layers)

    rng = np.random.default_rng(11)
    feats = rng.normal(size=(1, 12, 16)).astype(np.float32)
    ref = np.asarray(AudioEncoder(cfg).apply({"params": params}, jnp.asarray(feats)))
    via_scan = np.asarray(AudioEncoder(scan_cfg).apply(
        {"params": stacked}, jnp.asarray(feats)))
    via_back = np.asarray(AudioEncoder(cfg).apply({"params": back}, jnp.asarray(feats)))
    np.testing.assert_allclose(via_scan, ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(via_back, ref, rtol=1e-6, atol=1e-7)


def test_save_hot_remat_without_flash_attention():
    """remat_policy=save_hot/save_hot2 must save the conv/ffn1 tags even when
    the flash kernel is off (XLA attention path) — the policies are documented
    for small geometries where flash is disabled; silently degrading to full
    recompute would betray the config. Values must match policy='full' exactly
    (remat changes scheduling, not math)."""
    from speech_transcript_embeddings_tpu.config import AudioEncoderConfig

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 24, 8)).astype(np.float32))
    mask = jnp.ones((2, 24), jnp.int32)
    outs = {}
    for policy in ("full", "save_hot", "save_hot2", "save_hot3"):
        cfg = AudioEncoderConfig(
            feature_dim=8, hidden_size=16, num_layers=2, num_heads=2,
            intermediate_size=32, conv_kernel_size=4,
            use_flash_attention=False, remat_policy=policy,
            apply_spec_augment=False)
        enc = AudioEncoder(cfg, jnp.float32, remat=True)
        params = enc.init(jax.random.PRNGKey(0), feats, mask,
                          deterministic=True)["params"]

        def loss(p):
            return jnp.sum(enc.apply({"params": p}, feats, mask,
                                     deterministic=True) ** 2)

        val, grads = jax.jit(jax.value_and_grad(loss))(params)
        outs[policy] = (float(val), grads)
    for policy in ("save_hot", "save_hot2", "save_hot3"):
        assert outs[policy][0] == outs["full"][0]
        jax.tree.map(np.testing.assert_array_equal,
                     outs[policy][1], outs["full"][1])
