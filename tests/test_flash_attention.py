"""Pallas flash attention parity vs the XLA relative_key attention.

Runs in interpret mode on the CPU backend (the kernel auto-interprets
off-TPU). Covers: forward parity, all four gradients (q, k, v and the learned
distance embedding), ragged T (not a multiple of the 128 tile), masked key
tails, and the full RelPositionAttention module with the flag flipped.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_transcript_embeddings_tpu.config import AudioEncoderConfig
from speech_transcript_embeddings_tpu.models.audio_encoder import (
    RelPositionAttention,
)
from speech_transcript_embeddings_tpu.ops.flash_attention import flash_attention

B, NH, T, HD = 2, 2, 150, 16
L, R = 9, 3


def _ref_attn(q, k, v, e, mask, left, right):
    """jnp reference of the relative_key attention math (f32)."""
    hd = q.shape[-1]
    t = q.shape[1]
    s = jnp.einsum("bqd,bkd->bqk", q, k)
    pos = jnp.arange(t)
    dist = jnp.clip(pos[None, :] - pos[:, None], -left, right)
    rel = e[dist + left]
    s = (s + jnp.einsum("bqd,qkd->bqk", q, rel)) / (hd ** 0.5)
    s = jnp.where(jnp.repeat(mask, NH, 0)[:, None, :] > 0, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B * NH, T, HD)).astype(np.float32))
               for _ in range(3))
    e = jnp.asarray((rng.normal(size=(L + R + 1, HD)) * 0.3).astype(np.float32))
    mask = np.ones((B, T), np.float32)
    mask[1, 100:] = 0.0           # ragged masked tail
    return q, k, v, e, jnp.asarray(mask)


def test_forward_parity(inputs):
    q, k, v, e, mask = inputs
    out = flash_attention(q, k, v, e, mask, num_heads=NH, left_max=L,
                          interpret=True)
    ref = _ref_attn(q, k, v, e, mask, L, R)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradient_parity(inputs):
    q, k, v, e, mask = inputs
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(B * NH, T, HD)).astype(np.float32))

    def loss_flash(q, k, v, e):
        o = flash_attention(q, k, v, e, mask, num_heads=NH, left_max=L,
                            interpret=True)
        return jnp.sum(o * w)

    def loss_ref(q, k, v, e):
        return jnp.sum(_ref_attn(q, k, v, e, mask, L, R) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, e)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, e)
    for name, a, b in zip("qkve", g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=f"d{name}")


def _module_cfg(**kw):
    base = dict(
        feature_dim=8, hidden_size=NH * HD, num_layers=1, num_heads=NH,
        intermediate_size=64, conv_kernel_size=7,
        left_max_rel_pos=L, right_max_rel_pos=R,
        attention_dropout=0.0, apply_spec_augment=False)
    base.update(kw)
    return AudioEncoderConfig(**base)


def test_module_flash_matches_xla_path(inputs):
    """RelPositionAttention with use_flash_attention flipped: identical
    forward outputs and parameter gradients (f32, CPU interpret mode)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, T, NH * HD)).astype(np.float32))
    mask = jnp.asarray((np.arange(T)[None, :] <
                        np.array([[T], [100]])).astype(np.int32))

    mod_xla = RelPositionAttention(_module_cfg())
    params = mod_xla.init(jax.random.PRNGKey(0), x, mask)["params"]
    mod_flash = RelPositionAttention(_module_cfg(use_flash_attention=True))

    out_xla = mod_xla.apply({"params": params}, x, mask)
    out_flash = mod_flash.apply({"params": params}, x, mask)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)

    def loss(mod, p):
        o = mod.apply({"params": p}, x, mask)
        return jnp.sum(o * o)

    g_xla = jax.grad(lambda p: loss(mod_xla, p))(params)
    g_flash = jax.grad(lambda p: loss(mod_flash, p))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(g_xla)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_flash))
    for path, gx in flat_x:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(gx), rtol=2e-3, atol=1e-4,
            err_msg=str(path))


def test_tile_aligned_and_single_tile():
    """T exactly one tile and T an exact multiple of tiles."""
    rng = np.random.default_rng(3)
    for t in (128, 256):
        q, k, v = (jnp.asarray(rng.normal(size=(NH, t, HD)).astype(np.float32))
                   for _ in range(3))
        e = jnp.asarray((rng.normal(size=(L + R + 1, HD)) * 0.3).astype(np.float32))
        mask = jnp.ones((1, t), jnp.float32)
        out = flash_attention(q, k, v, e, mask, num_heads=NH, left_max=L,
                              interpret=True)
        ref = _ref_attn(q, k, v, e, jnp.ones((NH // NH, t)), L, R)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_save_residuals_gradient_parity(inputs):
    """The two-phase save_residuals path (used by remat_policy='save_flash')
    must produce identical outputs and gradients to the plain path."""
    q, k, v, e, mask = inputs
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(B * NH, T, HD)).astype(np.float32))

    def loss(save):
        def f(q, k, v, e):
            o = flash_attention(q, k, v, e, mask, num_heads=NH, left_max=L,
                                save_residuals=save, interpret=True)
            return jnp.sum(o * w)
        return f

    out_plain = flash_attention(q, k, v, e, mask, num_heads=NH, left_max=L,
                                interpret=True)
    out_saved = flash_attention(q, k, v, e, mask, num_heads=NH, left_max=L,
                                save_residuals=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out_saved), np.asarray(out_plain),
                               rtol=1e-6, atol=1e-6)

    g_plain = jax.grad(loss(False), argnums=(0, 1, 2, 3))(q, k, v, e)
    g_saved = jax.grad(loss(True), argnums=(0, 1, 2, 3))(q, k, v, e)
    for name, a, b in zip("qkve", g_saved, g_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=f"d{name}")


@pytest.mark.parametrize("saved_policy", ["save_flash", "save_hot",
                                          "save_hot3"])
def test_remat_policy_saved_matches_full(saved_policy):
    """AudioEncoder under remat with policy='save_flash'/'save_hot': same loss
    and parameter gradients as the default full-recompute remat."""
    from speech_transcript_embeddings_tpu.models.audio_encoder import AudioEncoder

    rng = np.random.default_rng(5)
    t = 96
    feats = jnp.asarray(rng.normal(size=(2, t, 8)).astype(np.float32))
    mask = jnp.asarray((np.arange(t)[None, :] <
                        np.array([[t], [70]])).astype(np.int32))

    def build(policy):
        cfg = _module_cfg(num_layers=2, use_flash_attention=True,
                          remat_policy=policy, conv_dropout=0.0)
        return AudioEncoder(cfg, remat=True)

    enc_full = build("full")
    params = enc_full.init(jax.random.PRNGKey(0), feats, mask,
                           deterministic=True)["params"]
    enc_saved = build(saved_policy)

    def loss(enc, p):
        o = enc.apply({"params": p}, feats, mask, deterministic=True)
        return jnp.sum(o * o)

    l_full, g_full = jax.value_and_grad(lambda p: loss(enc_full, p))(params)
    l_saved, g_saved = jax.value_and_grad(lambda p: loss(enc_saved, p))(params)
    np.testing.assert_allclose(float(l_saved), float(l_full), rtol=1e-6)
    flat_full = jax.tree_util.tree_leaves_with_path(g_full)
    flat_saved = dict(jax.tree_util.tree_leaves_with_path(g_saved))
    for path, gf in flat_full:
        np.testing.assert_allclose(
            np.asarray(flat_saved[path]), np.asarray(gf),
            rtol=1e-5, atol=1e-6, err_msg=str(path))


def test_long_sequence_falls_back_to_xla():
    """Past the kernel's verified VMEM envelope (t_pad > MAX_T_PAD) the module
    must route through the XLA path rather than hand Mosaic an un-compilable
    geometry — outputs match a config with the flash flag off."""
    from speech_transcript_embeddings_tpu.ops.flash_attention import (
        BLOCK, MAX_T_PAD, supports_length,
    )

    assert supports_length(MAX_T_PAD) and not supports_length(MAX_T_PAD + 1)
    t = MAX_T_PAD + BLOCK
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, t, NH * HD)).astype(np.float32))
    mask = jnp.ones((1, t), jnp.int32)
    mod_flash = RelPositionAttention(_module_cfg(use_flash_attention=True))
    mod_xla = RelPositionAttention(_module_cfg())
    params = mod_flash.init(jax.random.PRNGKey(0), x, mask,
                            deterministic=True)
    out_flash = mod_flash.apply(params, x, mask, deterministic=True)
    out_xla = mod_xla.apply(params, x, mask, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_flash), np.asarray(out_xla))
