"""Head-module parity vs independent torch oracles.

Oracles are written here from the documented behavior of the reference components
(projection model.py:13-44, cross-modal attention model.py:47-100, attentive pooling
model.py:103-130, word alignment trainer_unfreeze.py:214-310) using torch primitives
— ``torch.nn.MultiheadAttention`` for the alignment attention — and are independent
implementations, not copies.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

from speech_transcript_embeddings_tpu.models.heads import (
    AttentivePooling,
    CrossModalAttention,
    EnhancedProjection,
    WordLevelAlignment,
)


def t2n(t):
    return t.detach().numpy()


def dense_params(linear):
    p = {"kernel": t2n(linear.weight).T.copy()}
    if linear.bias is not None:
        p["bias"] = t2n(linear.bias)
    return p


def ln_params(norm):
    return {"scale": t2n(norm.weight), "bias": t2n(norm.bias)}


def test_projection_parity():
    torch.manual_seed(0)
    d_in, d_proj = 12, 8
    lin1 = torch.nn.Linear(d_in, 2 * d_proj)
    lin2 = torch.nn.Linear(2 * d_proj, d_proj)
    norm = torch.nn.LayerNorm(d_proj)
    x = torch.randn(5, d_in)
    with torch.no_grad():
        ref = norm(lin2(torch.nn.functional.gelu(lin1(x))))

    params = {"dense_in": dense_params(lin1), "dense_out": dense_params(lin2),
              "norm": ln_params(norm)}
    got = EnhancedProjection(projection_dim=d_proj, dropout=0.0).apply(
        {"params": params}, jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(got), t2n(ref), rtol=1e-5, atol=1e-5)


def test_cross_modal_attention_parity():
    torch.manual_seed(1)
    d, heads, b, tk = 16, 8, 3, 7
    q_l, k_l, v_l, o_l = (torch.nn.Linear(d, d) for _ in range(4))
    x = torch.randn(b, 1, d)         # pooled query
    ctx = torch.randn(b, tk, d)
    mask = torch.ones(b, tk, dtype=torch.long)
    mask[1, 4:] = 0
    mask[2, 2:] = 0

    hd = d // heads
    with torch.no_grad():
        q = q_l(x).view(b, -1, heads, hd).transpose(1, 2)
        k = k_l(ctx).view(b, -1, heads, hd).transpose(1, 2)
        v = v_l(ctx).view(b, -1, heads, hd).transpose(1, 2)
        w = (q @ k.transpose(-2, -1)) * hd ** -0.5
        w = w.masked_fill(mask[:, None, None, :] == 0, -1e9)
        w = torch.softmax(w, dim=-1)
        out = (w @ v).transpose(1, 2).reshape(b, -1, d)
        ref = o_l(out)

    params = {"query": dense_params(q_l), "key": dense_params(k_l),
              "value": dense_params(v_l), "out": dense_params(o_l)}
    got = CrossModalAttention(num_heads=heads, dropout=0.0).apply(
        {"params": params}, jnp.asarray(t2n(x)), jnp.asarray(t2n(ctx)),
        jnp.asarray(t2n(mask)))
    np.testing.assert_allclose(np.asarray(got), t2n(ref), rtol=1e-5, atol=1e-5)


def test_attentive_pooling_parity():
    torch.manual_seed(2)
    h, b, t = 10, 4, 6
    lin1 = torch.nn.Linear(h, h // 2)
    lin2 = torch.nn.Linear(h // 2, 1)
    x = torch.randn(b, t, h)
    mask = torch.ones(b, t, dtype=torch.long)
    mask[0, 3:] = 0
    with torch.no_grad():
        s = lin2(torch.tanh(lin1(x))).squeeze(-1)
        s = s.masked_fill(mask == 0, -1e9)
        w = torch.softmax(s, dim=1)
        ref = torch.bmm(w.unsqueeze(1), x).squeeze(1)

    params = {"score_in": dense_params(lin1), "score_out": dense_params(lin2)}
    got = AttentivePooling().apply({"params": params}, jnp.asarray(t2n(x)),
                                   jnp.asarray(t2n(mask)))
    np.testing.assert_allclose(np.asarray(got), t2n(ref), rtol=1e-5, atol=1e-5)


def test_word_alignment_parity():
    torch.manual_seed(3)
    text_h = align = 12   # reference configuration: text_hidden == alignment_dim
    audio_h, heads, b, tt, ta = 20, 4, 2, 5, 9
    text_proj_l = torch.nn.Linear(text_h, align)
    audio_proj_l = torch.nn.Linear(audio_h, align)
    mha = torch.nn.MultiheadAttention(align, heads, dropout=0.0, batch_first=True)
    out_proj_l = torch.nn.Linear(align, align)
    norm = torch.nn.LayerNorm(align)
    conf1 = torch.nn.Linear(align, align // 2)
    conf2 = torch.nn.Linear(align // 2, 1)

    text_hidden = torch.randn(b, tt, text_h)
    audio_hidden = torch.randn(b, ta, audio_h)
    text_mask = torch.ones(b, tt, dtype=torch.long)
    text_mask[1, 3:] = 0
    audio_mask = torch.ones(b, ta, dtype=torch.long)
    audio_mask[0, 6:] = 0

    with torch.no_grad():
        tp = text_proj_l(text_hidden)
        ap = audio_proj_l(audio_hidden)
        attended, weights = mha(
            query=tp, key=ap, value=ap,
            key_padding_mask=(1.0 - audio_mask).bool(),
            need_weights=True, average_attn_weights=False)
        align_matrix = weights.mean(dim=1)
        aligned = norm(text_hidden + out_proj_l(attended))
        scores = conf2(torch.relu(conf1(aligned))).squeeze(-1)
        scores = scores * text_mask

    ipw = mha.in_proj_weight
    ipb = mha.in_proj_bias
    d = align
    params = {
        "text_proj": dense_params(text_proj_l),
        "audio_proj": dense_params(audio_proj_l),
        "attn_q": {"kernel": t2n(ipw[:d]).T.copy(), "bias": t2n(ipb[:d])},
        "attn_k": {"kernel": t2n(ipw[d:2 * d]).T.copy(), "bias": t2n(ipb[d:2 * d])},
        "attn_v": {"kernel": t2n(ipw[2 * d:]).T.copy(), "bias": t2n(ipb[2 * d:])},
        "attn_out": dense_params(mha.out_proj),
        "output_proj": dense_params(out_proj_l),
        "norm": ln_params(norm),
        "confidence_in": dense_params(conf1),
        "confidence_out": dense_params(conf2),
    }
    mod = WordLevelAlignment(alignment_dim=align, num_heads=heads, dropout=0.0)
    got_aligned, got_scores, got_matrix = mod.apply(
        {"params": params}, jnp.asarray(t2n(text_hidden)),
        jnp.asarray(t2n(audio_hidden)), jnp.asarray(t2n(text_mask)),
        jnp.asarray(t2n(audio_mask)))
    np.testing.assert_allclose(np.asarray(got_aligned), t2n(aligned),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_scores), t2n(scores),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_matrix), t2n(align_matrix),
                               rtol=1e-5, atol=1e-5)
