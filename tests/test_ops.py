"""Unit tests for core ops vs independent (torch/numpy) references.

The torch references below are re-derived from the published formulas (rope =
complex rotation of consecutive pairs; rmsnorm = x * rsqrt(mean(x^2)+eps)),
matching reference semantics at accessory/model/LLM/llama.py:46-77 and
accessory/model/components.py — they are parity oracles, not ported code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from accessory_tpu.ops import rms_norm, layer_norm, precompute_rope, apply_rope, attention
from accessory_tpu.ops.sampling import sample_top_p, sample_token


def torch_rope_interleaved(xq, theta=10000.0, scaling=None):
    """Independent oracle: complex-pair rotation exactly as meta's llama does."""
    b, s, h, d = xq.shape
    freqs = 1.0 / (theta ** (torch.arange(0, d, 2).float() / d))
    t = torch.arange(s).float()
    if scaling is not None:
        t = t * scaling
    freqs_cis = torch.polar(torch.ones(s, d // 2), torch.outer(t, freqs))
    xq_ = torch.view_as_complex(xq.float().reshape(b, s, h, -1, 2))
    out = torch.view_as_real(xq_ * freqs_cis.view(1, s, 1, d // 2)).flatten(3)
    return out


@pytest.mark.parametrize("scaling", [None, 0.25])
def test_rope_matches_complex_reference(scaling):
    b, s, h, d = 2, 16, 4, 32
    x = np.random.RandomState(0).randn(b, s, h, d).astype(np.float32)
    cos, sin = precompute_rope(d, s, theta=10000.0, scaling=scaling)
    got = apply_rope(jnp.asarray(x), cos, sin, "interleaved")
    want = torch_rope_interleaved(torch.from_numpy(x), scaling=scaling).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_rope_half_style_rotates_pairs_across_halves():
    # x with only position i and i+d/2 non-zero rotates within that pair
    d, s = 8, 4
    x = np.zeros((1, s, 1, d), np.float32)
    x[..., 0] = 1.0
    cos, sin = precompute_rope(d, s)
    out = np.asarray(apply_rope(jnp.asarray(x), cos, sin, "half"))
    # position 0: angle 0 → unchanged
    np.testing.assert_allclose(out[0, 0, 0], x[0, 0, 0], atol=1e-6)
    # rotation preserves pair norm
    norms = np.sqrt(out[..., 0] ** 2 + out[..., d // 2] ** 2)
    np.testing.assert_allclose(norms, np.ones_like(norms), atol=1e-5)


def test_rmsnorm_matches_formula():
    x = np.random.RandomState(1).randn(3, 5, 64).astype(np.float32)
    w = np.random.RandomState(2).rand(64).astype(np.float32)
    got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-5)
    t = torch.from_numpy(x)
    want = (t * torch.rsqrt(t.pow(2).mean(-1, keepdim=True) + 1e-5)) * torch.from_numpy(w)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5, rtol=1e-5)


def test_layernorm_matches_torch():
    x = np.random.RandomState(1).randn(3, 5, 64).astype(np.float32)
    w = np.random.RandomState(2).rand(64).astype(np.float32)
    b = np.random.RandomState(3).rand(64).astype(np.float32)
    got = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-5)
    want = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (64,), torch.from_numpy(w), torch.from_numpy(b), 1e-5)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5, rtol=1e-5)


def test_attention_matches_torch_sdpa_causal():
    b, s, h, d = 2, 10, 4, 16
    rs = np.random.RandomState(3)
    q, k, v = (rs.randn(b, s, h, d).astype(np.float32) for _ in range(3))
    got = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True)
    tq, tk, tv = (torch.from_numpy(t).permute(0, 2, 1, 3) for t in (q, k, v))
    want = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv, is_causal=True)
    want = want.permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_attention_gqa_equals_repeated_kv():
    b, s, hq, hkv, d = 1, 8, 8, 2, 16
    rs = np.random.RandomState(4)
    q = rs.randn(b, s, hq, d).astype(np.float32)
    k = rs.randn(b, s, hkv, d).astype(np.float32)
    v = rs.randn(b, s, hkv, d).astype(np.float32)
    got = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True)
    # oracle: repeat_interleave kv to hq heads (reference repeat_kv llama.py:80-89)
    kr = np.repeat(k, hq // hkv, axis=2)
    vr = np.repeat(v, hq // hkv, axis=2)
    want = attention(jnp.asarray(q), jnp.asarray(kr), jnp.asarray(vr), causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_attention_decode_matches_prefix_of_prefill():
    """Decoding token t over a cache must equal position t of full prefill."""
    b, s, h, d = 1, 6, 2, 8
    rs = np.random.RandomState(5)
    q = rs.randn(b, s, h, d).astype(np.float32)
    k = rs.randn(b, s, h, d).astype(np.float32)
    v = rs.randn(b, s, h, d).astype(np.float32)
    full = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True)
    for t in range(s):
        step = attention(
            jnp.asarray(q[:, t:t + 1]), jnp.asarray(k), jnp.asarray(v),
            causal=True, q_offset=t, kv_len=t + 1)
        np.testing.assert_allclose(
            np.asarray(step[:, 0]), np.asarray(full[:, t]), atol=1e-5, rtol=1e-5)


def test_top_p_masks_tail():
    probs = jnp.asarray([[0.5, 0.3, 0.15, 0.05]])
    # p=0.6: keep tokens while cumulative mass before them <= 0.6 → {0, 1}
    draws = set()
    for i in range(50):
        tok = sample_top_p(probs, 0.6, jax.random.key(i))
        draws.add(int(tok[0]))
    assert draws <= {0, 1} and 0 in draws


def test_greedy_sampling():
    logits = jnp.asarray([[0.1, 5.0, 0.2], [9.0, 0.0, 0.0]])
    tok = sample_token(logits, jax.random.key(0), temperature=0.0)
    assert tok.tolist() == [1, 0]
