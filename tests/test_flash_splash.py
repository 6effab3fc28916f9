"""Splash-attention path numerics: interpret-mode kernel vs the XLA
oracle (ops.attention einsum path), including GQA and pad-and-mask, and
gradient flow through the kernel's custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.ops.attention import attention
from accessory_tpu.ops.flash_attention import flash_attention_tpu


def _mk(b=2, s=256, nq=4, nkv=2, hd=128, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.standard_normal((b, s, nq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, nkv, hd)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("nkv", [2, 4])
def test_splash_matches_oracle(nkv):
    q, k, v = _mk(nkv=nkv)
    want = attention(q, k, v, causal=True)
    got = flash_attention_tpu(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_splash_pad_and_mask():
    """Non-128-multiple sequence: end-padding must be exact under the
    causal mask (the SPHINX multimodal splice regime)."""
    q, k, v = _mk(s=323 - 67, seed=3)  # 256 is a multiple; use 200
    q, k, v = q[:, :200], k[:, :200], v[:, :200]
    want = attention(q, k, v, causal=True)
    got = flash_attention_tpu(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_splash_grads_flow():
    q, k, v = _mk(s=128, seed=5)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v) ** 2)

    g_want = jax.grad(
        lambda q: loss(lambda *a: attention(*a, causal=True), q, k, v))(q)
    g_got = jax.grad(
        lambda q: loss(lambda *a: flash_attention_tpu(
            *a, causal=True, interpret=True), q, k, v))(q)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=5e-3, atol=5e-3)


def test_splash_384_block_divisibility():
    """128-multiple-but-not-256 length (SPHINX prefill's 384): the block
    size must divide the padded length — regression for the
    q_block_size=256-vs-384 crash found on chip (r4)."""
    q, k, v = _mk(s=384, seed=5)
    want = attention(q, k, v, causal=True)
    got = flash_attention_tpu(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
