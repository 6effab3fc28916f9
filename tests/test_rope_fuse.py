"""Fused decode-RoPE epilogue: rope_rows/apply_rope_flat oracle vs
apply_rope, planes-kernel epilogue vs the XLA oracle, and full-model
decode parity fused vs unfused.

Reference RoPE: accessory/model/LLM/llama.py precompute_freqs_cis /
apply_rotary_emb (interleaved) and falcon.py:47-54 (half/neox).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.ops.rope import (apply_rope, apply_rope_flat,
                                    precompute_rope, rope_rows)


@pytest.mark.parametrize("style", ["interleaved", "half"])
def test_rope_rows_matches_apply_rope(style):
    b, nq, nkv, hd = 2, 4, 2, 64
    pos = 9
    cos, sin = precompute_rope(hd, 32)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, 1, nq, hd), jnp.float32)
    k = jnp.asarray(rng.randn(b, 1, nkv, hd), jnp.float32)
    v = jnp.asarray(rng.randn(b, 1, nkv, hd), jnp.float32)

    q_ref = apply_rope(q, cos[pos:pos + 1], sin[pos:pos + 1], style)
    k_ref = apply_rope(k, cos[pos:pos + 1], sin[pos:pos + 1], style)

    cr, sr = rope_rows(cos[pos], sin[pos], nq + nkv, nkv, hd, style)
    flat = jnp.concatenate([q.reshape(b, 1, -1), k.reshape(b, 1, -1),
                            v.reshape(b, 1, -1)], axis=-1)
    out = apply_rope_flat(flat, cr, sr, style, hd)
    qo = out[..., :nq * hd].reshape(b, 1, nq, hd)
    ko = out[..., nq * hd:(nq + nkv) * hd].reshape(b, 1, nkv, hd)
    vo = out[..., (nq + nkv) * hd:].reshape(b, 1, nkv, hd)
    np.testing.assert_allclose(np.asarray(qo), np.asarray(q_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ko), np.asarray(k_ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(vo), np.asarray(v))  # untouched


@pytest.mark.parametrize("style", ["interleaved", "half"])
def test_planes_kernel_rope_epilogue(style):
    """Kernel epilogue (interpret mode) == matmul + apply_rope_flat."""
    from accessory_tpu.quant.qtensor import (quantize_weight, quant_matmul,
                                             to_planes_layout)

    hd, nq, nkv, dim = 64, 4, 2, 256
    n = (nq + 2 * nkv) * hd
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(dim, n) * 0.05, jnp.float32)
    qw = to_planes_layout(quantize_weight(w, bits=4, group_size=128))
    x = jnp.asarray(rng.randn(8, dim), jnp.float32)
    cos, sin = precompute_rope(hd, 32)
    cr, sr = rope_rows(cos[5], sin[5], nq + nkv, nkv, hd, style)

    base = quant_matmul(x, qw)
    ref = apply_rope_flat(base, cr, sr, style, hd)
    out = quant_matmul(x, qw, rope=(cr, sr, style, hd))
    # kernel rotates the f32 accumulator BEFORE the bf16 cast; the oracle
    # rotates after — differences are one bf16 ulp of the output scale
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2 * float(np.abs(np.asarray(ref, np.float32)).max()) / 256,
        rtol=0.02)
    # pass-through (v) columns are bit-identical
    np.testing.assert_array_equal(
        np.asarray(out, np.float32)[:, (nq + nkv) * hd:],
        np.asarray(base, np.float32)[:, (nq + nkv) * hd:])


def test_model_decode_rope_fuse_parity(monkeypatch):
    """Quantized fused-wqkv decode: rope fold on vs off — same logits."""
    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama
    from accessory_tpu.quant import quantize_params
    from accessory_tpu.quant.fuse import fuse_for_decode

    args = LLaMAArgs(dim=128, n_layers=2, n_heads=4, n_kv_heads=2,
                     vocab_size=128, multiple_of=32, max_seq_len=128,
                     dtype="float32")
    params = fuse_for_decode(quantize_params(
        llama.init_params(jax.random.PRNGKey(0), args), group_size=64))
    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, 128, (2, 8)), jnp.int32)

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("ACCESSORY_ROPE_FUSE", flag)
        cache = llama.init_kv_cache(args, 2, max_len=128)
        logits, cache = llama.forward(params, args, toks, cache=cache,
                                      cur_pos=0)
        d, cache = llama.forward(params, args, toks[:, :1], cache=cache,
                                 cur_pos=8)
        outs[flag] = (np.asarray(d), np.asarray(cache["k"]))
    np.testing.assert_allclose(outs["0"][0], outs["1"][0],
                               atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(outs["0"][1], outs["1"][1],
                               atol=3e-4, rtol=3e-4)
