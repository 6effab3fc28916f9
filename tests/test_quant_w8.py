"""W8A16 int8 quantized linears: layout repack, kernel-vs-oracle parity,
fused prologue/epilogues, quantize_params integration.

Reference role: bitsandbytes ``Linear8bitLt`` 8-bit quantized linears
(accessory/util/quant.py:18-93) — the higher-fidelity sibling of the W4
serving path (2x the bytes, ~16x finer grid).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.ops.quant_matmul_w8 import w8_qmm
from accessory_tpu.quant.qtensor import (QuantizedWeight, dequantize_weight,
                                         quant_matmul, quantize_weight,
                                         to_w8_layout)


def _mk(k=256, n=256, gs=64, seed=0):
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    qw = quantize_weight(w, bits=8, group_size=gs, act_dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, k)), jnp.float32)
    return x, w, qw


def test_w8_quantization_error_small():
    """8-bit grid error ~16x below the W4 grid on the same weight."""
    _, w, qw = _mk()
    qw4 = quantize_weight(w, bits=4, group_size=64, act_dtype=jnp.float32)
    e8 = np.abs(np.asarray(dequantize_weight(qw) - w)).max()
    e4 = np.abs(np.asarray(dequantize_weight(qw4) - w)).max()
    assert e8 < e4 / 8


def test_w8_layout_roundtrip():
    """to_w8_layout packs q-128 int8 rows and folds zeros*scales such that
    q8*s - zs reproduces the std dequant exactly."""
    _, w, qw = _mk()
    q8 = to_w8_layout(qw)
    assert q8.layout == "w8" and q8.packed.dtype == jnp.int8
    gs = q8.group_size
    qf = np.asarray(q8.packed, np.float32).reshape(-1, gs, q8.out_dim)
    deq = qf * np.asarray(q8.scales)[:, None, :] \
        - np.asarray(q8.zeros)[:, None, :]
    want = np.asarray(dequantize_weight(qw))
    np.testing.assert_allclose(deq.reshape(want.shape), want,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gs", [64, 128])
def test_w8_kernel_matches_oracle(gs):
    x, w, qw = _mk(gs=gs, seed=1)
    q8 = to_w8_layout(qw)
    want = x @ dequantize_weight(qw)
    got = w8_qmm(x, q8.packed, q8.scales, q8.zeros,
                 group_size=gs, tk=q8.tile_k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_w8_dispatch_and_fusions():
    """quant_matmul routes the w8 layout; norm prologue + residual epilogue
    match the unfused ops."""
    from accessory_tpu.ops.norms import rms_norm

    x, w, qw = _mk(seed=2)
    q8 = to_w8_layout(qw)
    nw = jnp.asarray(np.random.RandomState(3).standard_normal((256,)),
                     jnp.float32)
    res = jnp.asarray(np.random.RandomState(4).standard_normal((4, 256)),
                      jnp.float32)

    want = res + rms_norm(x, nw, 1e-5) @ dequantize_weight(qw)
    got = quant_matmul(x, q8, norm_weight=nw, residual=res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_w8_rope_epilogue_matches_flat_oracle():
    from accessory_tpu.ops.rope import (apply_rope_flat, precompute_rope,
                                        rope_rows)

    hd, nq, nkv = 64, 2, 1
    n = (nq + 2 * nkv) * hd  # fused wqkv out width
    x, w, qw = _mk(k=256, n=n, seed=5)
    q8 = to_w8_layout(qw)
    cos, sin = precompute_rope(hd, 32)
    cr, sr = rope_rows(cos[7], sin[7], nq + nkv, nkv, hd, "interleaved")

    flat = x @ dequantize_weight(qw)
    want = apply_rope_flat(flat, cr, sr, "interleaved", hd)
    got = quant_matmul(x, q8, rope=(cr, sr, "interleaved", hd))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_quantize_params_w8_layout():
    from accessory_tpu.quant.quantize import quantize_params

    params = {"layers": {"attention": {"wq": {
        "weight": jnp.ones((256, 256), jnp.float32)}}}}
    qp = quantize_params(params, bits=8, layout="w8")
    qw = qp["layers"]["attention"]["wq"]["weight"]
    assert isinstance(qw, QuantizedWeight)
    assert qw.layout == "w8" and qw.bits == 8


def test_w8_end_to_end_model_decode():
    """A small llama quantized W8 decodes close to the fp baseline."""
    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama
    from accessory_tpu.quant.quantize import quantize_params

    args = LLaMAArgs(dim=128, n_layers=2, n_heads=4, n_kv_heads=2,
                     vocab_size=128, multiple_of=16, max_seq_len=64,
                     dtype="float32")
    params = llama.init_params(jax.random.key(0), args)
    toks = jnp.ones((1, 4), jnp.int32)

    base, _ = llama.forward(params, args, toks,
                            cache=llama.init_kv_cache(args, 1), cur_pos=0)
    qp = quantize_params(params, bits=8, group_size=64, layout="w8")
    got, _ = llama.forward(qp, args, toks,
                           cache=llama.init_kv_cache(args, 1), cur_pos=0)
    d = np.abs(np.asarray(got) - np.asarray(base)).max()
    assert d < 0.05, d
