"""Quantization format tests: pack/unpack roundtrip, dequant error bounds,
matmul consistency, blocklist behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.quant.qtensor import (
    pack_int, unpack_int, quantize_weight, dequantize_weight, quant_matmul,
)
from accessory_tpu.quant.quantize import quantize_params, DEFAULT_BLOCKLIST
from accessory_tpu.quant import QuantizedWeight


@pytest.mark.parametrize("bits", [4, 3])
def test_pack_unpack_roundtrip(bits):
    rs = np.random.RandomState(0)
    q = rs.randint(0, 2 ** bits, size=(130, 8)).astype(np.int32)
    packed = pack_int(jnp.asarray(q), bits)
    got = unpack_int(packed, bits, 130)
    np.testing.assert_array_equal(np.asarray(got), q)


@pytest.mark.parametrize("bits,tol", [(4, 0.04), (3, 0.08)])
def test_quantize_dequantize_error(bits, tol):
    rs = np.random.RandomState(1)
    w = rs.randn(256, 64).astype(np.float32) * 0.02
    qw = quantize_weight(jnp.asarray(w), bits=bits, group_size=64, act_dtype=jnp.float32)
    wd = np.asarray(dequantize_weight(qw, jnp.float32))
    # max error bounded by half a quantization step per group
    step = (w.reshape(4, 64, 64).max(1) - w.reshape(4, 64, 64).min(1)) / (2 ** bits - 1)
    err = np.abs(wd - w).reshape(4, 64, 64).max(1)
    assert (err <= step * 0.51 + 1e-6).all()
    assert np.abs(wd - w).mean() < tol * 0.02 * 10


def test_quant_matmul_matches_dequant_dot():
    rs = np.random.RandomState(2)
    w = rs.randn(256, 128).astype(np.float32) * 0.05
    x = rs.randn(3, 256).astype(np.float32)
    qw = quantize_weight(jnp.asarray(w), bits=4, group_size=128, act_dtype=jnp.float32)
    got = quant_matmul(jnp.asarray(x), qw, use_pallas=False)
    want = x @ np.asarray(dequantize_weight(qw, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_quantize_params_respects_blocklist():
    params = {
        "tok_embeddings": {"weight": jnp.ones((128, 64))},
        "layers": {"attention": {"wq": {"weight": jnp.ones((2, 128, 64))}}},
        "norm": {"weight": jnp.ones((64,))},
        "output": {"weight": jnp.ones((128, 64))},
    }
    qp = quantize_params(params, bits=4, group_size=64)
    assert isinstance(qp["tok_embeddings"]["weight"], jnp.ndarray)
    assert isinstance(qp["norm"]["weight"], jnp.ndarray)
    assert isinstance(qp["output"]["weight"], jnp.ndarray)  # default: kept dense
    assert isinstance(qp["layers"]["attention"]["wq"]["weight"], QuantizedWeight)
    # stacked-layer quant: leading layer axis preserved on packed data
    qw = qp["layers"]["attention"]["wq"]["weight"]
    assert qw.packed.shape[0] == 2


def test_w3_nibble_pack_fast_path():
    """W3 values (3-bit grid) stored in nibble containers: exact W3 accuracy
    on the W4 kernel fast path."""
    import jax

    from accessory_tpu.quant.qtensor import (
        dequantize_weight, quantize_weight)

    w = jax.random.normal(jax.random.PRNGKey(0), (128, 128), jnp.float32) * 0.05
    q3 = quantize_weight(w, bits=3, group_size=32, act_dtype=jnp.float32)
    q3n = quantize_weight(w, bits=3, group_size=32, act_dtype=jnp.float32,
                          nibble_pack=True)
    # same 3-bit grid, different containers
    d3 = np.asarray(dequantize_weight(q3, jnp.float32))
    d3n = np.asarray(dequantize_weight(q3n, jnp.float32))
    np.testing.assert_allclose(d3, d3n, rtol=1e-6, atol=1e-7)
    # nibble container is kernel-eligible storage (bits=4)
    assert q3n.bits == 4 and q3.bits == 3


def test_fuse_for_decode_parity():
    """Fused wqkv/w13 decode weights produce bit-identical outputs (the
    fusion is a pure output-axis concatenation; quant groups run along K)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama
    from accessory_tpu.quant import quantize_params
    from accessory_tpu.quant.fuse import fuse_for_decode

    args = LLaMAArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     vocab_size=128, multiple_of=16, max_seq_len=64,
                     dtype="float32")
    params = llama.init_params(jax.random.PRNGKey(0), args)
    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, 128, (2, 8)), jnp.int32)

    for tree in (params, quantize_params(params, bits=4, group_size=16,
                                         layout="std")):
        fused = fuse_for_decode(tree)
        assert "wqkv" in fused["layers"]["attention"]
        assert "w13" in fused["layers"]["feed_forward"]
        a, _ = llama.forward(tree, args, toks)
        b, _ = llama.forward(fused, args, toks)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # decode step through the cache path
    q = quantize_params(params, bits=4, group_size=16, layout="std")
    cache = llama.init_kv_cache(args, 2)
    l1, c1 = llama.forward(q, args, toks[:, :1], cache=cache, cur_pos=0)
    l2, c2 = llama.forward(fuse_for_decode(q), args, toks[:, :1],
                           cache=cache, cur_pos=0)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(c1["k"]), np.asarray(c2["k"]))


def test_fuse_skips_peft_and_mixed():
    """LoRA-bearing projections and mixed quant/dense trees stay unfused."""
    import jax

    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama
    from accessory_tpu.quant.fuse import fuse_for_decode

    args = LLaMAArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     vocab_size=128, multiple_of=16, max_seq_len=64,
                     dtype="float32", lora_rank=4)
    params = llama.init_params(jax.random.PRNGKey(0), args)
    fused = fuse_for_decode(params)
    att = fused["layers"]["attention"]
    assert "wqkv" not in att and "wq" in att
    assert "w13" not in fused["layers"]["feed_forward"]
