"""OmniQuant/GPTQ import tests: layout conversion roundtrip against a known
dequantized weight, and installing stacked weights into a llama pytree."""

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.quant.omniquant import from_gptq, install_gptq_weights
from accessory_tpu.quant.qtensor import dequantize_weight, quantize_weight


def make_gptq(w, bits=4, gs=32):
    """Pack a float weight into GPTQ tensor layout (the format AutoGPTQ
    writes): qweight int32 packed along K, qzeros packed along N, fp16
    scales, with the +1 zero offset."""
    k, n = w.shape
    pw = 32 // bits
    qmax = 2 ** bits - 1
    wf = np.asarray(w, np.float32).reshape(k // gs, gs, n)
    wmin, wmax = wf.min(1), wf.max(1)
    scales = np.maximum((wmax - wmin) / qmax, 1e-8)
    zeros = np.clip(np.round(-wmin / scales), 0, qmax)
    q = np.clip(np.round(wf / scales[:, None]) + zeros[:, None], 0, qmax)
    q = q.reshape(k, n).astype(np.uint32)

    qweight = np.zeros((k // pw, n), np.uint32)
    for j in range(pw):
        qweight |= q[j::pw] << (bits * j)

    zq = (zeros - 1).astype(np.uint32)  # GPTQ stores z-1
    qzeros = np.zeros((k // gs, n // pw), np.uint32)
    for j in range(pw):
        qzeros |= zq[:, j::pw] << (bits * j)

    ref = (q.reshape(k // gs, gs, n) - zeros[:, None]) * scales[:, None]
    return (qweight.view(np.int32), qzeros.view(np.int32),
            scales.astype(np.float16), ref.reshape(k, n))


def test_from_gptq_matches_reference_dequant():
    w = np.random.RandomState(0).randn(64, 32).astype(np.float32) * 0.05
    qweight, qzeros, scales, ref = make_gptq(w, bits=4, gs=32)
    qw = from_gptq(qweight, qzeros, scales, bits=4, group_size=32,
                   act_dtype=jnp.float32)
    deq = np.asarray(dequantize_weight(qw, jnp.float32))
    np.testing.assert_allclose(deq, ref, rtol=1e-3, atol=1e-4)
    # and close to the original float weight (quantization error only)
    assert np.abs(deq - w).max() < np.abs(w).max() * 0.2


def test_install_stacked():
    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama

    args = LLaMAArgs(dim=32, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=64,
                     multiple_of=16, max_seq_len=16, dtype="float32")
    params = llama.init_params(jax.random.PRNGKey(0), args)
    per_layer = {}
    for i in range(2):
        w = np.asarray(params["layers"]["attention"]["wq"]["weight"][i])
        qweight, qzeros, scales, _ = make_gptq(w, bits=4, gs=16)
        per_layer[i] = from_gptq(qweight, qzeros, scales, bits=4,
                                 group_size=16, act_dtype=jnp.float32)
    params = install_gptq_weights(
        params, {"layers/attention/wq/weight": per_layer})
    qw = params["layers"]["attention"]["wq"]["weight"]
    assert qw.packed.shape[0] == 2  # stacked layer axis
    # forward still runs with the imported quantized weight
    logits, _ = llama.forward(params, args, jnp.arange(8)[None] % 64)
    assert np.isfinite(np.asarray(logits)).all()


def test_unpermute_rope_qw_matches_dense_unpermute():
    """GPTQ q/k import must undo the HF half-split rotary permutation
    (ADVICE r1): quantize an HF-permuted weight, unpermute the QW columns,
    dequantize — must equal dequantizing the HF-layout QW and unpermuting
    the dense result via the converter's mapping."""
    from accessory_tpu.quant.omniquant import unpermute_rope_qw
    from accessory_tpu.tools.convert_weights_to_hf import (
        _permute_rope, _unpermute_rope)

    n_heads, hd, in_dim = 4, 16, 64
    out_dim = n_heads * hd
    rng = np.random.RandomState(1)
    w_ours = rng.randn(out_dim, in_dim).astype(np.float32) * 0.05  # (out,in)
    w_hf = _permute_rope(w_ours, n_heads)  # what HF (and GPTQ) store

    # GPTQ quantizes the HF-layout weight in (K=in, N=out) orientation
    qweight, qzeros, scales, _ = make_gptq(w_hf.T.copy(), bits=4, gs=32)
    qw_hf = from_gptq(qweight, qzeros, scales, bits=4, group_size=32,
                      act_dtype=jnp.float32)
    qw_ours = unpermute_rope_qw(qw_hf, n_heads)

    deq_hf = np.asarray(dequantize_weight(qw_hf, jnp.float32))    # (in,out)
    deq_ours = np.asarray(dequantize_weight(qw_ours, jnp.float32))
    expect = _unpermute_rope(deq_hf.T, n_heads).T
    np.testing.assert_allclose(deq_ours, expect, rtol=1e-5, atol=1e-6)
    # and the unpermuted dequant approximates the original interleaved weight
    assert np.abs(deq_ours - w_ours.T).max() < np.abs(w_ours).max() * 0.2


def test_load_gptq_dir_requires_n_heads_for_interleaved():
    import pytest

    with pytest.raises(ValueError):
        from accessory_tpu.quant.omniquant import load_gptq_dir
        load_gptq_dir("/nonexistent")
