"""Fused FFN decode kernel (w13 → SwiGLU → w2 in one pallas call) parity
vs the unfused planes chain, interpret mode. See ops/ffn_fused.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.ops.ffn_fused import ffn_fusible, ffn_qmm
from accessory_tpu.ops.quant_matmul_planes import planes_qmm
from accessory_tpu.quant.qtensor import QuantizedWeight
from accessory_tpu.quant.quantize import quantize_weight

GS = 64


def _q(rng, k, n, tk):
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
    qw = quantize_weight(w, bits=4, group_size=GS, act_dtype=jnp.float32)
    import dataclasses

    from accessory_tpu.ops.quant_matmul_planes import repack_for_planes

    if qw.layout != "planes":
        qw = dataclasses.replace(
            qw, packed=repack_for_planes(qw.packed, k, tk),
            zeros=(qw.zeros * qw.scales).astype(qw.scales.dtype),
            layout="planes", tile_k=tk)
    else:
        qw = dataclasses.replace(qw, tile_k=tk)
    return qw


@pytest.mark.parametrize("k,ffn,n2,tk1,tk2", [
    (256, 512, 256, 256, 512),   # nk1=1, nk2=1, bdiag path
    (512, 512, 512, 256, 256),   # nk1=2, nk2=2 (the 7B-like multi-k-tile)
])
def test_ffn_fused_matches_unfused(k, ffn, n2, tk1, tk2):
    rng = np.random.RandomState(0)
    qw13 = _q(rng, k, 2 * ffn, tk1)
    qw2 = _q(rng, ffn, n2, tk2)
    x = jnp.asarray(rng.standard_normal((8, k)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((8, n2)), jnp.float32)

    gu = planes_qmm(x, qw13.packed, qw13.scales, qw13.zeros,
                    group_size=GS, tk=tk1, interpret=True)
    gate = jax.nn.silu(gu[:, :ffn])
    hh = (gate * gu[:, ffn:]).astype(x.dtype)
    want = res + planes_qmm(hh, qw2.packed, qw2.scales, qw2.zeros,
                            group_size=GS, tk=tk2, interpret=True)

    got = ffn_qmm(x, qw13.packed, qw13.scales, qw13.zeros,
                  qw2.packed, qw2.scales, qw2.zeros, residual=res,
                  group_size=GS, tk1=tk1, tk2=tk2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ffn_fusible_predicate(monkeypatch):
    monkeypatch.setenv("ACCESSORY_FFN_FUSE", "1")  # default-off (chip A/B)
    rng = np.random.RandomState(1)
    qw13 = _q(rng, 256, 1024, 256)
    qw2 = _q(rng, 512, 256, 512)
    assert ffn_fusible(qw13, qw2, 8)
    assert not ffn_fusible(qw13, qw2, 512)        # prefill m
    assert not ffn_fusible(qw13, None, 8)
    # padded-K w2 (in_dim mismatch) falls back
    qw2b = _q(rng, 576 + 64, 256, 128)
    assert not ffn_fusible(qw13, qw2b, 8)
