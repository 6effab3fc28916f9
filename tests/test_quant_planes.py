"""Int8-staged nibble-plane W4 kernel (ops/quant_matmul_planes.py) vs XLA
reference — interpret mode on CPU; the real-TPU numbers are in
BENCHMARKS.md (562 GB/s effective vs 379 for the v1 kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.ops.quant_matmul_planes import (
    choose_tile_k, planes_qmm, repack_for_planes)
from accessory_tpu.quant.qtensor import (
    QuantizedWeight, dequantize_weight, quant_matmul, quantize_weight,
    to_planes_layout)


def _mk(k, n, gs, seed=0, act=jnp.float32):
    kx, kw = jax.random.split(jax.random.PRNGKey(seed))
    w = jax.random.normal(kw, (k, n), jnp.float32) * k ** -0.5
    qw = quantize_weight(w, bits=4, group_size=gs, act_dtype=act)
    return qw


@pytest.mark.parametrize("group_dot", [False, True, "bdiag"])
@pytest.mark.parametrize("m,k,n,gs", [(8, 512, 128, 128), (8, 1024, 256, 128),
                                      (16, 512, 256, 64), (100, 512, 384, 128)])
def test_planes_matches_xla_reference(m, k, n, gs, group_dot):
    qw = _mk(k, n, gs)
    qp = to_planes_layout(qw)
    assert qp.layout == "planes" and qp.tile_k > 0
    x = jax.random.normal(jax.random.PRNGKey(7), (m, k), jnp.float32)
    ref = jnp.dot(x, dequantize_weight(qw, jnp.float32))
    out = planes_qmm(x, qp.packed, qp.scales, qp.zeros,
                     group_size=gs, tk=qp.tile_k, group_dot=group_dot,
                     interpret=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-2, atol=scale * 1e-2)


def test_planes_group_dot_epilogues_match_fused_path():
    """group_dot with norm/residual fusions agrees with the per-element
    path (the epilogues are acc-level, independent of the dot split)."""
    qw = _mk(512, 256, 128)
    qp = to_planes_layout(qw)
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 512), jnp.float32)
    nw = jax.random.normal(jax.random.PRNGKey(6), (512,), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(8), (8, 256), jnp.float32)
    outs = [planes_qmm(x, qp.packed, qp.scales, qp.zeros, norm_weight=nw,
                       residual=res, group_size=128, tk=qp.tile_k,
                       group_dot=gd, interpret=True) for gd in (False, True)]
    scale = float(jnp.abs(outs[0]).max())
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                               rtol=1e-2, atol=scale * 1e-2)


def test_planes_bf16_epilogue_close():
    qw = _mk(512, 256, 128)
    qp = to_planes_layout(qw)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 512), jnp.float32)
    ref = jnp.dot(x, dequantize_weight(qw, jnp.float32))
    out = planes_qmm(x, qp.packed, qp.scales, qp.zeros, group_size=128,
                     tk=qp.tile_k, precise=False, interpret=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-2, atol=scale * 3e-2)


def test_repack_roundtrip_layout():
    """The plane packing is a pure permutation: unpacking planes per the
    documented mapping recovers every nibble."""
    from accessory_tpu.quant.qtensor import pack_int, unpack_int

    rng = np.random.RandomState(0)
    K, N, TK = 256, 128, 64
    q = rng.randint(0, 16, (K, N))
    packed = pack_int(jnp.asarray(q), 4)
    planes = np.asarray(repack_for_planes(packed, K, TK))
    # manual unpack: word w of tile t, byte b, low nibble -> row t*TK + 4w+b
    got = np.zeros((K, N), np.int64)
    wpt = TK // 8
    for t in range(K // TK):
        for w in range(wpt):
            word = planes[t * wpt + w]
            for b in range(4):
                got[t * TK + 4 * w + b] = (word >> (8 * b)) & 0xF
                got[t * TK + TK // 2 + 4 * w + b] = (word >> (8 * b + 4)) & 0xF
    np.testing.assert_array_equal(got, q)


def test_quant_matmul_dispatches_planes():
    qw = _mk(512, 128, 128)
    qp = to_planes_layout(qw)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 512), jnp.float32)
    ref = quant_matmul(x, qw, use_pallas=False)
    out = quant_matmul(x, qp)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-2, atol=scale * 1e-2)


def test_quantize_params_planes_layout():
    from accessory_tpu.quant.quantize import quantize_params

    params = {"layers": {"w": jax.random.normal(jax.random.PRNGKey(0),
                                                (2, 256, 128)) * 0.05},
              "norm": {"weight": jnp.ones((8,))}}
    qp = quantize_params(params, group_size=64, layout="planes")
    leaf = qp["layers"]["w"]
    assert isinstance(leaf, QuantizedWeight)
    assert leaf.layout == "planes" and leaf.packed.shape[0] == 2


def test_choose_tile_k():
    assert choose_tile_k(4096, 128) == 2048
    assert choose_tile_k(11264, 128) == 1024
    assert choose_tile_k(512, 128) == 512
    assert choose_tile_k(64, 16) == 64


def test_planes_norm_residual_fusion_bit_identical():
    """Fused RMSNorm prologue / residual epilogue == the unfused op chain
    (float-exact up to f32 reduction association in the norm; the residual
    epilogue is bit-identical)."""
    from accessory_tpu.ops.norms import rms_norm

    k, n, gs = 512, 256, 128
    qw = _mk(k, n, gs)
    qp = to_planes_layout(qw)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, k), jnp.float32)
    g = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(4), (k,), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(5), (8, n), jnp.float32)

    base = lambda xx: planes_qmm(xx, qp.packed, qp.scales, qp.zeros,
                                 group_size=gs, tk=qp.tile_k, interpret=True)
    # norm prologue (requires K == tk)
    assert qp.tile_k == k
    fused = planes_qmm(x, qp.packed, qp.scales, qp.zeros, g,
                       group_size=gs, tk=qp.tile_k, norm_eps=1e-5,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(fused),
                               np.asarray(base(rms_norm(x, g, 1e-5))),
                               atol=1e-5, rtol=1e-5)
    # residual epilogue
    fused_r = planes_qmm(x, qp.packed, qp.scales, qp.zeros, None, res,
                         group_size=gs, tk=qp.tile_k, interpret=True)
    np.testing.assert_array_equal(np.asarray(fused_r),
                                  np.asarray(res + base(x)))
    # both at once
    both = planes_qmm(x, qp.packed, qp.scales, qp.zeros, g, res,
                      group_size=gs, tk=qp.tile_k, norm_eps=1e-5,
                      interpret=True)
    np.testing.assert_allclose(
        np.asarray(both), np.asarray(res + base(rms_norm(x, g, 1e-5))),
        atol=1e-5, rtol=1e-5)


def test_planes_residual_multi_ktile():
    """Residual epilogue lands once (at the last k-tile) with tk < K."""
    k, n, gs = 1024, 256, 128
    qw = _mk(k, n, gs)
    qp = to_planes_layout(qw, max_tk=512)
    assert qp.tile_k == 512 and k // qp.tile_k == 2
    x = jax.random.normal(jax.random.PRNGKey(6), (8, k), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(7), (8, n), jnp.float32)
    plain = planes_qmm(x, qp.packed, qp.scales, qp.zeros,
                       group_size=gs, tk=qp.tile_k, interpret=True)
    fused = planes_qmm(x, qp.packed, qp.scales, qp.zeros, None, res,
                       group_size=gs, tk=qp.tile_k, interpret=True)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(res + plain))


def test_module_linear_nr_fallbacks():
    """module_linear_nr on dense / lora modules == unfused chain."""
    from accessory_tpu.ops.linear import module_linear, module_linear_nr
    from accessory_tpu.ops.norms import rms_norm

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 32), jnp.float32)
    g = jnp.ones((64,))
    res = jnp.ones((4, 32))
    mod = {"weight": w}
    want = res + module_linear(rms_norm(x, g, 1e-5), mod)
    got = module_linear_nr(x, mod, norm={"weight": g}, residual=res)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_planes_out_dim_below_lane_tile():
    """out_dim < 128 (tiny-model kv projections) pads N instead of
    silently emitting zero j-programs (uninitialized output)."""
    import numpy as np

    from accessory_tpu.quant.qtensor import (dequantize_weight,
                                             quant_matmul, quantize_weight,
                                             to_planes_layout)

    rng = np.random.RandomState(7)
    w = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
    qw = quantize_weight(w, bits=4, group_size=64, act_dtype=jnp.float32)
    got = quant_matmul(x, to_planes_layout(qw))
    want = x @ dequantize_weight(qw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_unpack_planes_matches_std_dequant():
    """Device-side planes unpack+dequant == std-layout dequantize_weight."""
    import numpy as np

    from accessory_tpu.ops.quant_matmul_planes import unpack_planes
    from accessory_tpu.quant.qtensor import (dequantize_weight,
                                             quantize_weight,
                                             to_planes_layout)

    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.standard_normal((512, 256)), jnp.float32)
    qw = quantize_weight(w, bits=4, group_size=64, act_dtype=jnp.float32)
    qp = to_planes_layout(qw)
    got = unpack_planes(qp.packed, qp.in_dim, qp.tile_k, qp.group_size,
                        qp.scales, qp.zeros, dtype=jnp.float32)
    want = dequantize_weight(qw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dense_m_dispatch_matches_kernel(monkeypatch):
    """ACCESSORY_QMM_DENSE_M large-m path == kernel path (incl. fusions)."""
    import numpy as np

    from accessory_tpu.ops.norms import rms_norm
    from accessory_tpu.quant.qtensor import (quant_matmul, quantize_weight,
                                             to_planes_layout)

    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((300, 256)), jnp.float32)
    nw = jnp.asarray(rng.standard_normal((256,)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((300, 256)), jnp.float32)
    qp = to_planes_layout(
        quantize_weight(w, bits=4, group_size=64, act_dtype=jnp.float32))

    want = quant_matmul(x, qp, norm_weight=nw, residual=res)
    monkeypatch.setenv("ACCESSORY_QMM_DENSE_M", "256")
    got = quant_matmul(x, qp, norm_weight=nw, residual=res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_quant_matmul_grad_through_kernel():
    """QPEFT backward: dL/dx crosses the frozen quantized matmul via the
    custom_vjp (kernel forward, XLA dequant transpose backward). Without
    it, training any PEFT model on TPU dies in the Pallas transpose rule
    (reference role: LoRA over bnb Linear4bit, peft.py:23-268)."""
    from accessory_tpu.quant.qtensor import dense_weight, to_w8_layout
    from accessory_tpu.quant.quantize import quantize_weight as _qweight

    k, n, gs = 512, 256, 128
    x = jax.random.normal(jax.random.PRNGKey(11), (16, k), jnp.float32)
    g_out = jax.random.normal(jax.random.PRNGKey(12), (16, n), jnp.float32)

    for mk in (lambda: to_planes_layout(_mk(k, n, gs, act=jnp.float32)),
               lambda: _mk_w8(k, n, gs)):
        qp = mk()

        def loss(xx):
            return jnp.sum(quant_matmul(xx, qp) * g_out)

        dx = jax.grad(loss)(x)
        w = dense_weight(qp, jnp.float32)
        ref = g_out @ w.T
        np.testing.assert_allclose(np.asarray(dx), np.asarray(ref),
                                   rtol=2e-2, atol=float(
                                       jnp.abs(ref).max()) * 2e-2)


def _mk_w8(k, n, gs, seed=0):
    from accessory_tpu.quant.qtensor import quantize_weight, to_w8_layout

    w = jax.random.normal(jax.random.PRNGKey(seed), (k, n),
                          jnp.float32) * k ** -0.5
    return to_w8_layout(quantize_weight(w, bits=8, group_size=gs,
                                        act_dtype=jnp.float32))


def test_scale_store_dtype_rejects_f16():
    """Since r4 the kernels stream scales in their stored dtype and Mosaic
    has no f16 lowering — requesting float16 storage must fail loudly at
    layout time, not at kernel lowering."""
    from accessory_tpu.quant.qtensor import _scale_store_dtype

    with pytest.raises(ValueError, match="float16"):
        _scale_store_dtype("float16")


@pytest.mark.parametrize("sd", ["bfloat16"])
def test_planes_f16_scales_numerics(sd):
    """bf16 scale storage (ACCESSORY_SCALES_DTYPE): kernel math stays
    f32, so the only delta vs f32 storage is the scale rounding itself.
    (f16 storage is rejected — Mosaic has no f16 lowering; see
    test_scale_store_dtype_rejects_f16.)"""
    qw = _mk(512, 256, 128)
    # make scales exactly representable in the storage dtype
    s16 = qw.scales.astype(jnp.dtype(sd)).astype(jnp.float32)
    qw = QuantizedWeight(qw.packed, s16, qw.zeros, qw.bits, qw.group_size,
                         qw.in_dim, qw.out_dim, qw.act_dtype, qw.layout,
                         qw.tile_k)
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 512), jnp.float32)
    ref = quant_matmul(x, to_planes_layout(qw))  # f32-stored
    qp16 = to_planes_layout(qw, scale_dtype=sd)
    assert qp16.scales.dtype == jnp.dtype(sd)
    got = quant_matmul(x, qp16)
    # zs = z*s re-rounds once in storage; f16 keeps 10 mantissa bits
    # (tight), bf16 only 7 (z in [0,15] -> ~0.4% per-element worst case)
    tol = 5e-3 if sd == "float16" else 2e-2
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=tol, atol=scale * tol)


def test_bigm_matches_dense_reference():
    """planes_qmm_bigm (weight-stationary large-m kernel) vs the dense
    unpack_planes reference, incl. padded m/n, multi-k-tile, and the
    64-group-size path."""
    from accessory_tpu.ops.quant_matmul_bigm import planes_qmm_bigm
    from accessory_tpu.ops.quant_matmul_planes import unpack_planes

    for k, n, gs, m in ((1024, 256, 128, 256), (1024, 384, 64, 100),
                        (2048, 512, 128, 1024)):
        qw = _mk(k, n, gs)
        qp = to_planes_layout(qw)
        x = jax.random.normal(jax.random.PRNGKey(11), (m, k), jnp.float32)
        w = unpack_planes(qp.packed, k, qp.tile_k, gs, qp.scales, qp.zeros,
                          dtype=jnp.float32)
        ref = x @ w
        got = planes_qmm_bigm(x, qp.packed, qp.scales, qp.zeros,
                              group_size=gs, tk=qp.tile_k, interpret=True)
        scale = float(jnp.abs(ref).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-2, atol=scale * 1e-2)


def test_replan_tiles_roundtrip_bitexact():
    """fuse._replan_tiles_np must equal a direct repack at the new tile
    size, bit for bit (the retile path runs default-on in
    fuse_for_decode)."""
    from accessory_tpu.ops.quant_matmul_planes import repack_for_planes
    from accessory_tpu.quant.fuse import _replan_tiles_np
    from accessory_tpu.quant.qtensor import pack_int

    rng = np.random.RandomState(3)
    k, n = 2048, 384
    q = rng.randint(0, 16, (k, n))
    std = pack_int(jnp.asarray(q), 4)
    for tk_old, tk_new in ((2048, 1024), (2048, 512), (512, 2048)):
        a = np.asarray(repack_for_planes(std, k, tk_new))
        b = _replan_tiles_np(np.asarray(repack_for_planes(std, k, tk_old)),
                             k, tk_old, tk_new)
        assert (a == np.asarray(b)).all(), (tk_old, tk_new)


def test_bigm_dispatch_guard_large_k():
    """bigm_supported rejects K where even a (K, 128) scratch exceeds the
    VMEM budget (70B w2's 28672)."""
    from accessory_tpu.ops.quant_matmul_bigm import bigm_supported

    assert bigm_supported(11008)
    assert not bigm_supported(28672)


def test_planes_dequant_kernel_matches_unpack():
    """One-pass Pallas dequant (QPEFT-backward path) is bit-identical to
    unpack_planes."""
    from accessory_tpu.ops.quant_matmul_bigm import planes_dequant
    from accessory_tpu.ops.quant_matmul_planes import unpack_planes

    for k, n, gs in ((1024, 256, 128), (512, 384, 64)):
        qw = _mk(k, n, gs)
        qp = to_planes_layout(qw)
        ref = unpack_planes(qp.packed, k, qp.tile_k, gs, qp.scales,
                            qp.zeros)
        got = planes_dequant(qp.packed, qp.scales, qp.zeros, group_size=gs,
                             tk=qp.tile_k, interpret=True)
        # q*s - zs may compile to fma in one path and mul+sub in the
        # other — 1-ulp f32 differences surface as ~1e-8 absolute noise
        # on near-zero elements after the bf16 cast
        np.testing.assert_allclose(
            np.asarray(got).astype(np.float32),
            np.asarray(ref).astype(np.float32), atol=1e-6)
