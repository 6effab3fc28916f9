"""W4 planes dequant+matmul for LARGE m (prefill / training forward).

The decode kernel (quant_matmul_planes) re-dequantizes every weight block
once per 128-row m-tile — perfect at m=8 (weights stream once, VPU work
amortizes into the DMA shadow), but at m=2048/4096 the redundant dequant
is 16-32x the necessary VPU work and the kernel runs ~3x slower than the
MXU bound (r4 QPEFT trace: 2.0 ms for a 4096^2 W4 matmul whose dot costs
0.7).

This kernel is weight-stationary-in-VMEM: grid (nj, nm, nk) with the
k-tiles innermost; at im == 0 each (kk, j) block is dequantized ONCE into
a persistent VMEM scratch holding ALL of this j-column's k-tiles
((K, tn) bf16 — tn is sized so that fits), and every later m-tile's dot
reads the scratch. The packed/scale operands' index_maps collapse to
block 0 when im > 0 so Pallas skips their re-DMA.

Dequant math matches unpack_planes exactly: w = q * s - zs in f32, cast
to bf16 (zs = zeros * scales folded at repack, ulp(q*s)-bounded error).

Role: the reference's prefill/training path through bnb Linear4bit
(dequant-per-call, accessory/util/quant.py:116-144); the m-threshold
dispatch lives in quant_matmul (ACCESSORY_QMM_BIGM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NIBBLE_MASK = 0x0F0F0F0F

# target VMEM budget for the dequantized (K, tn) scratch (16 MB scoped
# vmem minus double-buffered operand blocks + accumulator; 8 MB OOM'd at
# K=4096 on chip)
_WDEQ_BYTES = 6 * 1024 * 1024


def bigm_supported(in_dim: int) -> bool:
    """Even the narrowest (K, 128) bf16 scratch must fit the budget —
    beyond that (K > ~24k, e.g. the 70B w2's 28672) callers must stay on
    the per-m-tile decode kernel (the r4 review caught the unguarded
    floor)."""
    return in_dim * 128 * 2 <= _WDEQ_BYTES


def _kernel(x_ref, packed_ref, scales_ref, zs_ref, out_ref, acc_ref,
            wdeq_ref, *, group_size: int, tk: int):
    j, im, kk = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)
    half = tk // 2
    gh = half // group_size
    G = tk // group_size
    tn = out_ref.shape[1]

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(im == 0)
    def _dequant():
        w32 = packed_ref[:]                        # (tk/8, tn)
        mask = jnp.uint32(_NIBBLE_MASK)
        lo8 = pltpu.bitcast(w32 & mask, jnp.int8)
        hi8 = pltpu.bitcast((w32 >> jnp.uint32(4)) & mask, jnp.int8)
        # scale rows for THIS k-tile (block spans the padded full group
        # dim; roll wanted rows to the top like the decode kernel)
        s_all = pltpu.roll(scales_ref[:].astype(jnp.float32),
                           -kk * G, 0)[:G]
        zs_all = pltpu.roll(zs_ref[:].astype(jnp.float32), -kk * G, 0)[:G]
        base = kk * tk
        for h, q8 in ((0, lo8), (1, hi8)):
            qf = q8.astype(jnp.float32).reshape(gh, group_size, tn)
            s = s_all[h * gh:(h + 1) * gh]
            zs = zs_all[h * gh:(h + 1) * gh]
            w = (qf * s[:, None, :] - zs[:, None, :]).reshape(half, tn)
            wdeq_ref[pl.ds(base + h * half, half), :] = w.astype(
                wdeq_ref.dtype)

    wd = wdeq_ref[pl.ds(kk * tk, tk), :]
    acc_ref[:] += jnp.dot(x_ref[:], wd, preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _emit():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "tk",
                                             "interpret"))
def planes_qmm_bigm(x2d, packed_planes, scales, zs, *, group_size: int,
                    tk: int, interpret: bool = False):
    """x2d (M, K) @ plane-packed W4 -> (M, N), M large (>= ~512).

    Same packed layout and numerics as planes_qmm's precise path /
    unpack_planes; no epilogue fusions (prefill/training call sites use
    the unfused composition).
    """
    m, k = x2d.shape
    n = packed_planes.shape[1]
    assert k % tk == 0 and (tk // 2) % group_size == 0, (k, tk, group_size)
    tm = 128 if m >= 128 else max(8, 1 << (m - 1).bit_length())
    pad_m = (-m) % tm
    if pad_m:
        x2d = jnp.pad(x2d, ((0, pad_m), (0, 0)))
    pad_n = (-n) % 128
    if pad_n:
        packed_planes = jnp.pad(packed_planes, ((0, 0), (0, pad_n)))
        scales = jnp.pad(scales, ((0, 0), (0, pad_n)))
        zs = jnp.pad(zs, ((0, 0), (0, pad_n)))
    npad = n + pad_n
    # tn: biggest 128-multiple divisor of npad with the (K, tn) bf16
    # scratch under budget
    tn_cap = max(128, _WDEQ_BYTES // (2 * k) // 128 * 128)
    tn = 128
    for cand in (2048, 1024, 512, 256, 128):
        if cand <= tn_cap and npad % cand == 0:
            tn = cand
            break
    pad_g = (-scales.shape[0]) % (8 if scales.dtype.itemsize == 4 else 16)
    if pad_g:
        scales = jnp.pad(scales, ((0, pad_g), (0, 0)))
        zs = jnp.pad(zs, ((0, pad_g), (0, 0)))

    grid = (npad // tn, x2d.shape[0] // tm, k // tk)
    out = pl.pallas_call(
        functools.partial(_kernel, group_size=group_size, tk=tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda j, im, kk: (im, kk),
                         memory_space=pltpu.VMEM),
            # collapse to block (0, j) when im > 0: the operand is only
            # read by the im==0 dequant, and a repeated index skips the DMA
            pl.BlockSpec((tk // 8, tn),
                         lambda j, im, kk: (kk * (im == 0), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((scales.shape[0], tn),
                         lambda j, im, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((zs.shape[0], tn),
                         lambda j, im, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda j, im, kk: (im, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2d.shape[0], npad), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32),
                        pltpu.VMEM((k, tn), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * x2d.shape[0] * k * n,
            bytes_accessed=k * n // 2 + x2d.shape[0] * k * 2
            + x2d.shape[0] * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, packed_planes, scales, zs)
    return out[:m, :n] if (pad_m or pad_n) else out


def _dequant_kernel(packed_ref, scales_ref, zs_ref, out_ref, *,
                    group_size: int, tk: int):
    kk = pl.program_id(1)
    G = tk // group_size
    half = tk // 2
    gh = half // group_size
    tn = out_ref.shape[1]
    w32 = packed_ref[:]
    mask = jnp.uint32(_NIBBLE_MASK)
    lo8 = pltpu.bitcast(w32 & mask, jnp.int8)
    hi8 = pltpu.bitcast((w32 >> jnp.uint32(4)) & mask, jnp.int8)
    s_all = pltpu.roll(scales_ref[:].astype(jnp.float32), -kk * G, 0)[:G]
    zs_all = pltpu.roll(zs_ref[:].astype(jnp.float32), -kk * G, 0)[:G]
    for h, q8 in ((0, lo8), (1, hi8)):
        qf = q8.astype(jnp.float32).reshape(gh, group_size, tn)
        s = s_all[h * gh:(h + 1) * gh]
        zs = zs_all[h * gh:(h + 1) * gh]
        w = (qf * s[:, None, :] - zs[:, None, :]).reshape(half, tn)
        out_ref[pl.ds(h * half, half), :] = w.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "tk", "dtype",
                                             "interpret"))
def planes_dequant(packed_planes, scales, zs, *, group_size: int, tk: int,
                   dtype=jnp.bfloat16, interpret: bool = False):
    """Planes-packed W4 -> dense (K, N) in ONE pass (bitcast + cast + FMA
    + store, ~stream rate). Replaces the XLA unpack chain
    (quant_matmul_planes.unpack_planes: stacked shifts/concats that
    materialize several (K, N)-sized intermediates) where speed matters —
    the QPEFT backward's dense_weight call per frozen matmul per step.
    Same numerics as unpack_planes (q*s - zs in f32, cast once)."""
    kdiv8, n = packed_planes.shape
    k = kdiv8 * 8
    assert k % tk == 0, (k, tk)
    pad_n = (-n) % 128
    if pad_n:
        packed_planes = jnp.pad(packed_planes, ((0, 0), (0, pad_n)))
        scales = jnp.pad(scales, ((0, 0), (0, pad_n)))
        zs = jnp.pad(zs, ((0, 0), (0, pad_n)))
    npad = n + pad_n
    # out block (tk, tn) bf16 is double-buffered — cap it at ~1 MB so the
    # block set stays inside scoped VMEM (chip OOM at tk=1024/tn=2048:
    # 17.03M > 16M)
    tn_cap = max(128, (1 << 19) // tk // 128 * 128)
    tn = next(c for c in (2048, 1024, 512, 256, 128)
              if c <= tn_cap and npad % c == 0)
    pad_g = (-scales.shape[0]) % (8 if scales.dtype.itemsize == 4 else 16)
    if pad_g:
        scales = jnp.pad(scales, ((0, pad_g), (0, 0)))
        zs = jnp.pad(zs, ((0, pad_g), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_dequant_kernel, group_size=group_size, tk=tk),
        grid=(npad // tn, k // tk),
        in_specs=[
            pl.BlockSpec((tk // 8, tn), lambda j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((scales.shape[0], tn), lambda j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((zs.shape[0], tn), lambda j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tk, tn), lambda j, kk: (kk, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, npad), dtype),
        interpret=interpret,
    )(packed_planes, scales, zs)
    return out[:, :n] if pad_n else out
