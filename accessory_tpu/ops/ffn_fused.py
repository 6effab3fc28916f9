"""Fused W4 FFN decode kernel: w13 → SwiGLU → w2 in ONE pallas call.

Reference role: the three Linear calls + silu of the reference FFN
(accessory/model/LLM/llama.py FeedForward.forward). TPU motivation (r5
trace budget): at decode the step is a serial chain of big kernels, and
every kernel BOUNDARY costs pipeline ramp — the same planes matmuls run
16-19 µs/call slower in-model than in a back-to-back chain. Fusing the
FFN removes one boundary per layer and keeps the (m, ffn) intermediate in
VMEM instead of round-tripping HBM.

Design: a flat sequential grid with two phases over persistent VMEM
scratch (the weight-stationary bigm kernel's collapsed-index-map trick,
ops/quant_matmul_bigm.py):

  phase A (nj13 × nk1 steps): walk w13's (k-tile, n-tile) blocks with the
    shared dequant+accumulate (`_accum_tile`); at each n-tile's last
    k-step the (tm, tn1) slab lands in the ``h`` scratch (bf16, the same
    rounding the unfused chain's HBM round-trip applies).
  phase B (nj2 × nk2 steps): per k-step build the SwiGLU tile
    silu(h1)·h3 from scratch (f32 math, cast to the act dtype exactly
    like the unfused path casts the XLA swiglu output), then
    dequant+accumulate against w2's block; emit (+ residual) at the last
    k-step.

Index maps pin the other phase's blocks to their boundary values, so no
block is DMA'd twice and w2's first block prefetches for free during
phase A. Decode-only (m ≤ 8-row tile, no autodiff — training uses the
unfused composition, same as every fused-epilogue path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from accessory_tpu.ops.quant_matmul_planes import _accum_tile


def _ffn_kernel(x_ref, p13_ref, s13_ref, z13_ref, p2_ref, s2_ref, z2_ref,
                *rest, group_size: int, tk1: int, tk2: int, nk1: int,
                nk2: int, nj13: int, tn1: int, tn2: int, ffn: int,
                precise: bool, gd13, gd2, has_res: bool):
    rest = list(rest)
    res_ref = rest.pop(0) if has_res else None
    out_ref, acc1_ref, acc2_ref, h_ref = rest

    t = pl.program_id(0)
    A = nj13 * nk1
    in_a = t < A
    kk1 = jax.lax.rem(t, nk1)
    j13 = jax.lax.div(t, nk1)
    tb = t - A
    kk2 = jax.lax.rem(tb, nk2)

    G1 = tk1 // group_size
    G2 = tk2 // group_size

    @pl.when(in_a)
    def _phase_a():
        @pl.when(kk1 == 0)
        def _():
            acc1_ref[:] = jnp.zeros_like(acc1_ref)

        g0 = kk1 * G1
        s_all = pltpu.roll(s13_ref[:].astype(jnp.float32), -g0, 0)[:G1]
        zs_all = pltpu.roll(z13_ref[:].astype(jnp.float32), -g0, 0)[:G1]
        _accum_tile(acc1_ref, x_ref[:], p13_ref[:], s_all, zs_all,
                    group_size=group_size, tk=tk1, precise=precise,
                    group_dot=gd13)

        @pl.when(kk1 == nk1 - 1)
        def _emit_h():
            off = pl.multiple_of(j13 * tn1, tn1)
            h_ref[:, pl.ds(off, tn1)] = acc1_ref[:].astype(h_ref.dtype)

    @pl.when(jnp.logical_not(in_a))
    def _phase_b():
        @pl.when(kk2 == 0)
        def _():
            acc2_ref[:] = jnp.zeros_like(acc2_ref)

        off = pl.multiple_of(kk2 * tk2, tk2)
        h1 = h_ref[:, pl.ds(off, tk2)].astype(jnp.float32)
        h3 = h_ref[:, pl.ds(ffn + off, tk2)].astype(jnp.float32)
        hh = (h1 * jax.nn.sigmoid(h1) * h3).astype(h_ref.dtype)
        g0 = kk2 * G2
        s_all = pltpu.roll(s2_ref[:].astype(jnp.float32), -g0, 0)[:G2]
        zs_all = pltpu.roll(z2_ref[:].astype(jnp.float32), -g0, 0)[:G2]
        _accum_tile(acc2_ref, hh, p2_ref[:], s_all, zs_all,
                    group_size=group_size, tk=tk2, precise=precise,
                    group_dot=gd2)

        @pl.when(kk2 == nk2 - 1)
        def _emit():
            out = acc2_ref[:].astype(out_ref.dtype)
            if has_res:
                out = res_ref[:] + out
            out_ref[:] = out


def _pick_tn(n: int, cap: int = 2048) -> int:
    for cand in (2048, 1024, 512, 256, 128):
        if cand <= cap and n % cand == 0:
            return cand
    return 128


def _pick_gd(tk: int, nk: int, tm: int, group_size: int):
    # same auto rule as planes_qmm (chip-validated in-model, r4/r5)
    gh = (tk // 2) // group_size
    return "bdiag" if gh * tm <= 128 and (gh <= 2 or nk >= 2) else False


@functools.partial(jax.jit, static_argnames=("group_size", "tk1", "tk2",
                                             "interpret"))
def ffn_qmm(x2d, p13, s13, z13, p2, s2, z2, residual=None, *,
            group_size: int, tk1: int, tk2: int, interpret: bool = False):
    """x2d (M, K) → (silu(x@W1) * (x@W3)) @ W2 [+ residual], one kernel.

    ``p13`` is the fused [W1|W3] planes packing (K/8, 2*FFN); ``p2``
    (FFN/8, N2). Requires W2's in_dim == W13's out_dim // 2 (no
    quantize-time K padding on w2 — padded models use the unfused path).
    """
    m, k = x2d.shape
    n13 = p13.shape[1]
    ffn = n13 // 2
    n2 = p2.shape[1]
    assert p2.shape[0] * 8 == ffn, (p2.shape, ffn)
    tm = max(8, 1 << (m - 1).bit_length())
    assert tm <= 128, "decode-only kernel (small m)"
    tn1, tn2 = _pick_tn(n13 // 2), _pick_tn(n2)
    # tile W1|W3 symmetrically so phase A emits into zone-aligned slabs
    nk1, nk2 = k // tk1, ffn // tk2
    nj13 = n13 // tn1
    nj2 = n2 // tn2
    A = nj13 * nk1
    T = A + nj2 * nk2
    gd13 = _pick_gd(tk1, nk1, tm, group_size)
    gd2 = _pick_gd(tk2, nk2, tm, group_size)

    pad_m = (-m) % tm
    if pad_m:
        x2d = jnp.pad(x2d, ((0, pad_m), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, pad_m), (0, 0)))
    # sublane tile is 8 rows for f32 scale storage, 16 for 16-bit
    # (ACCESSORY_SCALES_DTYPE) — same rule as planes_qmm
    pad_g1 = (-s13.shape[0]) % (8 if s13.dtype.itemsize == 4 else 16)
    if pad_g1:
        s13 = jnp.pad(s13, ((0, pad_g1), (0, 0)))
        z13 = jnp.pad(z13, ((0, pad_g1), (0, 0)))
    pad_g2 = (-s2.shape[0]) % (8 if s2.dtype.itemsize == 4 else 16)
    if pad_g2:
        s2 = jnp.pad(s2, ((0, pad_g2), (0, 0)))
        z2 = jnp.pad(z2, ((0, pad_g2), (0, 0)))

    # phase pins via min/max (not where): t' = min(t, A-1) freezes every
    # phase-A map at its LAST block through phase B (and max(t-A, 0)
    # freezes phase-B maps at their FIRST block through phase A) — no
    # block is fetched twice and w2's first block prefetches during A
    def m13(t):  # w13 block (kk1, j13)
        tc = jnp.minimum(t, A - 1)
        return (jax.lax.rem(tc, nk1), jax.lax.div(tc, nk1))

    def m2(t):  # w2 block (kk2, j2)
        tb = jnp.maximum(t - A, 0)
        return (jax.lax.rem(tb, nk2), jax.lax.div(tb, nk2))

    def mj13(t):
        return (0, jax.lax.div(jnp.minimum(t, A - 1), nk1))

    def mj2(t):
        return (0, jax.lax.div(jnp.maximum(t - A, 0), nk2))

    in_specs = [
        pl.BlockSpec((tm, tk1),
                     lambda t: (0, jax.lax.rem(jnp.minimum(t, A - 1), nk1)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tk1 // 8, tn1), m13, memory_space=pltpu.VMEM),
        pl.BlockSpec((s13.shape[0], tn1), mj13, memory_space=pltpu.VMEM),
        pl.BlockSpec((z13.shape[0], tn1), mj13, memory_space=pltpu.VMEM),
        pl.BlockSpec((tk2 // 8, tn2), m2, memory_space=pltpu.VMEM),
        pl.BlockSpec((s2.shape[0], tn2), mj2, memory_space=pltpu.VMEM),
        pl.BlockSpec((z2.shape[0], tn2), mj2, memory_space=pltpu.VMEM),
    ]
    operands = [x2d, p13, s13, z13, p2, s2, z2]
    if residual is not None:
        in_specs.append(pl.BlockSpec((tm, tn2), mj2,
                                     memory_space=pltpu.VMEM))
        operands.append(residual.astype(x2d.dtype))

    out = pl.pallas_call(
        functools.partial(
            _ffn_kernel, group_size=group_size, tk1=tk1, tk2=tk2, nk1=nk1,
            nk2=nk2, nj13=nj13, tn1=tn1, tn2=tn2, ffn=ffn, precise=True,
            gd13=gd13, gd2=gd2, has_res=residual is not None),
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn2), mj2, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2d.shape[0], n2), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn1), jnp.float32),
                        pltpu.VMEM((tm, tn2), jnp.float32),
                        pltpu.VMEM((tm, n13), x2d.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * x2d.shape[0] * (k * n13 + ffn * n2),
            bytes_accessed=(k * n13 + ffn * n2) // 2 + x2d.shape[0] * k * 2,
            transcendentals=x2d.shape[0] * ffn,
        ),
        interpret=interpret,
    )(*operands)
    return out[:m] if pad_m else out


def ffn_fusible(w13, w2, m_rows: int) -> bool:
    """Dispatch predicate (see module docstring): decode widths, planes
    layout both sides, symmetric tiling, no quantize-time K padding."""
    from accessory_tpu.quant.qtensor import QuantizedWeight

    # default OFF: chip-measured NET LOSS at 7B (r5). The fused call runs
    # 176-178 µs vs w13 83.5 + w2 ~50 unfused — the monolithic two-phase
    # grid pipelines worse than two separate kernels (389 GB/s vs 552/462)
    # even though its NEIGHBOR kernels sped up (wqkv 50 -> 41.6 µs,
    # confirming that kernel boundaries cost real ramp time). Kept as a
    # working, parity-tested experiment (ACCESSORY_FFN_FUSE=1 enables).
    if os.environ.get("ACCESSORY_FFN_FUSE", "0") != "1":
        return False
    if not (isinstance(w13, QuantizedWeight) and isinstance(w2, QuantizedWeight)):
        return False
    if not (w13.layout == "planes" and w2.layout == "planes"):
        return False
    if m_rows > 128 or w13.bits != 4 or w2.bits != 4:
        return False
    if w2.in_dim != w13.out_dim // 2:       # padded-K models: unfused path
        return False
    if w13.group_size != w2.group_size:
        return False
    ffn = w13.out_dim // 2
    tn1, tn2 = _pick_tn(ffn), _pick_tn(w2.out_dim)
    # n2 must tile exactly: unlike planes_qmm there is no N-padding here,
    # and a partial trailing block would get zero grid programs (NaN out)
    return (ffn % tn1 == 0 and w2.out_dim % tn2 == 0
            and w2.out_dim % 128 == 0
            and w13.in_dim % w13.tile_k == 0 and ffn % w2.tile_k == 0)
