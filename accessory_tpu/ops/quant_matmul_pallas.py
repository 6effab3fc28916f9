"""Fused dequant(W4/W3)+matmul Pallas TPU kernel.

The TPU replacement for bitsandbytes' dequant-in-kernel matmul
(reference: accessory/util/quant.py:116-144 Linear4bit swap) and the
BASELINE.json centerpiece: weight-only quantized decode is HBM-bound, so the
win is reading weights at the packed 4-bit footprint and dequantizing in
VMEM, fused into the MXU matmul.

Format (accessory_tpu.quant.qtensor.QuantizedWeight):
  packed (K/pw, N) uint32 — pw = 32//bits values per word, little-endian
    along K (row i*pw+j lives in word i at shift j*bits)
  scales/zeros (K/gs, N) fp32, group size gs along K
  dequant: w[k, n] = (q[k, n] - zeros[k//gs, n]) * scales[k//gs, n]

Kernel: grid (M_tiles, N_tiles, K_tiles); K is the fastest axis so the fp32
accumulator tile is revisited consecutively (init at k==0, emit at k==last).
Each program unpacks a (TK/pw, TN) word tile to (TK, TN) values with vector
shifts, applies group scales via a broadcast reshape (TK = c·gs), and feeds
the MXU. VMEM footprint ≈ TK/pw·TN·4 + TK·TN·2 + TM·(TK·2 + TN·4) bytes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, packed_ref, scales_ref, zeros_ref, out_ref, acc_ref, *,
            bits: int, group_size: int, tk: int, out_dtype):
    pw = 32 // bits
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = packed_ref[:]  # (TK/pw, TN) uint32
    words, tn = packed.shape
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, pw, 1), 1) * jnp.uint32(bits)
    mask = jnp.uint32((1 << bits) - 1)
    q = (packed[:, None, :] >> shifts) & mask          # (TK/pw, pw, TN)
    # Mosaic has no uint32→f32 cast; values are < 2^bits so int32 is exact
    q = q.reshape(words * pw, tn)[:tk].astype(jnp.int32).astype(jnp.float32)

    groups = tk // group_size
    # scales/zeros blocks span the FULL group dim (tiny: K/gs rows). A
    # dynamic sublane slice needs 8-aligned offsets Mosaic can't prove, so
    # rotate the wanted groups to the top (dynamic roll) + static slice.
    g0 = k_idx * groups
    scales = pltpu.roll(scales_ref[:], -g0, 0)[:groups]  # (groups, TN) f32
    zeros = pltpu.roll(zeros_ref[:], -g0, 0)[:groups]
    qg = q.reshape(groups, group_size, tn)
    w = (qg - zeros[:, None, :]) * scales[:, None, :]
    w = w.reshape(tk, tn).astype(out_dtype)

    x = x_ref[:]  # (TM, TK)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k_idx == nk - 1)
    def _emit():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _choose_tiles(m: int, k: int, n: int, bits: int, group_size: int):
    """Tuned on the real chip via full-decode A/B (TinyLlama bs8): large
    K/N tiles amortize per-program overhead — tk2048/tn512 gave 1945 tok/s
    vs 1611 at tk512/tn256."""
    tm = 128 if m >= 128 else max(8, 1 << (m - 1).bit_length())
    tk = min(k, max(group_size, 2048))
    while k % tk:
        tk -= group_size
    tn = 512 if n % 512 == 0 else (256 if n % 256 == 0 else 128)
    return tm, tk, tn


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "interpret"))
def _qmm(x2d, packed, scales, zeros, *, bits, group_size, interpret=False):
    m, k = x2d.shape
    n = packed.shape[1]
    pw = 32 // bits
    tm, tk, tn = _choose_tiles(m, k, n, bits, group_size)

    pad_m = (-m) % tm
    if pad_m:
        x2d = jnp.pad(x2d, ((0, pad_m), (0, 0)))
    mp = x2d.shape[0]

    # the in-kernel dynamic roll needs an 8-aligned sublane count; pad the
    # (tiny) group dim — rolled-in garbage rows are never selected because
    # g0 + groups_per_tile <= real group count
    pad_g = (-scales.shape[0]) % 8
    if pad_g:
        scales = jnp.pad(scales, ((0, pad_g), (0, 0)))
        zeros = jnp.pad(zeros, ((0, pad_g), (0, 0)))

    grid = (mp // tm, n // tn, k // tk)
    words_per_tile = tk // pw


    out = pl.pallas_call(
        functools.partial(_kernel, bits=bits, group_size=group_size, tk=tk,
                          out_dtype=x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((words_per_tile, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((scales.shape[0], tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((zeros.shape[0], tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=k * n * bits // 8 + mp * k * 2 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, packed, scales, zeros)
    return out[:m] if pad_m else out


def quant_matmul_pallas(x: jnp.ndarray, qw, interpret: bool = False) -> jnp.ndarray:
    """x (..., in_dim) @ dequant(qw) → (..., out_dim) in qw.act_dtype."""
    assert qw.packed.ndim == 2, "layer-stacked weights must be scanned first"
    assert qw.in_dim % qw.group_size == 0
    assert qw.group_size % (32 // qw.bits) == 0 or qw.bits == 3, (
        qw.group_size, qw.bits)
    lead = x.shape[:-1]
    x2d = x.reshape(-1, qw.in_dim).astype(qw.act_dtype)
    out = _qmm(x2d, qw.packed, qw.scales.astype(jnp.float32),
               qw.zeros.astype(jnp.float32), bits=qw.bits,
               group_size=qw.group_size, interpret=interpret)
    return out.reshape(*lead, qw.out_dim)
