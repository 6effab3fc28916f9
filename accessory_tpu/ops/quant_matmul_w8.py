"""W8A16 dequant+matmul: int8 weights, group-wise scales, fused epilogues.

The TPU equivalent of the reference's bitsandbytes ``Linear8bitLt`` serving
path (reference: accessory/util/quant.py:18-93 — 8-bit quantized linears
kept for QPEFT training and higher-fidelity serving). Same math shape as
the W4 planes kernel (ops/quant_matmul_planes.py) minus the nibble unpack:

  x @ ((q - z) * s) = x @ (q * s) - xsum_g @ (z * s)

with q stored directly as int8 rows (offset by -128 so the asymmetric
[0, 255] grid fits int8), so per-element VPU work is ONE int8->f32 convert
+ scale multiply; the zero-point correction is one tiny (TM, G) @ (G, TN)
MXU dot per tile with zs = (zeros - 128) * scales folded at repack time.

W8 reads 2x the bytes of W4 per weight (1 B vs 0.5 B) so weight-bound
decode runs at ~half the W4 tok/s — the trade is near-fp16 quality
(grid-rounding error 16x smaller) with still-halved weight HBM traffic
vs bf16.

Shares prologue/epilogue fusions with the planes kernel: RMSNorm prologue,
residual add, decode-RoPE rotation (ops.rope.rope_rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from accessory_tpu.ops.quant_matmul_planes import rotate_lanes


def repack_for_w8(packed_std, in_dim: int) -> jnp.ndarray:
    """Std uint32 packing (qtensor.pack_int, bits=8) -> (K, N) int8 rows
    with the -128 offset applied. Host-side numpy, one-time at load."""
    from accessory_tpu.quant.qtensor import unpack_int

    q = np.asarray(unpack_int(jnp.asarray(packed_std), 8, in_dim))  # (K, N)
    return jnp.asarray((q - 128).astype(np.int8))


def _kernel(x_ref, q8_ref, scales_ref, zs_ref, *rest,
            group_size: int, tk: int,
            norm_eps: float = 0.0, has_norm: bool = False,
            has_res: bool = False, rope_style: str = "",
            rope_hd: int = 0):
    rest = list(rest)
    norm_ref = rest.pop(0) if has_norm else None
    res_ref = rest.pop(0) if has_res else None
    cos_ref = rest.pop(0) if rope_style else None
    sin_ref = rest.pop(0) if rope_style else None
    out_ref, acc_ref = rest

    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q8 = q8_ref[:]                             # (tk, TN) int8 (= q - 128)
    tn = q8.shape[1]
    G = tk // group_size
    g0 = k_idx * G
    # scales/zeros blocks span the full (tiny) group dim; dynamic sublane
    # slices need provable 8-alignment, so roll the wanted groups to the top
    # and slice statically (same trick as the planes kernel).
    # f32 math regardless of the HBM storage dtype (f16/bf16 via
    # ACCESSORY_SCALES_DTYPE — see quant_matmul_planes._kernel)
    s_all = pltpu.roll(scales_ref[:].astype(jnp.float32), -g0, 0)[:G]
    zs_all = pltpu.roll(zs_ref[:].astype(jnp.float32), -g0, 0)[:G]
    x = x_ref[:]                               # (TM, tk)
    if has_norm:
        # fused RMSNorm prologue (requires K == tk). Same op order as
        # ops.norms.rms_norm so outputs match the unfused path bit-for-bit.
        xf = x.astype(jnp.float32)
        r = jnp.reciprocal(jnp.sqrt(
            jnp.mean(xf * xf, axis=1, keepdims=True) + norm_eps))
        x = ((xf * r) * norm_ref[:]).astype(x.dtype)

    # scale multiply in f32 (the planes kernel measured f32 fastest)
    qf = q8.astype(jnp.float32).reshape(G, group_size, tn)
    w = (qf * s_all[:, None, :]).reshape(tk, tn).astype(x.dtype)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    # zero-point correction via one tiny MXU dot: xsum (TM, G) @ zs (G, TN)
    if group_size == 128:
        xsum = jnp.sum(
            x.astype(jnp.float32).reshape(x.shape[0], G, group_size), axis=2)
    else:
        # Mosaic rejects the (TM, G, gs) shape cast unless gs is the lane
        # width — segment-sum through the MXU instead
        row_g = jax.lax.broadcasted_iota(jnp.int32, (tk, G), 0) // group_size
        col_g = jax.lax.broadcasted_iota(jnp.int32, (tk, G), 1)
        xsum = jnp.dot(x.astype(jnp.float32),
                       (row_g == col_g).astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    acc_ref[:] -= jnp.dot(xsum, zs_all, preferred_element_type=jnp.float32)

    @pl.when(k_idx == nk - 1)
    def _emit():
        acc = acc_ref[:]
        if rope_style:
            acc = rotate_lanes(acc, cos_ref[:], sin_ref[:], rope_style,
                               rope_hd)
        out = acc.astype(out_ref.dtype)
        if has_res:
            out = res_ref[:] + out
        out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("group_size", "tk",
                                             "norm_eps", "rope_style",
                                             "rope_hd", "interpret"))
def w8_qmm(x2d, q8, scales, zs, norm_weight=None,
           residual=None, rope_cos=None, rope_sin=None, *,
           group_size: int, tk: int, norm_eps: float = 1e-5,
           rope_style: str = "", rope_hd: int = 0,
           interpret: bool = False):
    """x2d (M, K) @ int8-quantized W -> (M, N).

    ``q8``: (K, N) int8 weights (quantized value - 128); ``zs`` must be
    (zeros - 128) * scales (folded at repack, see to_w8_layout). Optional
    fusions match planes_qmm: norm_weight (K,) RMSNorm prologue (K == tk),
    residual (M, N) epilogue, rope_cos/rope_sin (N,) decode-RoPE epilogue.
    """
    m, k = x2d.shape
    n = q8.shape[1]
    assert k % tk == 0 and tk % group_size == 0, (k, tk, group_size)
    assert norm_weight is None or k == tk, "norm fusion needs K == tk"
    assert (rope_cos is None) == (not rope_style)
    tm = 128 if m >= 128 else max(8, 1 << (m - 1).bit_length())
    # out dims below the 128-lane tile (e.g. tiny-model kv projections)
    # zero-pad N — an unpadded 64-wide output would get ZERO j-programs
    # and an uninitialized (NaN) output buffer
    pad_n = (-n) % 128
    if pad_n:
        assert not rope_style, "rope fusion requires 128-aligned heads"
        q8 = jnp.pad(q8, ((0, 0), (0, pad_n)))
        scales = jnp.pad(scales, ((0, 0), (0, pad_n)))
        zs = jnp.pad(zs, ((0, 0), (0, pad_n)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, 0), (0, pad_n)))
    npad = n + pad_n
    tn = 512 if npad % 512 == 0 else (256 if npad % 256 == 0 else 128)
    pad_m = (-m) % tm
    if pad_m:
        x2d = jnp.pad(x2d, ((0, pad_m), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, pad_m), (0, 0)))
    # sublane tile is 8 rows for f32, 16 for 16-bit scale storage
    pad_g = (-scales.shape[0]) % (8 if scales.dtype.itemsize == 4 else 16)
    if pad_g:
        scales = jnp.pad(scales, ((0, pad_g), (0, 0)))
        zs = jnp.pad(zs, ((0, pad_g), (0, 0)))

    grid = (x2d.shape[0] // tm, npad // tn, k // tk)
    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((scales.shape[0], tn), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((zs.shape[0], tn), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    # scales/zs stream in their STORED dtype (bf16 via
    # ACCESSORY_SCALES_DTYPE halves their stream share); the kernel
    # upcasts blocks to f32 before any math (see quant_matmul_planes)
    operands = [x2d, q8, scales, zs]
    if norm_weight is not None:
        in_specs.append(pl.BlockSpec((1, tk), lambda i, j, kk: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(norm_weight.astype(jnp.float32).reshape(1, k))
    if residual is not None:
        in_specs.append(pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                                     memory_space=pltpu.VMEM))
        operands.append(residual.astype(x2d.dtype))
    if rope_style:
        assert tn % rope_hd == 0, (tn, rope_hd)
        for row in (rope_cos, rope_sin):
            in_specs.append(pl.BlockSpec((1, tn), lambda i, j, kk: (0, j),
                                         memory_space=pltpu.VMEM))
            operands.append(row.astype(jnp.float32).reshape(1, n))
    out = pl.pallas_call(
        functools.partial(_kernel, group_size=group_size, tk=tk,
                          norm_eps=norm_eps,
                          has_norm=norm_weight is not None,
                          has_res=residual is not None,
                          rope_style=rope_style, rope_hd=rope_hd),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2d.shape[0], npad), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * x2d.shape[0] * k * n,
            bytes_accessed=k * n + x2d.shape[0] * k * 2
            + x2d.shape[0] * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:m, :n] if (pad_m or pad_n) else out


def choose_tile_k_w8(in_dim: int, group_size: int, max_tk: int = 2048) -> int:
    """Largest K-tile <= max_tk with tk % group_size == 0 dividing in_dim.
    tk == in_dim (holds for dim <= 2048) also enables the RMSNorm-prologue
    fusion; a 2048x512 int8 block is 1 MB — fine double-buffered."""
    tk = group_size
    while in_dim % (2 * tk) == 0 and 2 * tk <= max_tk:
        tk *= 2
    assert in_dim % tk == 0, (in_dim, tk)
    return tk
