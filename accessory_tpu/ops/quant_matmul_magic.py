"""W4 dequant+matmul v2: bf16 magic-number unpack (no int→float converts).

The v1 kernel (quant_matmul_pallas.py) is VPU-bound on nibble extraction:
shift/mask + int32→f32→bf16 conversion chains plus a sublane-interleaving
reshape. This variant builds bf16 values *bitwise*:

  bits16 = 0x4380 | (q << 3) is the bf16 pattern of 256 + 16·q (exponent
  135, mantissa q<<3) — no arithmetic conversion needed. Two nibbles are
  assembled into one u32 (lo | hi<<16) and a single Mosaic bitcast yields
  two bf16 sublane rows (row 2r = lo half, 2r+1 = hi half — verified
  layout). The affine map folds into the quant constants:
  w = (q − z)·s = (v − (256 + 16z)) · (s/16) with v = 256 + 16q, so callers
  pass scales' = s/16 and zeros' = 256 + 16·z; the kernel stays (v−z')·s'.
  All intermediates (v, v−z') are exact multiples of 16 in bf16 range, so
  the only rounding is the final s' multiply (same as the v1 kernel).

Host packing permutation: extraction step i reads nibbles (i, i+4) of each
word; bitcast row j of step i = final row i·(TK/4) + j. ``pack_u4_magic``
places weight row k at word w=(k mod TK/4)//2, nibble p=(k div TK/4)+4·(k
mod 2) so the kernel's natural output order IS row order — and each step's
rows form a contiguous K-slice, so the matmul runs as 4 partial MXU dots
with no concat/relayout at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAGIC16 = 0x4380  # bf16 bit pattern of 256.0
MAGIC32 = (MAGIC16 << 16) | MAGIC16


def pack_u4_magic(q: np.ndarray) -> np.ndarray:
    """(k, n) ints in [0,16) → (k//8, n) uint32 in magic extraction order.

    Requires k % 8 == 0. Row k goes to word (k % (k_tot/4)) // 2 at nibble
    (k // (k_tot/4)) + 4*(k % 2) — see module docstring. NOTE: the
    permutation depends on the FULL k extent, so per-K-tile kernels must use
    tile-local packing; we pack per tile of size tk at matmul time instead
    (see _repack_tiles)."""
    raise NotImplementedError("use repack_for_magic (per-tile packing)")


def repack_for_magic(packed_std: jnp.ndarray, in_dim: int, tk: int) -> jnp.ndarray:
    """Convert standard little-endian packing (qtensor.pack_int layout) to
    the magic per-tile extraction order. Host-side, one-time at load."""
    from accessory_tpu.quant.qtensor import unpack_int

    q = np.asarray(unpack_int(packed_std, 4, in_dim))  # (K, N)
    k, n = q.shape
    assert k % tk == 0 and tk % 8 == 0
    out = np.zeros((k // 8, n), np.uint32)
    q = q.astype(np.uint32)
    quarter = tk // 4
    for tile in range(k // tk):
        base_k = tile * tk
        base_w = tile * (tk // 8)
        for kk in range(tk):
            i = kk // quarter          # extraction step
            rem = kk % quarter
            w = rem // 2               # word row within tile
            h = kk % 2                 # lo/hi half
            p = i + 4 * h              # nibble slot
            out[base_w + w] |= q[base_k + kk] << (4 * p)
    return jnp.asarray(out)


def _kernel(x_ref, packed_ref, scales_ref, zerosp_ref, out_ref, acc_ref, *,
            group_size: int, tk: int):
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w32 = packed_ref[:]                   # (tk/8, TN) u32, magic order
    words, tn = w32.shape
    quarter = tk // 4
    G = tk // group_size
    g0 = k_idx * G
    s_all = pltpu.roll(scales_ref[:], -g0, 0)[:G]    # (G, TN) f32
    zp_all = pltpu.roll(zerosp_ref[:], -g0, 0)[:G]   # zeros + 256, f32
    x = x_ref[:]                          # (TM, tk)
    tm = x.shape[0]

    gq = quarter // group_size  # groups per quarter-slice (>=1 by choice of tk)
    magic = jnp.uint32(MAGIC32)

    for i in range(4):
        # assemble u32 = MAGIC | lo_bits | hi_bits<<16 from nibbles (i, i+4)
        if i == 0:
            lo = (w32 << 3) & jnp.uint32(0x78)
        else:
            lo = (w32 >> jnp.uint32(4 * i - 3)) & jnp.uint32(0x78)
        hi = (w32 >> jnp.uint32(4 * (i + 4) - 3)) & jnp.uint32(0x78)
        u = magic | lo | (hi << jnp.uint32(16))
        b = pltpu.bitcast(u, jnp.bfloat16)            # (tk/4, TN), rows = 256+q
        # group dequant for this contiguous K-slice (static slices: i is a
        # Python loop index)
        s = s_all[i * gq:(i + 1) * gq].astype(jnp.bfloat16)
        zp = zp_all[i * gq:(i + 1) * gq].astype(jnp.bfloat16)
        bg = b.reshape(gq, group_size, tn)
        wt = ((bg - zp[:, None, :]) * s[:, None, :]).reshape(quarter, tn)
        xs = x[:, i * quarter:(i + 1) * quarter]
        acc_ref[:] += jnp.dot(xs, wt, preferred_element_type=jnp.float32)

    @pl.when(k_idx == nk - 1)
    def _emit():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "tk", "interpret"))
def magic_qmm(x2d, packed_magic, scales, zeros_plus, *, group_size: int,
              tk: int, interpret: bool = False):
    """x2d (M, K) @ magic-packed W4 → (M, N).

    scales must be s/16 and zeros_plus must be 256 + 16·zeros (see module
    docstring); use ``magic_constants`` to convert."""
    m, k = x2d.shape
    n = packed_magic.shape[1]
    assert k % tk == 0 and (tk // 4) % group_size == 0, (k, tk, group_size)
    tm = 128 if m >= 128 else max(8, 1 << (m - 1).bit_length())
    tn = 512 if n % 512 == 0 else (256 if n % 256 == 0 else 128)
    pad_m = (-m) % tm
    if pad_m:
        x2d = jnp.pad(x2d, ((0, pad_m), (0, 0)))
    pad_g = (-scales.shape[0]) % 8
    if pad_g:
        scales = jnp.pad(scales, ((0, pad_g), (0, 0)))
        zeros_plus = jnp.pad(zeros_plus, ((0, pad_g), (0, 0)))

    grid = (x2d.shape[0] // tm, n // tn, k // tk)
    out = pl.pallas_call(
        functools.partial(_kernel, group_size=group_size, tk=tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 8, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((scales.shape[0], tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((zeros_plus.shape[0], tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2d.shape[0], n), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        interpret=interpret,
    )(x2d, packed_magic, scales.astype(jnp.float32),
      zeros_plus.astype(jnp.float32))
    return out[:m] if pad_m else out


def magic_constants(scales, zeros):
    """Convert standard (s, z) to the kernel's folded (s/16, 256 + 16z)."""
    return scales / 16.0, 256.0 + 16.0 * zeros
