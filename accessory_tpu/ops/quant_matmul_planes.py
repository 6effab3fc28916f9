"""W4 dequant+matmul v3: int8-staged nibble planes.

The v1 kernel (quant_matmul_pallas.py) is VPU-bound: per weight element it
spends a shift, a mask, an int32->f32 convert, a subtract, a multiply and a
bf16 cast (~6 vector ops at 32-bit lane width). This variant restructures the
*storage* so nibble extraction is amortized over whole 32-bit words:

  masked = word & 0x0F0F0F0F       extracts the LOW nibble of all 4 bytes
  hi     = (word >> 4) & 0x0F0F0F0F  extracts the HIGH nibbles
  int8 view: a Mosaic bitcast of (W, N) uint32 -> (4W, N) int8 places byte b
  of word w at sublane row 4w+b (the same sublane-interleaved expansion the
  magic kernel verified for uint32->bf16).

So 3 vector ops per word yield EIGHT int8 quantized values already laid out
as contiguous K rows — 0.375 ops/value vs 2 for shift+mask per value.

The second trick removes the zero-point math from per-element work entirely:

  x @ ((q - z) * s) = x @ (q * s)  -  xsum_g @ (z * s)

where xsum_g[m, g] = sum of x[m, k] over group g — so the zero-point
correction is ONE tiny (TM, G) @ (G, TN) MXU dot per tile (G = tk/gs = 16)
instead of a subtract on every element. zs = zeros * scales is folded at
repack time. Per-element VPU work is just int8->f32 cast + scale multiply.

Measured (v5e, in-jit scan harness, K=N=4096 m=8): 562 GB/s effective vs
379 GB/s for the v1 kernel and 715 GB/s for a pure-streaming probe in the
same harness — 86% of the chip's measured 656 GB/s streaming ceiling.
Numerics: dequant error is bounded by ulp(q*s) instead of ulp((q-z)*s) —
about 3% of the W4 grid-rounding error itself, negligible.

Host packing (per K-tile of size tk, see ``repack_for_planes``): within-tile
row t goes to half h = t >= tk/2, remainder r = t - h*tk/2, word w = r // 4,
byte b = r % 4, nibble = low if h == 0 else high. The kernel then runs two
partial MXU dots (x[:, :tk/2] @ w_lo, x[:, tk/2:] @ w_hi) with no relayout.

Role: bitsandbytes dequant-in-kernel matmul
(reference: accessory/util/quant.py:116-144).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NIBBLE_MASK = 0x0F0F0F0F


def rotate_lanes(acc, cos_row, sin_row, rope_style: str, rope_hd: int):
    """Fused decode-RoPE epilogue (shared by the W4 planes and W8 kernels):
    rotate each lane of ``acc`` (TM, TN) with its pair partner using
    position-baked per-column rows (cos_row; sign-folded sin_row, zeroed on
    non-rotated columns — see ops.rope.rope_rows). Pairing is periodic in
    rope_hd, which divides TN and head boundaries are tile-aligned, so the
    lane roll stays within the block and wrapped lanes are never selected
    by the mask."""
    tm_, tn_ = acc.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (tm_, tn_), 1)
    if rope_style == "interleaved":
        shift, first = 1, (lane % 2) == 0
    else:  # "half" (neox)
        shift = rope_hd // 2
        first = (lane % rope_hd) < shift
    # pltpu.roll needs non-negative shifts: -shift ≡ tn - shift
    partner = jnp.where(first, pltpu.roll(acc, tn_ - shift, 1),
                        pltpu.roll(acc, shift, 1))
    return acc * cos_row + partner * sin_row


def pack_tile_words(q, tk: int):
    """Numpy nibble rows (K, N) uint -> planes word order (K/8, N) u32 for
    k-tiles of size tk (the single source of the within-tile layout; the
    kernel docstring describes it). Shared by repack_for_planes and the
    fuse-time retiler (quant.fuse._replan_tiles_np)."""
    k, n = q.shape
    assert k % tk == 0 and tk % 8 == 0, (k, tk)
    q = q.astype(np.uint32).reshape(k // tk, 2, tk // 2, n)
    lo, hi = q[:, 0], q[:, 1]                      # (tiles, tk/2, N)
    lo = lo.reshape(-1, tk // 8, 4, n)
    hi = hi.reshape(-1, tk // 8, 4, n)
    shifts = (np.arange(4, dtype=np.uint32) * 8)[None, None, :, None]
    words = np.bitwise_or.reduce(lo << shifts, axis=2) | \
        np.bitwise_or.reduce(hi << (shifts + 4), axis=2)
    return words.reshape(k // 8, n)


def unpack_tile_words(words, in_dim: int, tk: int):
    """Numpy inverse of pack_tile_words: planes word order -> nibble rows
    (K, N) uint8."""
    k, n = in_dim, words.shape[-1]
    w = np.asarray(words).reshape(k // tk, tk // 8, n)
    q = np.empty((k // tk, tk, n), np.uint8)
    half = tk // 2
    for b in range(4):
        byte = (w >> np.uint32(8 * b)).astype(np.uint32)
        q[:, b:half:4] = (byte & 0xF).astype(np.uint8)
        q[:, half + b::4] = ((byte >> 4) & 0xF).astype(np.uint8)
    return q.reshape(k, n)


def repack_for_planes(packed_std, in_dim: int, tk: int) -> jnp.ndarray:
    """Std little-endian packing (qtensor.pack_int) -> per-tile nibble-plane
    order. Host-side numpy, fully vectorized, one-time at load."""
    from accessory_tpu.quant.qtensor import unpack_int

    q = np.asarray(unpack_int(jnp.asarray(packed_std), 4, in_dim))  # (K, N)
    return jnp.asarray(pack_tile_words(q, tk))


def unpack_planes(packed_planes: jnp.ndarray, in_dim: int, tk: int,
                  group_size: int, scales: jnp.ndarray,
                  zs: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Device-side inverse of repack_for_planes + dequant → (K, N) dense.

    For LARGE-m matmuls (prefill/training) the kernel's per-m-tile unpack
    is redundant work (m/TM repetitions of the same VPU dequant); unpacking
    once to a dense bf16 weight and letting the MXU run a plain dot trades
    one K*N*2-byte HBM round trip for it. XLA expressions only — no Pallas.
    """
    k, n = in_dim, packed_planes.shape[-1]
    w32 = packed_planes.reshape(k // tk, tk // 8, n)
    bytes_ = [(w32 >> jnp.uint32(8 * b)) for b in range(4)]
    lo = jnp.stack([(x & jnp.uint32(0xF)) for x in bytes_], axis=2)
    hi = jnp.stack([((x >> jnp.uint32(4)) & jnp.uint32(0xF))
                    for x in bytes_], axis=2)
    # (tiles, tk//8, 4, n) -> halves (tiles, tk//2, n) -> (K, N)
    q = jnp.concatenate([lo.reshape(k // tk, tk // 2, n),
                         hi.reshape(k // tk, tk // 2, n)], axis=1)
    q = q.reshape(k, n).astype(jnp.float32)
    g = group_size
    q = q.reshape(k // g, g, n)
    # planes layout folds zeros to zs = zeros * scales: w = q*s - zs.
    # Rows may be padded to the kernel's sublane alignment
    # (quant.fuse._align_scale_rows) — slice to the real group count.
    w = q * scales[:k // g].astype(jnp.float32)[:, None, :] \
        - zs[:k // g].astype(jnp.float32)[:, None, :]
    return w.reshape(k, n).astype(dtype)


def _kernel(x_ref, packed_ref, scales_ref, zs_ref, *rest,
            group_size: int, tk: int, precise: bool,
            norm_eps: float = 0.0, has_norm: bool = False,
            has_res: bool = False, rope_style: str = "",
            rope_hd: int = 0, group_dot: bool = False):
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

    w32 = packed_ref[:]                       # (tk/8, TN) u32, plane order
    tn = w32.shape[1]
    half = tk // 2
    G = tk // group_size
    g0 = k_idx * G
    # scales/zeros blocks span the full (tiny) group dim; dynamic sublane
    # slices need provable 8-alignment, so roll the wanted groups to the top
    # and slice statically (same trick as the v1 kernel).
    # scales/zs may be stored f16/bf16 in HBM (ACCESSORY_SCALES_DTYPE —
    # halves their share of the weight stream); all math stays f32, so
    # convert the whole block up front (roll in f32 also sidesteps any
    # sub-sublane alignment constraint of 16-bit rolls)
    s_all = pltpu.roll(scales_ref[:].astype(jnp.float32), -g0, 0)[:G]
    zs_all = pltpu.roll(zs_ref[:].astype(jnp.float32), -g0, 0)[:G]
    x = x_ref[:]                               # (TM, tk)
    if has_norm:
        # fused RMSNorm prologue (requires K == tk: the whole row is here).
        # Same op order as ops.norms.rms_norm so outputs match the unfused
        # path bit-for-bit: f32 mean-square, rsqrt, scale, cast back.
        xf = x.astype(jnp.float32)
        r = jnp.reciprocal(jnp.sqrt(
            jnp.mean(xf * xf, axis=1, keepdims=True) + norm_eps))
        x = ((xf * r) * norm_ref[:]).astype(x.dtype)

    _accum_tile(acc_ref, x, w32, s_all, zs_all, group_size=group_size,
                tk=tk, precise=precise, group_dot=group_dot)

    @pl.when(k_idx == nk - 1)
    def _emit():
        acc = acc_ref[:]
        if rope_style:
            acc = rotate_lanes(acc, cos_ref[:], sin_ref[:], rope_style,
                               rope_hd)
        out = acc.astype(out_ref.dtype)
        if has_res:
            # fused residual-add epilogue; cast-then-add matches the
            # unfused ``h + module_linear(...)`` bit-for-bit
            out = res_ref[:] + out
        out_ref[:] = out


def _accum_tile(acc_ref, x, w32, s_all, zs_all, *, group_size: int, tk: int,
                precise: bool, group_dot):
    """Accumulate one (x-tile, packed-tile) product into ``acc_ref`` —
    dequant halves (precise / group_dot / bdiag variants) plus the
    zero-point correction. Factored from _kernel so the fused-FFN kernel
    (ops/ffn_fused.py) shares the exact op sequence; ref-update order is
    unchanged (two half += then the zp -=)."""
    tn = w32.shape[1]
    half = tk // 2
    G = tk // group_size
    mask = jnp.uint32(_NIBBLE_MASK)
    lo8 = pltpu.bitcast(w32 & mask, jnp.int8)               # (tk/2, TN)
    hi8 = pltpu.bitcast((w32 >> jnp.uint32(4)) & mask, jnp.int8)

    gh = half // group_size                    # groups per half
    for h, q8 in ((0, lo8), (1, hi8)):
        s = s_all[h * gh:(h + 1) * gh]
        if isinstance(group_dot, str) and group_dot.startswith("bdiag"):
            # Block-diagonal group dot: per-element VPU work is ONE
            # int8->bf16 cast; the per-group structure rides the MXU.
            # Build x' (gh*TM, half) where row block g holds x with only
            # group g's columns live — one dot yields per-group partials
            # (MXU cost is ~independent of M below 128 rows), then gh
            # tiny (TM, TN) FMAs apply the scales post-dot in f32.
            # Requires gh * TM <= 128 (decode m-tiles; large-m callers
            # use the dense path). Numerics match group_dot: q exact in
            # bf16, f32 accumulation, f32 post-scaling.
            tm_ = x.shape[0]
            # "bdiag" = all gh groups in one dot; "bdiag:G" = sub-dots of
            # G groups each (hierarchical: bounds the block-diagonal MAC
            # padding to G× while keeping per-element work at one cast)
            gsub = gh if group_dot == "bdiag" else int(group_dot[6:])
            gsub = min(gsub, gh)
            span = gsub * group_size
            qb = q8.astype(x.dtype)
            xh = x[:, h * half:(h + 1) * half]          # (TM, half)
            add = None
            for sub in range(gh // gsub):
                xs = xh[:, sub * span:(sub + 1) * span]
                if gsub > 1:
                    col_g = jax.lax.broadcasted_iota(
                        jnp.int32, (gsub, tm_, span), 2) // group_size
                    row_g = jax.lax.broadcasted_iota(
                        jnp.int32, (gsub, tm_, span), 0)
                    xbd = jnp.where(col_g == row_g, xs[None], 0).reshape(
                        gsub * tm_, span)
                else:
                    xbd = xs
                part = jnp.dot(xbd, qb[sub * span:(sub + 1) * span],
                               preferred_element_type=jnp.float32)
                part = part.reshape(gsub, tm_, tn)
                for g in range(gsub):
                    t = part[g] * s[sub * gsub + g:sub * gsub + g + 1]
                    add = t if add is None else add + t
            acc_ref[:] += add
        elif group_dot:
            # Per-element VPU work is just the int8->bf16 cast: the scale
            # multiply moves AFTER the MXU — one (TM, TN) multiply-add per
            # group instead of one per element. The kernel is VPU-bound on
            # dequant (BENCHMARKS.md: 562 GB/s vs the 715 GB/s streaming
            # probe = ~3.4 VPU ops/element at the stream rate), so shaving
            # the multiply raises the memory-bound ceiling. Numerics are
            # BETTER than the fused path: q values 0..15 are exact in
            # bf16, the dot accumulates f32, and s multiplies in f32.
            qb = q8.astype(x.dtype)
            part = None
            for g in range(gh):
                d = jnp.dot(x[:, h * half + g * group_size:
                              h * half + (g + 1) * group_size],
                            qb[g * group_size:(g + 1) * group_size],
                            preferred_element_type=jnp.float32)
                t = d * s[g:g + 1]
                part = t if part is None else part + t
            acc_ref[:] += part
        elif precise:
            qf = q8.astype(jnp.float32).reshape(gh, group_size, tn)
            w = (qf * s[:, None, :]).reshape(half, tn).astype(x.dtype)
            acc_ref[:] += jnp.dot(x[:, h * half:(h + 1) * half], w,
                                  preferred_element_type=jnp.float32)
        else:
            qb = q8.astype(jnp.bfloat16).reshape(gh, group_size, tn)
            w = (qb * s[:, None, :].astype(jnp.bfloat16)).reshape(half, tn)
            w = w.astype(x.dtype)
            acc_ref[:] += jnp.dot(x[:, h * half:(h + 1) * half], w,
                                  preferred_element_type=jnp.float32)

    # zero-point correction via one tiny MXU dot: xsum (TM, G) @ zs (G, TN).
    # xsum in f32 — m is small, the reduce is cheap, and it avoids bf16
    # accumulation error over group_size adds.
    if group_size == 128:
        # lane-width groups: reshape puts one group per lane register row
        xsum = jnp.sum(
            x.astype(jnp.float32).reshape(x.shape[0], G, group_size), axis=2)
    else:
        # Mosaic rejects the (TM, G, gs) shape cast unless gs is the lane
        # width — segment-sum through the MXU instead: x @ onehot(k -> group)
        row_g = jax.lax.broadcasted_iota(jnp.int32, (tk, G), 0) // group_size
        col_g = jax.lax.broadcasted_iota(jnp.int32, (tk, G), 1)
        xsum = jnp.dot(x.astype(jnp.float32),
                       (row_g == col_g).astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    acc_ref[:] -= jnp.dot(xsum, zs_all, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("group_size", "tk", "precise",
                                             "norm_eps", "rope_style",
                                             "rope_hd", "group_dot",
                                             "interpret"))
def planes_qmm(x2d, packed_planes, scales, zs, norm_weight=None,
               residual=None, rope_cos=None, rope_sin=None, *,
               group_size: int, tk: int,
               precise: bool = True, norm_eps: float = 1e-5,
               rope_style: str = "", rope_hd: int = 0,
               group_dot: bool | None = None,
               interpret: bool = False):
    """x2d (M, K) @ plane-packed W4 -> (M, N).

    ``zs`` must be zeros*scales (folded at repack, see to_planes_layout).
    ``precise=True`` (default, also the measured-fastest variant) does the
    scale multiply in f32; False does it in bf16.

    Optional fusions (each removes an XLA elementwise kernel per call —
    decode is launch-bound, see BENCHMARKS.md round 2):
      norm_weight (K,): RMSNorm prologue ``rms_norm(x) @ W`` — requires
        K == tk so each program holds the whole reduction row.
      residual (M, N): epilogue ``residual + (x @ W)``.
      rope_cos/rope_sin (N,): decode-RoPE epilogue for the fused wqkv
        projection — one shared position for all rows (decode step).
        Rows come from ops.rope.rope_rows (sin sign-folded, v columns
        cos=1/sin=0). Requires rope_hd | TN (true for hd in {64, 128}).
    """
    import os

    m, k = x2d.shape
    n = packed_planes.shape[1]
    # default OFF: the small-block micro-bench wins (+12-20%) do not
    # survive in-model (headline +0.4% noise, 7B -2.5% — BENCHMARKS.md
    # round-3 attention/kernel A/Bs); "auto" applies the small-block
    # heuristic, "1" forces it everywhere
    # default "auto" (r4): conservative per-shape pick — block-diagonal
    # post-dot scaling only where gh<=2 (w2-class shapes), measured
    # in-model -2.3 us/call on w2 with every other slot unchanged
    # (trace: step busy 1.439 -> 1.393 ms at the r4 headline shape)
    gd_env = os.environ.get("ACCESSORY_QMM_GROUPDOT", "auto") \
        if group_dot is None else (
            group_dot if isinstance(group_dot, str)
            else "1" if group_dot else "0")
    assert k % tk == 0 and (tk // 2) % group_size == 0, (k, tk, group_size)
    assert norm_weight is None or k == tk, "norm fusion needs K == tk"
    assert (rope_cos is None) == (not rope_style)
    tm = 128 if m >= 128 else max(8, 1 << (m - 1).bit_length())
    # out dims below the 128-lane tile (tiny-model kv projections) zero-pad
    # N — an unpadded 64-wide output would get ZERO j-programs and an
    # uninitialized (NaN) output buffer
    pad_n = (-n) % 128
    if pad_n:
        assert not rope_style, "rope fusion requires 128-aligned heads"
        packed_planes = jnp.pad(packed_planes, ((0, 0), (0, pad_n)))
        scales = jnp.pad(scales, ((0, 0), (0, pad_n)))
        zs = jnp.pad(zs, ((0, 0), (0, pad_n)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, 0), (0, pad_n)))
    npad = n + pad_n
    # n-tile: biggest dividing tile wins — chip A/B r3 headline decode:
    # tn512 4885 tok/s, tn1024 5284 (+8.2%), tn2048 5528 (+13.2%, 92% of
    # the read-reduce ceiling). Fewer block boundaries = better
    # compute/DMA overlap; VMEM for the (tk/8, 2048) u32 block
    # double-buffered is ~4 MB of 16. ACCESSORY_QMM_TN caps it for A/Bs.
    tn_max = int(os.environ.get("ACCESSORY_QMM_TN", "2048"))
    tn = 128
    for cand in (2048, 1024, 512, 256):
        if cand <= tn_max and npad % cand == 0:
            tn = cand
            break
    gh_ = (tk // 2) // group_size
    if gd_env == "auto":
        # r4 clean (on-device-loop) per-shape A/Bs superseded the r3
        # heuristic (whose noisy harness said small-tn wins; it doesn't:
        # wqkv groupdot -16%). The block-diagonal form wins when gh <= 2
        # (w2-shape 596→720 GB/s) OR when the call has >= 2 k-steps to
        # hide the M=gh*TM dot latency behind (7B shapes, nk=2:
        # wo 571→650, w13 581→600); the fused f32 multiply wins only at
        # nk == 1 with gh > 2 (TinyLlama wo 625 > 582, w13 649 > 626).
        bd_ok = gh_ * tm <= 128
        group_dot = "bdiag" if bd_ok and (gh_ <= 2 or k // tk >= 2) \
            else False
    elif gd_env.startswith("bdiag"):
        # block-diagonal group dot (see _kernel): needs gsub*TM <= 128 and
        # gsub | gh (the sub-dot loop covers gh//gsub spans — a
        # non-dividing G would silently drop the remainder groups).
        # "bdiag" = all groups per half in one dot; "bdiag:G" = sub-dots
        # of G groups each, G lowered to the nearest divisor of gh
        gsub = gh_ if gd_env == "bdiag" else max(1, min(int(gd_env[6:]),
                                                        gh_))
        while gh_ % gsub:
            gsub -= 1
        group_dot = f"bdiag:{gsub}" if gsub * tm <= 128 else gh_ <= 2
    else:
        group_dot = gd_env == "1"
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
        pl.BlockSpec((tk // 8, tn), lambda i, j, kk: (kk, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((scales.shape[0], tn), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((zs.shape[0], tn), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    # scales/zs stream in their STORED dtype (f16/bf16 via
    # ACCESSORY_SCALES_DTYPE halves their 12.5% share of the quant-path
    # stream); the kernel upcasts blocks to f32 before any math, so a
    # host-side astype here would only defeat the bandwidth saving
    operands = [x2d, packed_planes, scales, zs]
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
                          precise=precise, norm_eps=norm_eps,
                          has_norm=norm_weight is not None,
                          has_res=residual is not None,
                          rope_style=rope_style, rope_hd=rope_hd,
                          group_dot=group_dot),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2d.shape[0], npad), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * x2d.shape[0] * k * n,
            bytes_accessed=k * n // 2 + x2d.shape[0] * k * 2
            + x2d.shape[0] * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:m, :n] if (pad_m or pad_n) else out


def choose_tile_k(in_dim: int, group_size: int, max_tk: int = 2048,
                  out_dim: int | None = None) -> int:
    """Largest K-tile <= max_tk with (tk/2) % group_size == 0 dividing
    in_dim (tk2048 measured best on the v1 kernel; same regime here).

    With ``out_dim`` given: when the whole reduction fits one tile
    (nk == 1) and the output tiles would stay >= 1024 lanes after
    halving, prefer TWO k-tiles — the bdiag path's block-diagonal dot
    latency then hides behind the second tile's DMA (r4 chip A/B at the
    headline shapes: w13 647 -> 726 GB/s, wo 741 -> 789 at tk 2048 ->
    1024+bdiag; wqkv-shape (tn 512) LOSES, hence the width guard)."""
    tk = 2 * group_size
    while in_dim % (2 * tk) == 0 and 2 * tk <= max_tk:
        tk *= 2
    assert in_dim % tk == 0, (in_dim, tk)
    if (out_dim is not None and tk == in_dim and tk > 2 * group_size
            and (tk // 4) % group_size == 0
            and (out_dim + (-out_dim) % 128) % 1024 == 0):
        tk //= 2
    return tk
