"""Packed quantized weight representation + pack/unpack/matmul.

Format (OmniQuant-compatible weight-only quantization):
  * bits ∈ {4, 3}; quantized value q ∈ [0, 2^bits - 1]
  * group-wise along the *reduction* (in) dimension, group_size g
  * dequant: w[i, o] = (q[i, o] - zeros[i // g, o]) * scales[i // g, o]
  * storage: q packed little-endian into uint32 along the in dimension
    (8 nibbles / 10 three-bit fields per word), scales/zeros in fp32.

This mirrors what the reference gets from bitsandbytes Linear4bit NF4
(accessory/util/quant.py:116-144) but with a uniform-grid asymmetric format so
OmniQuant checkpoint scales/zeros import directly.

``quant_matmul`` dispatches to the fused Pallas kernel on TPU and to the XLA
dequant+dot reference elsewhere (and inside kernel unit tests).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedWeight:
    """Group-wise quantized (in_dim, out_dim) weight.

    packed:  (ceil(in_dim / per_word), out_dim) uint32
    scales:  (in_dim // group_size, out_dim) fp32
    zeros:   (in_dim // group_size, out_dim) fp32  (in quantized units)
    """

    packed: jnp.ndarray
    scales: jnp.ndarray
    zeros: jnp.ndarray
    bits: int
    group_size: int
    in_dim: int
    out_dim: int
    act_dtype: jnp.dtype = jnp.bfloat16
    # "std" little-endian K-packing, or "magic" (bf16 magic-number kernel
    # layout with folded scales s/16 and zeros 256+16z; tile_k records the
    # per-tile extraction extent). See ops/quant_matmul_magic.py.
    layout: str = "std"
    tile_k: int = 0

    def tree_flatten(self):
        return (self.packed, self.scales, self.zeros), (
            self.bits, self.group_size, self.in_dim, self.out_dim,
            self.act_dtype, self.layout, self.tile_k,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def shape(self):
        return (self.in_dim, self.out_dim)

    @property
    def dtype(self):
        return self.act_dtype

    @property
    def per_word(self) -> int:
        return 32 // self.bits  # 8 for w4, 10 for w3 (2 bits wasted)


def _per_word(bits: int) -> int:
    return 32 // bits


def pack_int(q: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Pack (in_dim, out_dim) small ints into uint32 words along axis 0."""
    in_dim = q.shape[0]
    pw = _per_word(bits)
    pad = (-in_dim) % pw
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))
    q = q.astype(jnp.uint32).reshape(-1, pw, q.shape[1])
    shifts = (jnp.arange(pw, dtype=jnp.uint32) * bits)[None, :, None]
    return jnp.sum(q << shifts, axis=1, dtype=jnp.uint32)


def unpack_int(packed: jnp.ndarray, bits: int, in_dim: int) -> jnp.ndarray:
    """Inverse of pack_int → (in_dim, out_dim) int32 in [0, 2^bits)."""
    pw = _per_word(bits)
    mask = jnp.uint32((1 << bits) - 1)
    shifts = (jnp.arange(pw, dtype=jnp.uint32) * bits)[None, :, None]
    vals = (packed[:, None, :] >> shifts) & mask  # (words, pw, out)
    vals = vals.reshape(-1, packed.shape[1])
    return vals[:in_dim].astype(jnp.int32)


def quantize_weight(
    w: jnp.ndarray,
    bits: int = 4,
    group_size: int = 128,
    act_dtype=jnp.bfloat16,
    pad_in_to: Optional[int] = None,
    nibble_pack: bool = False,
) -> QuantizedWeight:
    """Asymmetric min/max group quantization of an (in_dim, out_dim) weight.

    ``pad_in_to``: zero-pad the reduction dim to this multiple before
    quantizing. Odd in-dims (e.g. LLaMA-7B's 11008) otherwise force tiny
    K-tiles in the fused kernel (the largest 128-multiple divisor of 11008
    is 256 → 344 kernel programs per matmul); padding to 1024 costs 2.3%
    extra weight bytes and keeps big tiles. ``quant_matmul`` zero-pads the
    activations to match, so results are exact.

    (OmniQuant checkpoints instead provide learned scales/zeros; see
    quant/omniquant.py — this function is the RTN fallback.)
    """
    if pad_in_to:
        pad = (-w.shape[0]) % pad_in_to
        if pad:
            w = jnp.pad(w, ((0, pad), (0, 0)))
    in_dim, out_dim = w.shape
    assert in_dim % group_size == 0, (in_dim, group_size)

    if bits == 3 and nibble_pack:
        # W3A16 on the fast path: quantize on the 3-bit grid (q ∈ [0,7])
        # but store in nibble containers so the fused W4 Pallas kernel
        # serves it — 0.5 bytes/weight instead of the ideal 0.375, in
        # exchange for kernel speed (the 10-per-word W3 packing doesn't
        # tile on TPU). Accuracy is exactly W3.
        wf = w.astype(jnp.float32).reshape(in_dim // group_size, group_size, out_dim)
        qmax3 = 7.0
        wmin = jnp.min(wf, axis=1)
        wmax = jnp.max(wf, axis=1)
        scales = jnp.maximum((wmax - wmin) / qmax3, 1e-10)
        zeros = jnp.round(-wmin / scales)
        q = jnp.clip(jnp.round(wf / scales[:, None, :]) + zeros[:, None, :],
                     0, qmax3)
        q = q.reshape(in_dim, out_dim).astype(jnp.int32)
        return QuantizedWeight(
            packed=pack_int(q, 4), scales=scales, zeros=zeros, bits=4,
            group_size=group_size, in_dim=in_dim, out_dim=out_dim,
            act_dtype=jnp.dtype(act_dtype))
    wf = w.astype(jnp.float32).reshape(in_dim // group_size, group_size, out_dim)
    qmax = float(2 ** bits - 1)
    wmin = jnp.min(wf, axis=1)
    wmax = jnp.max(wf, axis=1)
    scales = jnp.maximum((wmax - wmin) / qmax, 1e-10)
    zeros = jnp.round(-wmin / scales)
    q = jnp.clip(jnp.round(wf / scales[:, None, :]) + zeros[:, None, :], 0, qmax)
    q = q.reshape(in_dim, out_dim).astype(jnp.int32)
    return QuantizedWeight(
        packed=pack_int(q, bits),
        scales=scales,
        zeros=zeros,
        bits=bits,
        group_size=group_size,
        in_dim=in_dim,
        out_dim=out_dim,
        act_dtype=jnp.dtype(act_dtype),
    )


def to_magic_layout(qw: QuantizedWeight) -> QuantizedWeight:
    """Repack a std-layout W4 QuantizedWeight for the magic-number kernel
    (host-side one-time; see ops/quant_matmul_magic.py)."""
    from accessory_tpu.ops.quant_matmul_magic import (
        magic_constants, repack_for_magic)

    assert qw.layout == "std" and qw.bits == 4
    gs = qw.group_size
    tk = 4 * gs
    while qw.in_dim % (2 * tk) == 0 and 2 * tk <= 2048:
        tk *= 2
    assert qw.in_dim % tk == 0, (qw.in_dim, tk)
    if qw.packed.ndim == 3:  # stacked layers
        L = qw.packed.shape[0]
        pm = jnp.stack([repack_for_magic(qw.packed[i], qw.in_dim, tk)
                        for i in range(L)])
    else:
        pm = repack_for_magic(qw.packed, qw.in_dim, tk)
    s2, z2 = magic_constants(qw.scales.astype(jnp.float32),
                             qw.zeros.astype(jnp.float32))
    return QuantizedWeight(
        packed=pm, scales=s2, zeros=z2, bits=4, group_size=gs,
        in_dim=qw.in_dim, out_dim=qw.out_dim, act_dtype=qw.act_dtype,
        layout="magic", tile_k=tk)


def _scale_store_dtype(scale_dtype):
    """Resolve the on-HBM dtype for scales/folded-zeros. f32 (default) is
    exact; bfloat16 halves the 12.5% scales+zeros share of the weight
    stream (the kernels upcast blocks to f32 before any math). float16 is
    NOT supported: since r4 the kernels stream scales in their stored
    dtype and Mosaic rejects f16 blocks outright ("Unsupported type
    f16") — fail here with a clear message instead of at kernel lowering.
    Gate via ACCESSORY_SCALES_DTYPE."""
    if scale_dtype is None:
        scale_dtype = os.environ.get("ACCESSORY_SCALES_DTYPE", "float32")
    dt = jnp.dtype(scale_dtype)
    if dt == jnp.float16:
        raise ValueError(
            "ACCESSORY_SCALES_DTYPE=float16 is not supported: quant "
            "kernels stream scales in their stored dtype and Mosaic has "
            "no f16 lowering — use bfloat16 (or the float32 default)")
    return dt


def to_planes_layout(qw: QuantizedWeight, max_tk: int = 2048,
                     scale_dtype=None) -> QuantizedWeight:
    """Repack a std-layout W4 QuantizedWeight for the int8-staged nibble-
    plane kernel (ops/quant_matmul_planes.py). Host-side one-time; zeros are
    folded to zeros*scales so the kernel epilogue is q*s - zs."""
    from accessory_tpu.ops.quant_matmul_planes import (
        choose_tile_k, repack_for_planes)

    assert qw.layout == "std" and qw.bits == 4
    # NOTE: out_dim is NOT passed here — per-leaf width-aware retiling
    # would give wq (tk 1024) and wk/wv (tk 2048) mismatched tile_k and
    # silently break wqkv fusion; quant.fuse.fuse_for_decode retiles
    # AFTER fusing, when the final call widths are known.
    tk = choose_tile_k(qw.in_dim, qw.group_size, max_tk)
    if qw.packed.ndim == 3:  # stacked layers
        L = qw.packed.shape[0]
        pm = jnp.stack([repack_for_planes(qw.packed[i], qw.in_dim, tk)
                        for i in range(L)])
    else:
        pm = repack_for_planes(qw.packed, qw.in_dim, tk)
    sd = _scale_store_dtype(scale_dtype)
    s = qw.scales.astype(jnp.float32)
    zs = qw.zeros.astype(jnp.float32) * s
    return QuantizedWeight(
        packed=pm, scales=s.astype(sd), zeros=zs.astype(sd), bits=4,
        group_size=qw.group_size,
        in_dim=qw.in_dim, out_dim=qw.out_dim, act_dtype=qw.act_dtype,
        layout="planes", tile_k=tk)


def to_w8_layout(qw: QuantizedWeight, max_tk: int = 2048,
                 scale_dtype=None) -> QuantizedWeight:
    """Repack a std-layout W8 QuantizedWeight for the int8 W8A16 kernel
    (ops/quant_matmul_w8.py). packed becomes (K, N) int8 rows (values
    q - 128 so the [0, 255] grid fits int8); zeros are folded to
    (zeros - 128) * scales so the kernel epilogue is q8*s - zs.

    Reference role: bitsandbytes ``Linear8bitLt`` serving/QPEFT layout
    (accessory/util/quant.py:18-93)."""
    from accessory_tpu.ops.quant_matmul_w8 import (choose_tile_k_w8,
                                                   repack_for_w8)

    assert qw.layout == "std" and qw.bits == 8
    tk = choose_tile_k_w8(qw.in_dim, qw.group_size, max_tk)
    if qw.packed.ndim == 3:  # stacked layers
        L = qw.packed.shape[0]
        pm = jnp.stack([repack_for_w8(qw.packed[i], qw.in_dim)
                        for i in range(L)])
    else:
        pm = repack_for_w8(qw.packed, qw.in_dim)
    sd = _scale_store_dtype(scale_dtype)
    s = qw.scales.astype(jnp.float32)
    zs = (qw.zeros.astype(jnp.float32) - 128.0) * s
    s, zs = s.astype(sd), zs.astype(sd)
    return QuantizedWeight(
        packed=pm, scales=s, zeros=zs, bits=8, group_size=qw.group_size,
        in_dim=qw.in_dim, out_dim=qw.out_dim, act_dtype=qw.act_dtype,
        layout="w8", tile_k=tk)


def dequantize_weight(qw: QuantizedWeight, dtype=None) -> jnp.ndarray:
    """XLA reference dequant → (in_dim, out_dim) dense weight (std layout)."""
    assert qw.layout == "std", "dequantize magic-layout via the kernel"
    dtype = dtype or qw.act_dtype
    q = unpack_int(qw.packed, qw.bits, qw.in_dim).astype(jnp.float32)
    g = qw.group_size
    q = q.reshape(qw.in_dim // g, g, qw.out_dim)
    w = (q - qw.zeros[:, None, :]) * qw.scales[:, None, :]
    return w.reshape(qw.in_dim, qw.out_dim).astype(dtype)


def dense_weight(qw: QuantizedWeight, dtype=None) -> jnp.ndarray:
    """Layout-dispatching XLA dequant → (in_dim, out_dim) dense weight.

    Used by the large-m dequant-once path and by the quant-matmul backward
    rule (QPEFT: dL/dx = dL/dy @ W^T flows through every frozen quantized
    layer, reference peft.py LoRA over bnb Linear4bit base)."""
    dtype = dtype or qw.act_dtype
    if qw.layout == "std":
        return dequantize_weight(qw, dtype)
    if qw.layout == "planes":
        if jax.default_backend() == "tpu" and qw.packed.ndim == 2:
            # one-pass Pallas dequant (~stream rate) — the XLA unpack
            # chain materializes several (K, N) intermediates; this path
            # runs per frozen matmul per step in the QPEFT backward
            from accessory_tpu.ops.quant_matmul_bigm import planes_dequant

            return planes_dequant(qw.packed, qw.scales, qw.zeros,
                                  group_size=qw.group_size, tk=qw.tile_k,
                                  dtype=jnp.dtype(dtype))
        from accessory_tpu.ops.quant_matmul_planes import unpack_planes

        return unpack_planes(qw.packed, qw.in_dim, qw.tile_k, qw.group_size,
                             qw.scales, qw.zeros, dtype=dtype)
    if qw.layout == "w8":
        g = qw.group_size
        gr = qw.in_dim // g  # scale rows may be sublane-padded (fuse.py)
        qf = qw.packed.astype(jnp.float32).reshape(gr, g, qw.out_dim)
        w = (qf * qw.scales[:gr].astype(jnp.float32)[:, None, :]
             - qw.zeros[:gr].astype(jnp.float32)[:, None, :])
        return w.reshape(qw.in_dim, qw.out_dim).astype(dtype)
    raise NotImplementedError(f"dense_weight for layout {qw.layout!r}")


def _qw_from_aux(aux, packed, scales, zeros) -> QuantizedWeight:
    bits, g, in_dim, out_dim, adt_name, layout, tk = aux
    return QuantizedWeight(packed, scales, zeros, bits, g, in_dim, out_dim,
                           jnp.dtype(adt_name), layout, tk)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _kernel_qmm(aux, x2d, packed, scales, zeros):
    """Differentiable wrapper over the fused Pallas kernels (no-fusion
    form): forward runs the kernel; backward runs the XLA dequant
    transpose. Pallas calls have no autodiff rule, so without this QPEFT
    training (frozen W4/W8 base + trainable LoRA/norm/bias) fails on TPU —
    activation gradients must cross every frozen quantized matmul. The
    weight cotangents are structural zeros (packed is integer → float0);
    partition_params never requests them."""
    return _kernel_qmm_impl(aux, x2d, packed, scales, zeros)


def _kernel_qmm_impl(aux, x2d, packed, scales, zeros):
    bits, g, in_dim, out_dim, adt_name, layout, tk = aux
    interp = jax.default_backend() != "tpu"
    if layout == "planes":
        # LARGE-m calls (prefill/training fwd): the decode kernel
        # re-unpacks W per m-tile (m/128 redundant VPU dequants); the
        # weight-stationary bigm kernel dequantizes each block ONCE into
        # a VMEM scratch and reuses it across m-tiles — chip A/B (r4):
        # +14% at m=2048 w13-shape, +26% at m=4096 7B-w13-shape, never
        # slower. Sits inside the custom_vjp so QPEFT backward still
        # flows through the XLA dequant transpose.
        bigm = int(os.environ.get("ACCESSORY_QMM_BIGM", "1024"))
        from accessory_tpu.ops.quant_matmul_bigm import (bigm_supported,
                                                         planes_qmm_bigm)

        if bigm and x2d.shape[0] >= bigm and bigm_supported(in_dim):
            return planes_qmm_bigm(x2d, packed, scales, zeros,
                                   group_size=g, tk=tk, interpret=interp)
        from accessory_tpu.ops.quant_matmul_planes import planes_qmm

        return planes_qmm(x2d, packed, scales, zeros, group_size=g, tk=tk,
                          interpret=interp)
    if layout == "w8":
        from accessory_tpu.ops.quant_matmul_w8 import w8_qmm

        return w8_qmm(x2d, packed, scales, zeros, group_size=g, tk=tk,
                      interpret=interp)
    from accessory_tpu.ops.quant_matmul_pallas import quant_matmul_pallas

    return quant_matmul_pallas(x2d, _qw_from_aux(aux, packed, scales, zeros))


def _kernel_qmm_fwd(aux, x2d, packed, scales, zeros):
    return _kernel_qmm_impl(aux, x2d, packed, scales, zeros), (
        packed, scales, zeros)


def _kernel_qmm_bwd(aux, res, g_out):
    packed, scales, zeros = res
    adt = jnp.dtype(aux[4])
    w = dense_weight(_qw_from_aux(aux, packed, scales, zeros))
    dx = jnp.dot(g_out.astype(w.dtype), w.T).astype(adt)
    return (dx, np.zeros(packed.shape, jax.dtypes.float0),
            jnp.zeros_like(scales), jnp.zeros_like(zeros))


_kernel_qmm.defvjp(_kernel_qmm_fwd, _kernel_qmm_bwd)


def _kernel_qmm_dispatch(x2d, qw: QuantizedWeight):
    aux = (qw.bits, qw.group_size, qw.in_dim, qw.out_dim,
           jnp.dtype(qw.act_dtype).name, qw.layout, qw.tile_k)
    return _kernel_qmm(aux, x2d, qw.packed, qw.scales, qw.zeros)


def _dense_fused(x, w, norm_weight, norm_eps, residual, rope):
    """Dense-weight equivalent of the fused kernel call: same op order as
    the unfused module_linear_nr path (rms_norm → dot → rope → +residual),
    used by the large-m dequant-once dispatch."""
    from accessory_tpu.ops.norms import rms_norm
    from accessory_tpu.ops.rope import apply_rope_flat

    xn = x if norm_weight is None else rms_norm(x, norm_weight, norm_eps)
    y = jnp.dot(xn.astype(w.dtype), w)
    if rope is not None:
        cos_row, sin_row, style, hd = rope
        y = apply_rope_flat(y, cos_row, sin_row, style, hd)
    if residual is not None:
        y = residual.reshape(y.shape) + y
    return y


def quant_matmul(x: jnp.ndarray, qw: QuantizedWeight, use_pallas: Optional[bool] = None,
                 norm_weight: Optional[jnp.ndarray] = None,
                 norm_eps: float = 1e-5,
                 residual: Optional[jnp.ndarray] = None,
                 rope: Optional[tuple] = None) -> jnp.ndarray:
    """x @ dequant(qw). Dispatches to the fused Pallas kernel on TPU.

    The XLA path dequantizes per-call; XLA fuses unpack+scale into the matmul
    prologue reasonably well, but the Pallas kernel keeps packed words in VMEM
    and hits HBM at the 4-bit footprint (the point of W4A16 decode).

    ``norm_weight`` / ``residual`` fuse an RMSNorm prologue / residual-add
    epilogue into the planes kernel (callers must check eligibility via
    ops.linear.module_linear_nr — only the planes layout supports them).
    """
    # activations zero-pad to a padded reduction dim (see quantize_weight)
    if x.shape[-1] < qw.in_dim:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, qw.in_dim - x.shape[-1])]
        x = jnp.pad(x, pad)

    if qw.layout == "planes":
        from accessory_tpu.ops.quant_matmul_planes import planes_qmm

        lead = x.shape[:-1]
        x2d = x.reshape(-1, qw.in_dim).astype(qw.act_dtype)
        res2d = (None if residual is None
                 else residual.reshape(-1, qw.out_dim))
        # ACCESSORY_QMM_DENSE_M: XLA dequant-once + dense dot (kept for
        # A/Bs; measured slower than both Pallas paths on chip). LARGE-m
        # calls otherwise dispatch to the weight-stationary bigm kernel
        # inside _kernel_qmm_impl (keeps the custom_vjp for QPEFT).
        dense_m = int(os.environ.get("ACCESSORY_QMM_DENSE_M", "0"))
        if dense_m and x2d.shape[0] >= dense_m:
            return _dense_fused(x, dense_weight(qw), norm_weight, norm_eps,
                                residual, rope)
        if norm_weight is None and residual is None and rope is None:
            # differentiable wrapper (QPEFT backward crosses this matmul)
            out = _kernel_qmm_dispatch(x2d, qw)
            return out.reshape(*lead, qw.out_dim)
        # rope: (cos_row (N,), sin_row (N,), style, head_dim) — decode
        # RoPE epilogue (ops.rope.rope_rows)
        rope_cos, rope_sin, rope_style, rope_hd = (
            rope if rope is not None else (None, None, "", 0))
        out = planes_qmm(x2d, qw.packed, qw.scales, qw.zeros,
                         norm_weight, res2d, rope_cos, rope_sin,
                         group_size=qw.group_size, tk=qw.tile_k,
                         norm_eps=norm_eps, rope_style=rope_style,
                         rope_hd=rope_hd,
                         interpret=jax.default_backend() != "tpu")
        return out.reshape(*lead, qw.out_dim)

    if qw.layout == "w8":
        from accessory_tpu.ops.quant_matmul_w8 import w8_qmm

        lead = x.shape[:-1]
        x2d = x.reshape(-1, qw.in_dim).astype(qw.act_dtype)
        dense_m = int(os.environ.get("ACCESSORY_QMM_DENSE_M", "0"))
        if dense_m and x2d.shape[0] >= dense_m:
            return _dense_fused(x, dense_weight(qw), norm_weight, norm_eps,
                                residual, rope)
        if norm_weight is None and residual is None and rope is None:
            out = _kernel_qmm_dispatch(x2d, qw)
            return out.reshape(*lead, qw.out_dim)
        res2d = (None if residual is None
                 else residual.reshape(-1, qw.out_dim))
        rope_cos, rope_sin, rope_style, rope_hd = (
            rope if rope is not None else (None, None, "", 0))
        out = w8_qmm(x2d, qw.packed, qw.scales, qw.zeros,
                     norm_weight, res2d, rope_cos, rope_sin,
                     group_size=qw.group_size, tk=qw.tile_k,
                     norm_eps=norm_eps, rope_style=rope_style,
                     rope_hd=rope_hd,
                     interpret=jax.default_backend() != "tpu")
        return out.reshape(*lead, qw.out_dim)
    assert norm_weight is None and residual is None and rope is None, \
        "norm/residual/rope fusion is planes/w8-layout only"

    if qw.layout == "magic":
        from accessory_tpu.ops.quant_matmul_magic import magic_qmm

        lead = x.shape[:-1]
        x2d = x.reshape(-1, qw.in_dim).astype(qw.act_dtype)
        out = magic_qmm(x2d, qw.packed, qw.scales, qw.zeros,
                        group_size=qw.group_size, tk=qw.tile_k,
                        interpret=jax.default_backend() != "tpu")
        return out.reshape(*lead, qw.out_dim)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    # kernel constraints: W4 only (W3's 10-per-word packing doesn't tile),
    # 128-lane-aligned out dim, group aligned to the packing word
    eligible = (
        qw.packed.ndim == 2
        and qw.bits == 4
        and qw.group_size % 8 == 0
        and qw.in_dim % qw.group_size == 0
        and qw.out_dim % 128 == 0
    )
    if use_pallas and eligible:
        lead = x.shape[:-1]
        x2d = x.reshape(-1, qw.in_dim).astype(qw.act_dtype)
        return _kernel_qmm_dispatch(x2d, qw).reshape(*lead, qw.out_dim)
    w = dequantize_weight(qw)
    return jnp.dot(x.astype(qw.act_dtype), w)
