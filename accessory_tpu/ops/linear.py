"""Linear application with pluggable weight representations.

A weight is either a plain jnp array of shape (in_dim, out_dim) or a
``QuantizedWeight`` (group-wise W4A16/W3A16, see accessory_tpu.quant). Model
code calls ``linear`` and never branches on representation — this is the TPU
equivalent of the reference's bitsandbytes layer swap
(accessory/util/quant.py:95-164), done by *value type* instead of module
monkey-patching.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp


def linear(x: jnp.ndarray, w, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: (..., in_dim) @ w: (in_dim, out_dim) [+ b]."""
    # Imported lazily to avoid a cycle (quant depends on ops for tests).
    from accessory_tpu.quant.qtensor import QuantizedWeight, quant_matmul

    if isinstance(w, QuantizedWeight):
        y = quant_matmul(x, w)
    else:
        y = jnp.dot(x, w)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def module_linear_nr(x: jnp.ndarray, mod: dict, *, norm: Optional[dict] = None,
                     eps: float = 1e-5,
                     residual: Optional[jnp.ndarray] = None,
                     rope: Optional[tuple] = None,
                     allow_fused: bool = True) -> jnp.ndarray:
    """``residual + module_linear(rms_norm(x), mod)`` with the norm and the
    add folded into the quant kernel when the weight is planes-W4 (decode is
    kernel-launch-bound; each fold removes an XLA elementwise launch —
    BENCHMARKS.md round 2). Falls back to the unfused ops elsewhere; both
    paths are bit-identical by construction (same op order and dtypes).

    ``rope``: (cos_row, sin_row, style, head_dim) decode-RoPE epilogue for
    the fused wqkv projection (ops.rope.rope_rows builds the rows); folded
    into the planes kernel, applied via apply_rope_flat elsewhere.

    ``allow_fused=False`` forces the unfused composition. Training paths
    MUST pass it: the fused kernel call has no autodiff rule (only the
    plain quant matmul carries a custom_vjp), and e.g. norm-only QPEFT
    differentiates through wo/w2 modules that would otherwise fuse.
    """
    from accessory_tpu.ops.norms import rms_norm
    from accessory_tpu.ops.rope import apply_rope_flat
    from accessory_tpu.quant.qtensor import QuantizedWeight, quant_matmul

    w = mod.get("weight")
    # kernel-epilogue fusions pay at DECODE (launch-bound, m=batch); at
    # large m they'd pin the call to the per-m-tile decode kernel and
    # miss the weight-stationary bigm path (r4 review) — route large-m
    # calls to the unfused composition (XLA norm/rope/residual fuse fine
    # at those shapes) so quant_matmul's m-threshold dispatch applies
    m_rows = 1
    for d in x.shape[:-1]:
        m_rows *= d
    bigm_t = int(os.environ.get("ACCESSORY_QMM_BIGM", "1024"))
    kernel_ok = (
        allow_fused
        and (not bigm_t or m_rows < bigm_t)
        and isinstance(w, QuantizedWeight) and w.layout in ("planes", "w8")
        and "lora_a" not in mod and mod.get("bias") is None
        and x.shape[-1] == w.in_dim)
    # the norm PROLOGUE needs the whole reduction row in one kernel program
    # (rms spans k-tiles), so it folds only when in_dim == tile_k
    norm_foldable = (norm is None
                     or (kernel_ok and w.in_dim == w.tile_k
                         and os.environ.get("ACCESSORY_NORM_FUSE",
                                            "1") == "1"))
    if kernel_ok and norm_foldable:
        return quant_matmul(
            x, w, norm_weight=None if norm is None else norm["weight"],
            norm_eps=eps, residual=residual, rope=rope)
    if kernel_ok:
        # multi-k-tile shapes (e.g. 7B: in_dim 4096 > tile_k 2048) can't
        # fold the norm — but rope/residual are OUTPUT epilogues and fuse
        # regardless. Routing the whole call unfused here left ~21 µs/layer
        # of XLA rope/interleave glue in the 7B decode step (r5 trace
        # budget); only the rms_norm itself stays an XLA op.
        xn = x if norm is None else rms_norm(x, norm["weight"], eps)
        return quant_matmul(xn, w, residual=residual, rope=rope)
    xn = x if norm is None else rms_norm(x, norm["weight"], eps)
    y = module_linear(xn, mod)
    if rope is not None:
        cos_row, sin_row, style, hd = rope
        y = apply_rope_flat(y, cos_row, sin_row, style, hd)
    return y if residual is None else residual + y


def module_linear(x: jnp.ndarray, mod: dict) -> jnp.ndarray:
    """Apply a linear "module" dict: {"weight", ["bias"], ["lora_a","lora_b"]}.

    The value-typed equivalent of the reference's Lora*ParallelLinear layer
    classes (accessory/model/peft.py:23-268): y = x@W [+ b] + (x@A)@B, with
    lora_b zero-initialized so finetuning starts at the base function. Key
    presence is static under jit, so non-PEFT models pay nothing.
    """
    y = linear(x, mod["weight"], mod.get("bias"))
    if "lora_a" in mod:
        y = y + linear(linear(x, mod["lora_a"]), mod["lora_b"]).astype(y.dtype)
    return y
