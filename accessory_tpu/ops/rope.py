"""Rotary position embeddings.

The reference computes RoPE as complex multiplication in fp32
(accessory/model/LLM/llama.py precompute_freqs_cis / apply_rotary_emb): pairs
are *consecutive* elements (x0,x1),(x2,x3),... ("interleaved" style). Falcon
instead pairs (x_i, x_{i+d/2}) ("half" / neox style, falcon.py:47-54). We
implement both with real sin/cos math in fp32 — no complex dtype needed, and
TPU-friendly because the interleaved variant is expressed as a reshape into
(..., d/2, 2) pairs rather than strided gathers.

Position-interpolation rope scaling (t * scaling) matches llama.py:46-56 and
configs/model/pretrain/rope_scaling*.json.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def precompute_rope(
    head_dim: int,
    max_len: int,
    theta: float = 10000.0,
    scaling: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (cos, sin), each (max_len, head_dim // 2), fp32."""
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    if scaling is not None:
        t = t * scaling
    angles = jnp.outer(t, freqs)  # (max_len, head_dim//2)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    style: str = "interleaved",
) -> jnp.ndarray:
    """Rotate q or k.

    x: (batch, seq, heads, head_dim); cos/sin: (seq, head_dim//2) shared
    across the batch, or (batch, seq, head_dim//2) for per-sequence positions
    (paged decode, where every slot sits at a different absolute position).
    Math in fp32, result cast back to x.dtype (reference rotates in fp32 and
    casts back with .type_as, llama.py apply_rotary_emb).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if cos.ndim == 3:
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
    else:
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
    if style == "interleaved":
        xr = xf.reshape(*xf.shape[:-1], -1, 2)
        x0, x1 = xr[..., 0], xr[..., 1]
        o0 = x0 * c - x1 * s
        o1 = x0 * s + x1 * c
        out = jnp.stack([o0, o1], axis=-1).reshape(xf.shape)
    elif style == "half":
        half = xf.shape[-1] // 2
        x0, x1 = xf[..., :half], xf[..., half:]
        o0 = x0 * c - x1 * s
        o1 = x0 * s + x1 * c
        out = jnp.concatenate([o0, o1], axis=-1)
    else:
        raise ValueError(f"unknown rope style: {style}")
    return out.astype(dtype)


def rope_rows(cos: jnp.ndarray, sin: jnp.ndarray, n_rot_heads: int,
              n_pass_heads: int, head_dim: int, style: str):
    """Per-column (cos_row, sin_row) for applying decode-RoPE directly on a
    flat fused-projection output (..., (n_rot+n_pass)*head_dim).

    cos/sin: (head_dim//2,) for ONE position (decode step; all rows share
    it). The rotation out[j] = y[j]*cos_row[j] + partner(y)[j]*sin_row[j]
    needs sin's sign folded per column (the first element of each pair
    subtracts its partner), and pass-through columns (the fused v
    projection) get cos=1, sin=0. Consumed by the planes-kernel epilogue
    (ops.quant_matmul_planes) and the XLA fallback apply_rope_flat."""
    hd = head_dim
    if style == "interleaved":
        c = jnp.repeat(cos, 2)
        s = jnp.repeat(sin, 2)
        sign = jnp.tile(jnp.asarray([-1.0, 1.0], jnp.float32), hd // 2)
    elif style == "half":
        c = jnp.tile(cos, 2)
        s = jnp.tile(sin, 2)
        sign = jnp.concatenate([jnp.full((hd // 2,), -1.0, jnp.float32),
                                jnp.ones((hd // 2,), jnp.float32)])
    else:
        raise ValueError(f"unknown rope style: {style}")
    cos_row = jnp.concatenate(
        [jnp.tile(c, n_rot_heads), jnp.ones((n_pass_heads * hd,))])
    sin_row = jnp.concatenate(
        [jnp.tile(s * sign, n_rot_heads), jnp.zeros((n_pass_heads * hd,))])
    return cos_row.astype(jnp.float32), sin_row.astype(jnp.float32)


def apply_rope_flat(y: jnp.ndarray, cos_row: jnp.ndarray,
                    sin_row: jnp.ndarray, style: str,
                    head_dim: int) -> jnp.ndarray:
    """XLA oracle/fallback for the fused flat-RoPE epilogue: rotate
    y (..., N) columnwise with rope_rows outputs. Bitwise-equivalent math
    to the kernel epilogue (f32 rotate, cast back)."""
    dtype = y.dtype
    yf = y.astype(jnp.float32)
    if style == "interleaved":
        yr = yf.reshape(*yf.shape[:-1], -1, 2)
        partner = jnp.stack([yr[..., 1], yr[..., 0]],
                            axis=-1).reshape(yf.shape)
    elif style == "half":
        half = head_dim // 2
        yr = yf.reshape(*yf.shape[:-1], -1, head_dim)
        partner = jnp.concatenate([yr[..., half:], yr[..., :half]],
                                  axis=-1).reshape(yf.shape)
    else:
        raise ValueError(f"unknown rope style: {style}")
    return (yf * cos_row + partner * sin_row).astype(dtype)
