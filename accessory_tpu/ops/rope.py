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
