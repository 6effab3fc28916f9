"""Normalization layers.

The reference uses apex ``FusedRMSNorm`` when available, else a hand-rolled
RMSNorm computing in fp32 (accessory/model/components.py:5-53). On TPU, XLA
fuses the jnp expression into surrounding ops natively, so no Pallas kernel is
needed — this *is* the fused implementation.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm with fp32 accumulation, output cast back to input dtype.

    Matches reference numerics: x * rsqrt(mean(x^2) + eps) computed in fp32
    (accessory/model/components.py RMSNorm._norm), then scaled by weight.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    normed = xf * jnp.reciprocal(jnp.sqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps))
    return (normed * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm in fp32 (used by Falcon and InternLM ``norm_type=layernorm``)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps)) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)
