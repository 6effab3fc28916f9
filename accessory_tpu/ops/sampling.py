"""Token sampling: greedy and nucleus (top-p).

Reference semantics (accessory/model/meta.py:550-565 ``sample_top_p``):
softmax of temperature-scaled logits, sort descending, keep the smallest
prefix whose cumulative probability covers ``p`` (a token is dropped when the
cumulative mass *before* it already exceeds p), renormalize, sample.

Implemented jit-compatible with static shapes: one sort + cumsum + where,
then a Gumbel/categorical draw over the renormalized distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_top_p(probs: jnp.ndarray, p, key: jax.Array) -> jnp.ndarray:
    """Nucleus sampling. probs: (batch, vocab) fp32 probabilities.

    Matches reference: mask tokens where (cumsum - prob) > p, renormalize,
    multinomial draw. Returns (batch,) int32 token ids.
    """
    sorted_probs = jnp.sort(probs, axis=-1)[:, ::-1]
    sorted_idx = jnp.argsort(probs, axis=-1)[:, ::-1]
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep = (cum - sorted_probs) <= p
    filtered = jnp.where(keep, sorted_probs, 0.0)
    filtered = filtered / jnp.sum(filtered, axis=-1, keepdims=True)
    draw = jax.random.categorical(key, jnp.log(jnp.maximum(filtered, 1e-38)), axis=-1)
    return jnp.take_along_axis(sorted_idx, draw[:, None], axis=-1)[:, 0].astype(jnp.int32)


def sample_token(
    logits: jnp.ndarray,
    key: jax.Array,
    temperature: float = 0.0,
    top_p: float = 0.75,
) -> jnp.ndarray:
    """Greedy when temperature <= 0, else top-p at the given temperature.

    Reference: accessory/model/meta.py:438-443. logits: (batch, vocab).
    """
    if temperature > 0:
        probs = jax.nn.softmax(logits.astype(jnp.float32) / temperature, axis=-1)
        return sample_top_p(probs, top_p, key)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_token_batched(
    logits: jnp.ndarray,       # (b, vocab)
    key: jax.Array,
    temperature: jnp.ndarray,  # (b,) per-row; <= 0 means greedy
    top_p: jnp.ndarray,        # (b,)
) -> jnp.ndarray:
    """Per-row temperature/top-p sampling, fully inside jit — the
    continuous-batching scheduler samples every slot on-device in the decode
    step (one (b,) int fetch per step instead of (b, vocab) logits; per-token
    host fetches cost ~30 ms through the relay)."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    t = jnp.maximum(temperature, 1e-6)[:, None]
    probs = jax.nn.softmax(logits.astype(jnp.float32) / t, axis=-1)
    sampled = sample_top_p(probs, top_p[:, None], key)
    return jnp.where(temperature > 0, sampled, greedy)
