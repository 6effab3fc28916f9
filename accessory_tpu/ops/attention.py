"""Attention — XLA reference implementation.

Covers the three shapes the reference hits (accessory/model/LLM/llama.py
Attention.forward):
  * training / prefill: q_len == kv_len, causal
  * incremental decode: q_len == 1 (or a chunk) attending to a KV cache prefix
  * GQA (n_kv_heads < n_heads, llama.py repeat_kv)

TPU-first differences from the reference:
  * GQA is computed *grouped* — q is reshaped to (kv_head, group) so the KV is
    never materialized repeated (the reference expands via repeat_kv).
  * masking is positional (q_offset + kv_len) rather than a materialized
    (L, L) additive mask, so the same code serves prefill and decode and XLA
    can fuse the comparison into the softmax.
  * softmax in fp32 regardless of activation dtype (numerics parity).

The Pallas flash-attention kernel (ops/flash_attention.py) replaces this for
long-sequence prefill; this is the always-correct fallback and the numerical
reference for kernel tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    q_offset=0,
    kv_len: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention with grouped GQA and positional masking.

    Args:
      q: (batch, q_len, n_heads, head_dim)
      k, v: (batch, kv_len_max, n_kv_heads, head_dim)
      causal: apply causal masking (query position >= key position).
      q_offset: absolute position of q[0] within the KV timeline (scalar or
        (batch,) array). During decode this is the current cache length.
      kv_len: optional (batch,) number of valid KV entries (for padded caches).
      scale: defaults to head_dim ** -0.5.

    Returns (batch, q_len, n_heads, head_dim) in q.dtype.
    """
    b, sq, nq, hd = q.shape
    _, skv, nkv, _ = k.shape
    assert nq % nkv == 0, (nq, nkv)
    n_rep = nq // nkv
    if scale is None:
        scale = hd ** -0.5

    # Pallas flash kernel for the self-attention case (training / no-cache
    # prefill) — mirrors the reference's flash gating (llama.py:181-187:
    # flash only when q_len == kv_len with causal mask)
    if kv_len is None and causal and isinstance(q_offset, int) and q_offset == 0:
        from accessory_tpu.ops.flash_attention import (
            flash_attention_tpu, flash_available)

        if flash_available(sq, skv, causal, hd):
            return flash_attention_tpu(q, k, v, scale=scale, causal=True)

    qg = q.reshape(b, sq, nkv, n_rep, hd)
    # scores: (b, nkv, n_rep, sq, skv), accumulated in fp32 on the MXU
    scores = jnp.einsum(
        "bqkrh,bskh->bkrqs", qg, k, preferred_element_type=jnp.float32
    ) * scale

    q_pos = jnp.asarray(q_offset)
    if q_pos.ndim == 0:
        q_pos = q_pos[None]  # (1,) broadcasts over batch
    q_ids = q_pos[:, None] + jnp.arange(sq)[None, :]  # (b|1, sq)
    kv_ids = jnp.arange(skv)[None, :]  # (1, skv)

    mask = jnp.ones((q_ids.shape[0], sq, skv), dtype=bool)
    if causal:
        mask = mask & (kv_ids[:, None, :] <= q_ids[:, :, None])
    if kv_len is not None:
        kv_len = jnp.asarray(kv_len)
        if kv_len.ndim == 0:
            kv_len = kv_len[None]
        mask = mask & (kv_ids[:, None, :] < kv_len[:, None, None])
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkrqs,bskh->bqkrh", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, sq, nq, hd).astype(q.dtype)


def cached_attention(
    q: jnp.ndarray,       # (b, sq, nq, hd) — the new chunk's queries
    k_new: jnp.ndarray,   # (b, sq, nkv, hd) — new keys (not yet in cache)
    v_new: jnp.ndarray,
    cache_k: jnp.ndarray,  # (b, S, nkv, hd) — cache BEFORE this chunk
    cache_v: jnp.ndarray,
    pos,                   # scalar: number of valid tokens already cached
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Decode/prefill attention WITHOUT writing the cache first.

    Equivalent to writing k_new/v_new at [pos, pos+sq) and attending over
    cache[:pos+sq], but computed as a two-part softmax:
      scores = [q·K_old (masked < pos) ; q·k_new (causal within chunk)]
    so the cache stays a READ-ONLY input. This matters under lax.scan: a
    cache carried through scan outputs is materialized fresh every layer
    (measured 6x decode slowdown at 7B-MHA scale); read-only xs are sliced
    without copies, and the model does ONE bulk cache write per step outside
    the scan.
    """
    b, sq, nq, hd = q.shape
    skv = cache_k.shape[1]
    nkv = cache_k.shape[2]
    n_rep = nq // nkv
    if scale is None:
        scale = hd ** -0.5

    qg = q.reshape(b, sq, nkv, n_rep, hd)
    s_old = jnp.einsum("bqkrh,bskh->bkrqs", qg, cache_k,
                       preferred_element_type=jnp.float32) * scale
    pos_arr = jnp.asarray(pos)
    if pos_arr.ndim == 0:
        pos_arr = pos_arr[None]  # (1,) broadcasts; (b,) = per-slot positions
    old_mask = jnp.arange(skv)[None, :] < pos_arr[:, None]  # (b|1, skv)
    s_old = jnp.where(old_mask[:, None, None, None, :], s_old, NEG_INF)

    s_new = jnp.einsum("bqkrh,bskh->bkrqs", qg, k_new,
                       preferred_element_type=jnp.float32) * scale
    # causal[q_i, k_j] = new key j visible to new query i iff j <= i
    causal = jnp.arange(sq)[None, :] <= jnp.arange(sq)[:, None]  # (sq_q, sq_k)
    s_new = jnp.where(causal[None, None, None, :, :], s_new, NEG_INF)

    scores = jnp.concatenate([s_old, s_new], axis=-1)
    probs = jax.nn.softmax(scores, axis=-1)
    p_old, p_new = probs[..., :skv], probs[..., skv:]
    out = jnp.einsum("bkrqs,bskh->bqkrh", p_old.astype(cache_v.dtype), cache_v,
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("bkrqs,bskh->bqkrh", p_new.astype(v_new.dtype),
                           v_new, preferred_element_type=jnp.float32)
    return out.reshape(b, sq, nq, hd).astype(q.dtype)
