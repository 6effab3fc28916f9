"""Flash-attention dispatch for TPU.

Reference behavior being replaced: flash-attn CUDA kernels, used when
q_len == kv_len (training/prefill) with a causal mask
(accessory/model/LLM/llama.py:170-187 gating rules; the decode path with
q_len==1 uses sdpa). On TPU the equivalent is the Pallas flash-attention
kernel bundled with JAX (jax.experimental.pallas.ops.tpu.flash_attention —
blockwise online-softmax, O(L) memory, custom VJP for training).

GQA handling: the kernel wants equal q/kv head counts; we repeat KV heads
before the call (same as flash-attn's internal repeat, llama.py:80-89
``repeat_kv``). The XLA grouped path (ops.attention) stays the fallback and
numerical reference.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def flash_available(q_len: int, kv_len: int, causal: bool, head_dim: int) -> bool:
    if os.environ.get("ACCESSORY_TPU_FLASH", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    # kernel constraints: self-attention shape, lane-aligned head dim.
    # Non-128-divisible lengths (e.g. the SPHINX multimodal splice 259+64 =
    # 323 tokens) are zero-padded at the END inside flash_attention_tpu —
    # exact for causal masks: real query i < L only attends keys <= i < L,
    # so padded keys are causally masked out and padded query rows are
    # sliced off.
    return (causal and q_len == kv_len and q_len >= 128
            and head_dim in (64, 128, 256))


_SPLASH_CACHE = {}


def splash_block_sizes(s_q: int, s_kv: int):
    """Largest blocks that DIVIDE the (128-multiple) padded lengths —
    min(256, s) crashed on 128-multiple-but-not-256 lengths like the
    SPHINX multimodal prefill's 384 (q_block_size must divide s). Shared
    by the self-attention kernel and the context-parallel variant so the
    divisibility rule can't drift between them (r4 review)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk)

    bq = next(b for b in (256, 128) if s_q % b == 0)
    bkv = next(b for b in (512, 256, 128) if s_kv % b == 0)
    return sk.BlockSizes(block_q=bq, block_kv=bkv, block_kv_compute=bkv,
                         block_q_dkv=bq, block_kv_dkv=bkv,
                         block_kv_dkv_compute=bkv,
                         block_q_dq=bq, block_kv_dq=bkv)


def _splash_kernel(nq: int, s: int, interpret: bool):
    """Cached splash-attention kernel for (q_heads, padded_seq). Splash
    (the newer bundled TPU kernel) beats the legacy flash kernel ~2x at
    s=2048/hd=128 (chip A/B, BENCHMARKS.md r3 train section) and takes
    GQA natively — no KV head repeat, so k/v HBM traffic stays at the
    true KV head count. Block 256/512 measured best of the swept configs."""
    key = (nq, s, interpret)
    if key not in _SPLASH_CACHE:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk, splash_attention_mask as sm)

        mask = sm.MultiHeadMask([sm.CausalMask((s, s)) for _ in range(nq)])
        bs = splash_block_sizes(s, s)
        # the kernel object caches mask-info arrays; build them eagerly —
        # created under an active trace they'd be tracers, and the cache
        # would leak them into later traces (chip repro: second jit using
        # the same (nq, s) kernel dies with UnexpectedTracerError)
        with jax.ensure_compile_time_eval():
            _SPLASH_CACHE[key] = jax.vmap(sk.make_splash_mha(
                mask=mask, head_shards=1, q_seq_shards=1, block_sizes=bs,
                residual_checkpoint_name="splash_attn_out",
                interpret=interpret))
    return _SPLASH_CACHE[key]


def flash_attention_tpu(
    q: jnp.ndarray,  # (b, sq, nq, hd)
    k: jnp.ndarray,  # (b, sq, nkv, hd)
    v: jnp.ndarray,
    scale: Optional[float] = None,
    causal: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    b, sq, nq, hd = q.shape
    nkv = k.shape[2]
    # pad-and-mask: causal masking makes end-padding exact (see
    # flash_available); kernel block sizes need a 128-divisible sequence
    pad = (-sq) % 128
    if pad:
        assert causal, "end-padding is only exact under a causal mask"
        zpad = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, zpad), jnp.pad(k, zpad), jnp.pad(v, zpad)
    qt = q.transpose(0, 2, 1, 3)  # (b, h, s, d)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    sm_scale = scale if scale is not None else hd ** -0.5

    if os.environ.get("ACCESSORY_TPU_SPLASH", "1") == "1":
        kernel = _splash_kernel(nq, qt.shape[2], interpret)
        out = kernel((qt * sm_scale).astype(qt.dtype), kt, vt)
    else:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)

        n_rep = nq // nkv
        if n_rep > 1:
            kt = jnp.repeat(kt, n_rep, axis=1)
            vt = jnp.repeat(vt, n_rep, axis=1)
        out = flash_attention(qt, kt, vt, causal=causal, sm_scale=sm_scale)
    out = out.transpose(0, 2, 1, 3).astype(q.dtype)
    return out[:, :sq] if pad else out
