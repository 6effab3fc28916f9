"""Pallas decode attention over a lane-major KV cache.

Round-2 finding (BENCHMARKS.md): XLA decode attention on the natural
(B, S, NKV, HD) cache ran at ~183 GB/s — head_dim=64 puts only half a
vector lane to work and the einsum needs a physical transpose of the cache
every layer. This kernel flips the cache to (B, NKV, HD, S): the context
axis S lands on the 128-wide lane dimension, scores (R, S) come from one
MXU dot contracting HD, the softmax reduces along lanes, and the value
contraction is an NT dot over S — the cache streams exactly once, no
relayout.

Two-part softmax (same contract as ops.attention.cached_attention): the
cache stays READ-ONLY (scan xs — carried caches copy every layer) and the
current token's k/v ride separately; the model does one bulk write per step
outside the layer scan.

Reference role: the decode branch of accessory/model/LLM/llama.py
Attention.forward (cache read + sdpa).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(lens_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref, out_ref):
    """Grid (B, NKV). Blocks: q (1,1,R,HD); kn/vn (1,1,HD); kc/vc
    (1,1,HD,S); out (1,1,R,HD). lens: SMEM (B,)."""
    b = pl.program_id(0)
    length = lens_ref[b]

    q = q_ref[0, 0]                                # (R, HD) act dtype
    kc = kc_ref[0, 0]                              # (HD, S) bf16
    vc = vc_ref[0, 0]
    S = kc.shape[1]
    hd = q.shape[1]
    scale = hd ** -0.5

    # MXU consumes bf16 operands directly with fp32 accumulation — no
    # whole-cache VPU upcast. For f32 caches force HIGHEST precision:
    # Mosaic otherwise lowers f32 dots to single bf16 passes (measured
    # 4e-3-relative logit error on chip).
    prec = (jax.lax.Precision.HIGHEST if kc.dtype == jnp.float32 else None)
    s_old = jax.lax.dot_general(
        q, kc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec) * scale                              # (R, S) f32
    mask = jax.lax.broadcasted_iota(jnp.int32, s_old.shape, 1) < length
    s_old = jnp.where(mask, s_old, NEG_INF)

    kn = kn_ref[0, 0, 0].astype(jnp.float32)       # (HD,)
    vn = vn_ref[0, 0, 0].astype(jnp.float32)
    qf = q.astype(jnp.float32)
    s_new = jnp.sum(qf * kn[None, :], axis=1, keepdims=True) * scale  # (R, 1)

    m = jnp.maximum(jnp.max(s_old, axis=1, keepdims=True), s_new)
    p_old = jnp.exp(s_old - m)                     # (R, S) f32
    p_new = jnp.exp(s_new - m)                     # (R, 1)
    denom = jnp.sum(p_old, axis=1, keepdims=True) + p_new

    out = jax.lax.dot_general(
        p_old.astype(vc.dtype), vc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # (R, HD)
    out = out + p_new * vn[None, :]
    out_ref[0, 0] = (out / denom).astype(out_ref.dtype)


def _kernel_bloop(lens_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref, out_ref):
    """Grid (NKV, B // b_blk) with an unrolled loop over a batch block
    inside each program.

    Rationale (BENCHMARKS.md round 2): the grid-(B, NKV) kernel issues
    B*NKV*L tiny programs per decode step (704 at TinyLlama scale) and the
    fixed per-program cost put it at ~2.5x its streaming bound. Same math,
    b_blk x the work per program: blocks are (b_blk, 1, ...) and the batch
    loop is a static Python loop, so the cache still streams exactly once.
    b_blk is picked so double-buffered cache blocks fit VMEM (~16 MB/core).
    """
    B = q_ref.shape[0]
    base = pl.program_id(1) * B
    hd = q_ref.shape[3]
    scale = hd ** -0.5
    prec = (jax.lax.Precision.HIGHEST if kc_ref.dtype == jnp.float32
            else None)
    for b in range(B):
        length = lens_ref[base + b]
        q = q_ref[b, 0]                                # (R, HD)
        kc = kc_ref[b, 0]                              # (HD, S)
        vc = vc_ref[b, 0]
        s_old = jax.lax.dot_general(
            q, kc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec) * scale                    # (R, S)
        mask = jax.lax.broadcasted_iota(jnp.int32, s_old.shape, 1) < length
        s_old = jnp.where(mask, s_old, NEG_INF)

        kn = kn_ref[b, 0, 0].astype(jnp.float32)       # (HD,)
        vn = vn_ref[b, 0, 0].astype(jnp.float32)
        qf = q.astype(jnp.float32)
        s_new = jnp.sum(qf * kn[None, :], axis=1, keepdims=True) * scale

        m = jnp.maximum(jnp.max(s_old, axis=1, keepdims=True), s_new)
        p_old = jnp.exp(s_old - m)
        p_new = jnp.exp(s_new - m)
        denom = jnp.sum(p_old, axis=1, keepdims=True) + p_new

        out = jax.lax.dot_general(
            p_old.astype(vc.dtype), vc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        out = out + p_new * vn[None, :]
        out_ref[b, 0] = (out / denom).astype(out_ref.dtype)


def _kernel_bloop_w(lens_ref, pos_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref,
                    out_ref, outk_ref, outv_ref):
    """_kernel_bloop + fused cache update: the program already holds the
    full (HD, S) cache blocks and the new k/v vectors, so writing the new
    token's column costs one masked store of the 128-lane tile containing
    ``pos`` (outk/outv alias the cache pools; their index_map selects the
    tile). Kills the separate write call per layer (measured 0.255 ms/step
    at TinyLlama scale — BENCHMARKS.md round 2)."""
    B = q_ref.shape[0]
    base = pl.program_id(1) * B
    hd = q_ref.shape[3]
    scale = hd ** -0.5
    pos = pos_ref[0]
    tile0 = pl.multiple_of((pos // 128) * 128, 128)
    col = jax.lax.rem(pos, 128)
    prec = (jax.lax.Precision.HIGHEST if kc_ref.dtype == jnp.float32
            else None)
    for b in range(B):
        length = lens_ref[base + b]
        q = q_ref[b, 0]                                # (R, HD)
        kc = kc_ref[b, 0]                              # (HD, S)
        vc = vc_ref[b, 0]
        s_old = jax.lax.dot_general(
            q, kc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec) * scale                    # (R, S)
        mask = jax.lax.broadcasted_iota(jnp.int32, s_old.shape, 1) < length
        s_old = jnp.where(mask, s_old, NEG_INF)

        kn = kn_ref[b, 0, 0].astype(jnp.float32)       # (HD,)
        vn = vn_ref[b, 0, 0].astype(jnp.float32)
        qf = q.astype(jnp.float32)
        s_new = jnp.sum(qf * kn[None, :], axis=1, keepdims=True) * scale

        m = jnp.maximum(jnp.max(s_old, axis=1, keepdims=True), s_new)
        p_old = jnp.exp(s_old - m)
        p_new = jnp.exp(s_new - m)
        denom = jnp.sum(p_old, axis=1, keepdims=True) + p_new

        out = jax.lax.dot_general(
            p_old.astype(vc.dtype), vc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        out = out + p_new * vn[None, :]
        out_ref[b, 0] = (out / denom).astype(out_ref.dtype)

        # fused cache update: RMW the (HD, 128) tile holding ``pos``
        # (ref-level pl.ds load — Mosaic has no value-level dynamic_slice)
        # minor-dim insertion must happen in 32-bit (Mosaic constraint), so
        # select in f32 on the already-upcast kn/vn and cast the tile back
        wmask = jax.lax.broadcasted_iota(jnp.int32, (hd, 128), 1) == col
        oldk = kc_ref[b, 0, :, pl.ds(tile0, 128)].astype(jnp.float32)
        oldv = vc_ref[b, 0, :, pl.ds(tile0, 128)].astype(jnp.float32)
        outk_ref[b, 0] = jnp.where(wmask, kn[:, None],
                                   oldk).astype(outk_ref.dtype)
        outv_ref[b, 0] = jnp.where(wmask, vn[:, None],
                                   oldv).astype(outv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("b_blk", "interpret"))
def _decode_attn_bloop_w(q, k_new, v_new, cache_k, cache_v, lengths, pos,
                         b_blk, interpret=False):
    """Fused decode attention + cache update. Returns (out, new_k_pool,
    new_v_pool); the pools alias the inputs (in-place tile write)."""
    b, nkv, r, hd = q.shape
    S = cache_k.shape[3]
    head = lambda j, i, lens, p: (i, j, 0, 0)
    tile = lambda j, i, lens, p: (i, j, 0, p[0] // 128)
    pool_shape = jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype)
    out, wk, wv = pl.pallas_call(
        _kernel_bloop_w,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nkv, b // b_blk),
            in_specs=[
                pl.BlockSpec((b_blk, 1, r, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, hd, S), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, hd, S), head,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((b_blk, 1, r, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, hd, 128), tile,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, hd, 128), tile,
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, nkv, r, hd), q.dtype),
                   pool_shape, pool_shape],
        # flat inputs incl. scalar prefetch: lens(0) pos(1) q(2) kn(3)
        # vn(4) kc(5) vc(6) → alias the pools to outputs 1/2
        input_output_aliases={5: 1, 6: 2},
        interpret=interpret,
    )(lengths.astype(jnp.int32),
      jnp.reshape(jnp.asarray(pos, jnp.int32), (1,)),
      q, k_new, v_new, cache_k, cache_v)
    return out, wk, wv


def decode_attention_update(q, k_new, v_new, cache_k, cache_v, pos,
                            use_pallas: Optional[bool] = None):
    """Decode attention + in-place cache update in ONE kernel call.

    q (b, 1, nq, hd); k_new/v_new (b, 1, nkv, hd); cache (b, nkv, hd, S)
    lane-major per-layer pools; pos scalar. Returns (out (b, 1, nq, hd),
    new_cache_k, new_cache_v). Falls back to cached_attention_t +
    write_kv_layer when the fused kernel's constraints don't hold — both
    paths: attention reads only tokens < pos, then the new column lands."""
    b, sq, nq, hd = q.shape
    nkv, S = cache_k.shape[1], cache_k.shape[3]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if sq == 1 and hd % 8 == 0 and S % 128 == 0 and \
            os.environ.get("ACCESSORY_FUSED_ATTN_WRITE", "1") == "1":
        qg = q.reshape(b, nkv, nq // nkv, hd)
        kn = k_new.reshape(b, nkv, 1, hd)
        vn = v_new.reshape(b, nkv, 1, hd)
        pos_arr = jnp.broadcast_to(jnp.asarray(pos)[None], (b,))
        # Chip-measured negative results (round 3, exps/bench_attn_bblk.py
        # + BENCHMARKS.md "attention restructure A/Bs"), both deleted:
        #   - block-diagonal head folding (all NKV heads in one MXU dot
        #     pair): standalone parity with this kernel, no faster — the
        #     kernel is DMA-bound, not dot-issue-bound.
        #   - write-first + multi-stream read (each pool passed once per
        #     head = 2*nkv parallel DMA streams): the read kernel alone
        #     hits 685 GB/s vs 450 here, but the separate aliased column
        #     write costs ~8 us/layer of fixed launch+DMA latency and the
        #     combination loses 6.5% at 1k ctx / 9% at 4k end-to-end.
        #     The multi-stream DMA finding stands (see the --stream probe)
        #     and is the lever to reach >620 GB/s if attention ever
        #     dominates; the fused write below is what makes this kernel
        #     win end-to-end.
        # MHA-class models (R=1, many KV heads) dispatch to the
        # head-GROUPED kernel: softmax on (G, S) blocks instead of (1, S)
        # rows — the per-(b,head) instruction floor (~0.5 µs) dominates the
        # memory floor there (r5 7B trace budget; see kernel docstring)
        g_blk = _pick_g_blk(nkv, nq // nkv, hd, S,
                            cache_k.dtype.itemsize)
        if g_blk:
            out, wk, wv = _decode_attn_hgrp_w(
                qg, kn, vn, cache_k, cache_v, pos_arr, pos, g_blk=g_blk,
                interpret=not use_pallas)
            return out.reshape(b, 1, nq, hd), wk, wv
        b_blk = _pick_b_blk(b, hd, S, cache_k.dtype.itemsize)
        out, wk, wv = _decode_attn_bloop_w(
            qg, kn, vn, cache_k, cache_v, pos_arr, pos, b_blk=b_blk,
            interpret=not use_pallas)
        return out.reshape(b, 1, nq, hd), wk, wv
    out = cached_attention_t(q, k_new, v_new, cache_k, cache_v, pos,
                             use_pallas=use_pallas)
    wk, wv = write_kv_layer(cache_k, cache_v, k_new, v_new, pos)
    return out, wk, wv


# leave headroom for double buffering + q/out blocks in ~16 MB VMEM
_VMEM_BUDGET = 6 * 1024 * 1024


def _pick_b_blk(b, hd, S, itemsize) -> int:
    b_blk = b
    while b_blk > 1 and 2 * b_blk * hd * S * itemsize > _VMEM_BUDGET:
        b_blk //= 2
    return b_blk if b % b_blk == 0 else 1


@functools.partial(jax.jit, static_argnames=("b_blk", "interpret"))
def _decode_attn_bloop(q, k_new, v_new, cache_k, cache_v, lengths,
                       b_blk, interpret=False):
    b, nkv, r, hd = q.shape
    S = cache_k.shape[3]
    head = lambda j, i, lens: (i, j, 0, 0)
    return pl.pallas_call(
        _kernel_bloop,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nkv, b // b_blk),
            in_specs=[
                pl.BlockSpec((b_blk, 1, r, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, hd, S), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, hd, S), head,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b_blk, 1, r, hd), head,
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, nkv, r, hd), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, k_new, v_new, cache_k, cache_v)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode_attn_pallas(q, k_new, v_new, cache_k, cache_v, lengths,
                        interpret=False):
    b, nkv, r, hd = q.shape
    S = cache_k.shape[3]
    grid = (b, nkv)
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, r, hd), lambda i, j, lens: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, hd), lambda i, j, lens: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, hd), lambda i, j, lens: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, hd, S), lambda i, j, lens: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, hd, S), lambda i, j, lens: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, r, hd),
                                   lambda i, j, lens: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, nkv, r, hd), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, k_new, v_new, cache_k, cache_v)


def cached_attention_t(
    q: jnp.ndarray,        # (b, sq, nq, hd)
    k_new: jnp.ndarray,    # (b, sq, nkv, hd)
    v_new: jnp.ndarray,
    cache_k: jnp.ndarray,  # (b, nkv, hd, S) — lane-major layout
    cache_v: jnp.ndarray,
    pos,                   # scalar or (b,) valid tokens already cached
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Two-part-softmax attention over the lane-major cache. sq == 1 decode
    dispatches to the Pallas kernel on TPU; the XLA path (also the numerics
    oracle) serves chunked prefill and other backends."""
    b, sq, nq, hd = q.shape
    nkv, S = cache_k.shape[1], cache_k.shape[3]
    n_rep = nq // nkv

    pos_arr = jnp.asarray(pos)
    if pos_arr.ndim == 0:
        pos_arr = jnp.broadcast_to(pos_arr[None], (b,))

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    # STATIC pos==0 full prefill: nothing valid in the cache, so this is
    # plain causal self-attention — dispatch to the flash/splash path
    # instead of the O(L^2) two-part-softmax einsums (r4 TTFT trace: the
    # cached-prefill XLA path was ~50 ms of the 118 ms 2048-token
    # prefill; splash does the same work in ~6)
    if isinstance(pos, int) and pos == 0 and sq > 1:
        from accessory_tpu.ops.attention import attention

        return attention(q, k_new, v_new, causal=True, q_offset=0)
    if sq == 1 and hd % 8 == 0 and S % 128 == 0:
        qg = q.reshape(b, nkv, n_rep, hd)
        kn = k_new.reshape(b, nkv, 1, hd)
        vn = v_new.reshape(b, nkv, 1, hd)
        # ACCESSORY_DECODE_ATTN=grid forces the old (B, NKV)-grid kernel
        # (perf-ablation hook; bloop is the default — BENCHMARKS.md round 2)
        if os.environ.get("ACCESSORY_DECODE_ATTN") == "grid":
            out = _decode_attn_pallas(qg, kn, vn, cache_k, cache_v, pos_arr,
                                      interpret=not use_pallas)
        else:
            b_blk = _pick_b_blk(b, hd, S, cache_k.dtype.itemsize)
            out = _decode_attn_bloop(qg, kn, vn, cache_k, cache_v, pos_arr,
                                     b_blk=b_blk, interpret=not use_pallas)
        return out.reshape(b, 1, nq, hd)

    # XLA fallback (chunked prefill into a cache, CPU tests)
    scale = hd ** -0.5
    qg = q.reshape(b, sq, nkv, n_rep, hd)
    s_old = jnp.einsum("bqkrh,bkhs->bkrqs", qg.astype(jnp.float32),
                       cache_k.astype(jnp.float32)) * scale
    old_mask = jnp.arange(S)[None, :] < pos_arr[:, None]
    s_old = jnp.where(old_mask[:, None, None, None, :], s_old, NEG_INF)
    s_new = jnp.einsum("bqkrh,bskh->bkrqs", qg.astype(jnp.float32),
                       k_new.astype(jnp.float32)) * scale
    causal = jnp.arange(sq)[None, :] <= jnp.arange(sq)[:, None]
    s_new = jnp.where(causal[None, None, None, :, :], s_new, NEG_INF)
    scores = jnp.concatenate([s_old, s_new], axis=-1)
    probs = jax.nn.softmax(scores, axis=-1)
    p_old, p_new = probs[..., :S], probs[..., S:]
    out = jnp.einsum("bkrqs,bkhs->bqkrh", p_old,
                     cache_v.astype(jnp.float32))
    out = out + jnp.einsum("bkrqs,bskh->bqkrh", p_new,
                           v_new.astype(jnp.float32))
    return out.reshape(b, sq, nq, hd).astype(q.dtype)


def _col_write_kernel(pos_ref, updk_ref, updv_ref, ck_ref, cv_ref,
                      outk_ref, outv_ref):
    """Grid (L, NKV/nb). Blocks: upd (1,B,nb,HD,1); cache/out
    (1,B,nb,HD,128) — the single 128-lane tile containing ``pos``, selected
    by the scalar-prefetched position in the index_map. Outputs alias the
    caches, so the rest of each pool is untouched: per step only
    2*L*B*NKV*HD*128 elements move (~46 MB r+w at TinyLlama scale) instead
    of the whole pools. The NKV tiling keeps blocks under the 16 MB scoped
    VMEM limit for MHA models (7B: B8*NKV32*HD128 tiles are 16 MB each).

    Both pools are written by ONE call on purpose: with separate aliased
    calls, XLA memory-space assignment round-trips the second pool through
    alternate memory (two full-pool copies per step, seen in compiled HLO —
    BENCHMARKS.md round 2)."""
    col = jax.lax.rem(pos_ref[0], 128)
    for upd_ref, blk_ref, out_ref in ((updk_ref, ck_ref, outk_ref),
                                      (updv_ref, cv_ref, outv_ref)):
        blk = blk_ref[...]
        mask = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 4) == col
        out_ref[...] = jnp.where(mask, upd_ref[...], blk)


def _pick_nkv_blk(b, nkv, hd, itemsize, budget=1024 * 1024) -> int:
    # the 16 MB scoped-vmem limit must hold in+out blocks for BOTH pools
    # plus grid double-buffering (~6x one pool block, observed on 7B)
    nb = nkv
    while nb > 1 and 2 * b * nb * hd * 128 * itemsize > budget:
        nb //= 2
    return nb if nkv % nb == 0 else 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def _write_col_inplace(cache_k, cache_v, upd_k, upd_v, pos, interpret=False):
    L, B, NKV, HD, S = cache_k.shape
    nb = _pick_nkv_blk(B, NKV, HD, cache_k.dtype.itemsize)
    tile = lambda l, n, scal: (l, 0, n, 0, scal[0] // 128)
    upd_spec = pl.BlockSpec((1, B, nb, HD, 1),
                            lambda l, n, scal: (l, 0, n, 0, 0),
                            memory_space=pltpu.VMEM)
    pool_spec = pl.BlockSpec((1, B, nb, HD, 128), tile,
                             memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype)
    return pl.pallas_call(
        _col_write_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, NKV // nb),
            in_specs=[upd_spec, upd_spec, pool_spec, pool_spec],
            out_specs=[pool_spec, pool_spec],
        ),
        out_shape=[shape, shape],
        # inputs are (scalar_prefetch, updk, updv, ck, cv) → alias both pools
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(pos, jnp.int32), (1,)),
      upd_k, upd_v, cache_k, cache_v)


def _write_kernel(pos_ref, updk_ref, updv_ref, ck_ref, cv_ref,
                  outk_ref, outv_ref, semk, semv):
    """Aliased in-place slot write: DMA the update hyperslabs into both
    caches at [..., pos:pos+sq]. Caches alias the outputs, so XLA performs
    NO copy of the pools (lax.dynamic_update_slice was measured to copy the
    whole cache per step even with donation; separate per-pool aliased calls
    make memory-space assignment round-trip one pool — see _col_write_kernel)."""
    # dispatch guarantees a statically-128-aligned pos (Mosaic must prove
    # lane-dim DMA offsets divisible by the tiling)
    pos = pl.multiple_of(pos_ref[0], 128)
    sq = updk_ref.shape[-1]
    dk = pltpu.make_async_copy(
        updk_ref, outk_ref.at[:, :, :, :, pl.ds(pos, sq)], semk)
    dv = pltpu.make_async_copy(
        updv_ref, outv_ref.at[:, :, :, :, pl.ds(pos, sq)], semv)
    dk.start()
    dv.start()
    dk.wait()
    dv.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _write_inplace(cache_k, cache_v, upd_k, upd_v, pos, interpret=False):
    shape = jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    return pl.pallas_call(
        _write_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[any_spec] * 4,
            out_specs=[any_spec] * 2,
            scratch_shapes=[pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        ),
        out_shape=[shape, shape],
        # inputs are (scalar_prefetch, updk, updv, ck, cv) → alias both pools
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(jnp.asarray([pos], jnp.int32), upd_k, upd_v, cache_k, cache_v)


def _col_write_kernel4(pos_ref, updk_ref, updv_ref, ck_ref, cv_ref,
                       outk_ref, outv_ref):
    """Per-layer (4D) variant of _col_write_kernel: grid (NKV/nb,), blocks
    are the (B, nb, HD, 128) lane tile containing ``pos``."""
    col = jax.lax.rem(pos_ref[0], 128)
    for upd_ref, blk_ref, out_ref in ((updk_ref, ck_ref, outk_ref),
                                      (updv_ref, cv_ref, outv_ref)):
        blk = blk_ref[...]
        mask = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 3) == col
        out_ref[...] = jnp.where(mask, upd_ref[...], blk)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _write_col_layer(cache_k, cache_v, upd_k, upd_v, pos, interpret=False):
    B, NKV, HD, S = cache_k.shape
    nb = _pick_nkv_blk(B, NKV, HD, cache_k.dtype.itemsize)
    tile = lambda n, scal: (0, n, 0, scal[0] // 128)
    upd_spec = pl.BlockSpec((B, nb, HD, 1), lambda n, scal: (0, n, 0, 0),
                            memory_space=pltpu.VMEM)
    pool_spec = pl.BlockSpec((B, nb, HD, 128), tile,
                             memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype)
    return pl.pallas_call(
        _col_write_kernel4,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NKV // nb,),
            in_specs=[upd_spec, upd_spec, pool_spec, pool_spec],
            out_specs=[pool_spec, pool_spec],
        ),
        out_shape=[shape, shape],
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(pos, jnp.int32), (1,)),
      upd_k, upd_v, cache_k, cache_v)


def _write_kernel4(pos_ref, updk_ref, updv_ref, ck_ref, cv_ref,
                   outk_ref, outv_ref, semk, semv):
    # dispatch guarantees a statically-128-aligned pos (Mosaic must prove
    # lane-dim DMA offsets divisible by the tiling)
    pos = pl.multiple_of(pos_ref[0], 128)
    sq = updk_ref.shape[-1]
    dk = pltpu.make_async_copy(
        updk_ref, outk_ref.at[:, :, :, pl.ds(pos, sq)], semk)
    dv = pltpu.make_async_copy(
        updv_ref, outv_ref.at[:, :, :, pl.ds(pos, sq)], semv)
    dk.start()
    dv.start()
    dk.wait()
    dv.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _write_slab_layer(cache_k, cache_v, upd_k, upd_v, pos, interpret=False):
    shape = jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    return pl.pallas_call(
        _write_kernel4,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[any_spec] * 4,
            out_specs=[any_spec] * 2,
            scratch_shapes=[pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        ),
        out_shape=[shape, shape],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(jnp.asarray([pos], jnp.int32), upd_k, upd_v, cache_k, cache_v)


def write_kv_layer(cache_k, cache_v, new_k, new_v, pos,
                   use_pallas: Optional[bool] = None):
    """Per-layer bulk write into a lane-major cache (unrolled decode loop).

    cache_*: (B, NKV, HD, S); new_*: (B, sq, NKV, HD); pos: scalar start.
    Same dispatch rules as write_kv_t, minus the layer axis."""
    sq = new_k.shape[1]
    upd_k = new_k.transpose(0, 2, 3, 1).astype(cache_k.dtype)
    upd_v = new_v.transpose(0, 2, 3, 1).astype(cache_v.dtype)
    interp = jax.default_backend() != "tpu"
    # the slab-DMA kernel needs a PROVABLY 128-aligned lane offset, so it
    # requires a statically-known aligned pos (prefill-from-0 case)
    pos_aligned = isinstance(pos, (int,)) and pos % 128 == 0
    if use_pallas is None:
        use_pallas = not interp and (sq == 1 or (sq % 128 == 0
                                                 and pos_aligned))
        if os.environ.get("ACCESSORY_KV_WRITE") == "dus":
            use_pallas = False
    if use_pallas and sq == 1:
        if cache_k.shape[3] % 128 == 0:
            return _write_col_layer(cache_k, cache_v, upd_k, upd_v, pos,
                                    interpret=interp)
    elif use_pallas:
        return _write_slab_layer(cache_k, cache_v, upd_k, upd_v, pos,
                                 interpret=interp)
    idx = (0, 0, 0, pos)
    return (jax.lax.dynamic_update_slice(cache_k, upd_k, idx),
            jax.lax.dynamic_update_slice(cache_v, upd_v, idx))


# ---------------------------------------------------------------------------
# int8 KV cache
# ---------------------------------------------------------------------------
#
# Per-token-per-head symmetric int8: each cached (HD,) k/v vector stores
# int8 values plus one f32 scale, so KV read+write traffic halves and the
# same HBM holds 2x the context. The scale factors OUT of per-element math:
#   score(r, s) = (q . k_s) * kscale_s   — a per-column multiply of (R, S)
#   out(r, :)   = sum_s (p(r,s) * vscale_s) * v_s — fold into p before the dot
# so the kernels dot bf16(q) x bf16(int8 cache) on the MXU and apply scales
# as rank-1 epilogues. The current token's k/v enter attention EXACTLY
# (two-part softmax) and are quantized only as they land in the cache.
#
# Reference role: KV-cache memory reduction (the reference keeps fp16
# caches, llama.py:210-215 — int8 KV is the TPU-side upgrade that pairs
# with W4 weights to keep decode HBM-bound traffic minimal).

KV_SCALE_EPS = 1e-6


def quantize_kv_chunk(x: jnp.ndarray):
    """(..., HD) float -> (int8 (..., HD), f32 scales (...,)).

    Symmetric per-vector quantization: scale = amax/127 (>= eps so empty
    slots stay exactly zero / divisible)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    sc = jnp.maximum(amax, KV_SCALE_EPS) / 127.0
    q = jnp.clip(jnp.round(xf / sc[..., None]), -127, 127).astype(jnp.int8)
    return q, sc


def dequantize_kv(q: jnp.ndarray, sc: jnp.ndarray, lane_major: bool = True):
    """Inverse of quantize_kv_chunk for the XLA fallback paths.

    lane_major: q (..., HD, S) with sc (..., S) — scale broadcast over HD.
    else:       q (..., HD)   with sc (...,)."""
    if lane_major:
        return q.astype(jnp.float32) * sc[..., None, :]
    return q.astype(jnp.float32) * sc[..., None]


def _kernel_bloop_w8(lens_ref, pos_ref, q_ref, kn_ref, vn_ref, kc_ref,
                     vc_ref, ks_ref, vs_ref, out_ref, outk_ref, outv_ref,
                     outks_ref, outvs_ref):
    """int8 variant of _kernel_bloop_w: fused decode attention + in-place
    quantized cache update. Blocks: kc/vc (b_blk,1,HD,S) int8; ks/vs
    (b_blk,1,1,S) f32 scales (4D with a singleton sublane axis — Mosaic
    requires the block's last-two dims be 8/128-divisible or equal to the
    array dims, so the (B,NKV,S) pools are viewed as (B,NKV,1,S));
    outk/outv int8 (HD,128) tiles + outks/outvs (1,1,128) scale tiles,
    all aliased to the pools."""
    B = q_ref.shape[0]
    base = pl.program_id(1) * B
    hd = q_ref.shape[3]
    scale = hd ** -0.5
    pos = pos_ref[0]
    tile0 = pl.multiple_of((pos // 128) * 128, 128)
    col = jax.lax.rem(pos, 128)
    for b in range(B):
        length = lens_ref[base + b]
        q = q_ref[b, 0]                                  # (R, HD) bf16
        kc = kc_ref[b, 0].astype(jnp.bfloat16)           # (HD, S) exact
        vc = vc_ref[b, 0].astype(jnp.bfloat16)
        ksc = ks_ref[b, 0]                               # (1, S) f32
        vsc = vs_ref[b, 0]
        s_old = jax.lax.dot_general(
            q, kc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * (ksc * scale)  # (R, S)
        mask = jax.lax.broadcasted_iota(jnp.int32, s_old.shape, 1) < length
        s_old = jnp.where(mask, s_old, NEG_INF)

        kn = kn_ref[b, 0, 0].astype(jnp.float32)         # (HD,) exact k/v
        vn = vn_ref[b, 0, 0].astype(jnp.float32)
        qf = q.astype(jnp.float32)
        s_new = jnp.sum(qf * kn[None, :], axis=1, keepdims=True) * scale

        m = jnp.maximum(jnp.max(s_old, axis=1, keepdims=True), s_new)
        p_old = jnp.exp(s_old - m)
        p_new = jnp.exp(s_new - m)
        denom = jnp.sum(p_old, axis=1, keepdims=True) + p_new

        out = jax.lax.dot_general(
            (p_old * vsc).astype(jnp.bfloat16), vc,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (R, HD)
        out = out + p_new * vn[None, :]
        out_ref[b, 0] = (out / denom).astype(out_ref.dtype)

        # quantize the new token and RMW its 128-lane tile + scale tile
        # (int8 select must round-trip f32 — Mosaic's minor-dim insert is
        # 32-bit only; |q| <= 127 makes the cast exact)
        ks_new = jnp.maximum(jnp.max(jnp.abs(kn)), KV_SCALE_EPS) / 127.0
        vs_new = jnp.maximum(jnp.max(jnp.abs(vn)), KV_SCALE_EPS) / 127.0
        kq = jnp.clip(jnp.round(kn / ks_new), -127, 127)  # (HD,) f32 vals
        vq = jnp.clip(jnp.round(vn / vs_new), -127, 127)
        wmask = jax.lax.broadcasted_iota(jnp.int32, (hd, 128), 1) == col
        oldk = kc_ref[b, 0, :, pl.ds(tile0, 128)].astype(jnp.float32)
        oldv = vc_ref[b, 0, :, pl.ds(tile0, 128)].astype(jnp.float32)
        outk_ref[b, 0] = jnp.where(wmask, kq[:, None], oldk).astype(jnp.int8)
        outv_ref[b, 0] = jnp.where(wmask, vq[:, None], oldv).astype(jnp.int8)
        smask = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == col
        outks_ref[b, 0] = jnp.where(smask, ks_new,
                                    ks_ref[b, 0, :, pl.ds(tile0, 128)])
        outvs_ref[b, 0] = jnp.where(smask, vs_new,
                                    vs_ref[b, 0, :, pl.ds(tile0, 128)])


@functools.partial(jax.jit, static_argnames=("b_blk", "interpret"))
def _decode_attn_bloop_w8(q, k_new, v_new, cache_k, cache_v, cache_ks,
                          cache_vs, lengths, pos, b_blk, interpret=False):
    """Fused int8 decode attention + quantized cache update. Returns
    (out, k_pool, v_pool, ks_pool, vs_pool); pools alias the inputs."""
    b, nkv, r, hd = q.shape
    S = cache_k.shape[3]
    head = lambda j, i, lens, p: (i, j, 0, 0)
    tile = lambda j, i, lens, p: (i, j, 0, p[0] // 128)
    shead = lambda j, i, lens, p: (i, j, 0, 0)
    stile = lambda j, i, lens, p: (i, j, 0, p[0] // 128)
    pool = jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype)
    # scales viewed 4D (B, NKV, 1, S): reshape is a bitcast; keeps the
    # block's last-two dims Mosaic-legal (see kernel docstring)
    spool = jax.ShapeDtypeStruct((b, nkv, 1, S), cache_ks.dtype)
    out, wk, wv, wks, wvs = pl.pallas_call(
        _kernel_bloop_w8,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nkv, b // b_blk),
            in_specs=[
                pl.BlockSpec((b_blk, 1, r, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, hd, S), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, hd, S), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, S), shead,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, S), shead,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((b_blk, 1, r, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, hd, 128), tile,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, hd, 128), tile,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, 128), stile,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, 128), stile,
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, nkv, r, hd), q.dtype),
                   pool, pool, spool, spool],
        # flat inputs incl. scalar prefetch: lens(0) pos(1) q(2) kn(3)
        # vn(4) kc(5) vc(6) ks(7) vs(8) → alias the four pools
        input_output_aliases={5: 1, 6: 2, 7: 3, 8: 4},
        interpret=interpret,
    )(lengths.astype(jnp.int32),
      jnp.reshape(jnp.asarray(pos, jnp.int32), (1,)),
      q, k_new, v_new, cache_k, cache_v,
      cache_ks.reshape(b, nkv, 1, S), cache_vs.reshape(b, nkv, 1, S))
    return out, wk, wv, wks.reshape(b, nkv, S), wvs.reshape(b, nkv, S)


# ---------------------------------------------------------------------------
# head-GROUPED fused decode attention (MHA-class models: many KV heads, R=1)
# ---------------------------------------------------------------------------
#
# The per-head kernels above run their softmax chain on (1, S) rows — one
# sublane of the 8x128 VPU — so at MHA scale the step is INSTRUCTION-bound:
# the r5 trace budget of LLaMA2-7B (NKV=32, bs8) reads 118.8 µs/layer
# against a ~93 µs int8 memory floor, matching the measured ~0.5 µs
# per-(b,head) softmax-chain floor x 256 pairs. (Round 3 tried head folding
# at TinyLlama shape — NKV=4, R=8 — and measured parity: THAT regime is
# DMA-bound. The negative result was per-regime, not universal.)
#
# These kernels process G heads of one batch row per program: the QK dot is
# one block-diagonal MXU dot (G, G*HD) @ (G*HD, S) -> (G, S) (rows don't
# mix: row g of the LHS is zero outside its own head's K columns), the
# whole softmax chain runs on (G, S) blocks with every sublane busy, and
# the RMW cache-tile writes batch over G. The value contraction stays one
# MXU dot per head (dots were never the bottleneck; a block-diagonal P
# would need a (G, G*S) staging buffer).


def _hgrp_common(q, kc_b, ks, length, scale, prec):
    """Shared QK + softmax for G grouped heads: q (G, HD), kc_b (G*HD, S)
    bf16/f32, ks None or (G, S) int8-scales. Returns (p_old, s_new_part)."""
    G, hd = q.shape
    # block-diagonal LHS: row g carries q[g] in columns [g*HD, (g+1)*HD)
    qt = jnp.tile(q, (1, G))                            # (G, G*HD)
    col_grp = jax.lax.broadcasted_iota(jnp.int32, qt.shape, 1) // hd
    row = jax.lax.broadcasted_iota(jnp.int32, qt.shape, 0)
    qbd = jnp.where(col_grp == row, qt, 0).astype(kc_b.dtype)
    s_old = jax.lax.dot_general(
        qbd, kc_b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # (G, S)
    s_old = s_old * (scale if ks is None else ks * scale)
    mask = jax.lax.broadcasted_iota(jnp.int32, s_old.shape, 1) < length
    return jnp.where(mask, s_old, NEG_INF)


def _kernel_hgrp_w(lens_ref, pos_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref,
                   out_ref, outk_ref, outv_ref):
    """Grid (B, NKV//G). Blocks: q/kn/vn (1,G,1,HD); kc/vc (1,G,HD,S);
    out (1,G,1,HD); outk/outv (1,G,HD,128) aliased cache tiles."""
    G, hd = q_ref.shape[1], q_ref.shape[3]
    S = kc_ref.shape[3]
    scale = hd ** -0.5
    length = lens_ref[pl.program_id(0)]
    pos = pos_ref[0]
    tile0 = pl.multiple_of((pos // 128) * 128, 128)
    col = jax.lax.rem(pos, 128)
    prec = (jax.lax.Precision.HIGHEST if kc_ref.dtype == jnp.float32
            else None)

    q = q_ref[0, :, 0, :]                               # (G, HD)
    kc = kc_ref[0]                                      # (G, HD, S)
    vc = vc_ref[0]
    s_old = _hgrp_common(q, kc.reshape(G * hd, S), None, length, scale,
                         prec)                          # masked scores
    kn = kn_ref[0, :, 0, :].astype(jnp.float32)         # (G, HD)
    vn = vn_ref[0, :, 0, :].astype(jnp.float32)
    qf = q.astype(jnp.float32)
    s_new = jnp.sum(qf * kn, axis=1, keepdims=True) * scale      # (G, 1)
    m = jnp.maximum(jnp.max(s_old, axis=1, keepdims=True), s_new)
    p = jnp.exp(s_old - m)                              # (G, S) grouped VPU
    p_new = jnp.exp(s_new - m)
    denom = jnp.sum(p, axis=1, keepdims=True) + p_new

    pc = p.astype(vc.dtype)
    for g in range(G):                                  # MXU per head
        og = jax.lax.dot_general(
            pc[g:g + 1], vc[g], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # (1, HD)
        og = og + p_new[g:g + 1] * vn[g:g + 1]
        out_ref[0, g] = (og / denom[g:g + 1]).astype(out_ref.dtype)

    # grouped RMW of the (G, HD, 128) cache tiles holding ``pos``
    wmask = jax.lax.broadcasted_iota(jnp.int32, (G, hd, 128), 2) == col
    oldk = kc_ref[0, :, :, pl.ds(tile0, 128)].astype(jnp.float32)
    oldv = vc_ref[0, :, :, pl.ds(tile0, 128)].astype(jnp.float32)
    outk_ref[0] = jnp.where(wmask, kn[:, :, None], oldk).astype(outk_ref.dtype)
    outv_ref[0] = jnp.where(wmask, vn[:, :, None], oldv).astype(outv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("g_blk", "interpret"))
def _decode_attn_hgrp_w(q, k_new, v_new, cache_k, cache_v, lengths, pos,
                        g_blk, interpret=False):
    """Head-grouped fused decode attention + cache update (R must be 1).
    Returns (out, k_pool, v_pool); pools alias the inputs."""
    b, nkv, r, hd = q.shape
    assert r == 1 and nkv % g_blk == 0, (r, nkv, g_blk)
    S = cache_k.shape[3]
    head = lambda i, j, lens, p: (i, j, 0, 0)
    tile = lambda i, j, lens, p: (i, j, 0, p[0] // 128)
    pool_shape = jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype)
    out, wk, wv = pl.pallas_call(
        _kernel_hgrp_w,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nkv // g_blk),
            in_specs=[
                pl.BlockSpec((1, g_blk, r, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, 1, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, 1, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, hd, S), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, hd, S), head,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, g_blk, r, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, hd, 128), tile,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, hd, 128), tile,
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, nkv, r, hd), q.dtype),
                   pool_shape, pool_shape],
        input_output_aliases={5: 1, 6: 2},
        interpret=interpret,
    )(lengths.astype(jnp.int32),
      jnp.reshape(jnp.asarray(pos, jnp.int32), (1,)),
      q, k_new, v_new, cache_k, cache_v)
    return out, wk, wv


def _kernel_hgrp_w8(lens_ref, pos_ref, q_ref, kn_ref, vn_ref, kc_ref,
                    vc_ref, ks_ref, vs_ref, out_ref, outk_ref, outv_ref,
                    outks_ref, outvs_ref):
    """int8 head-grouped variant: kc/vc int8 (1,G,HD,S); ks/vs f32
    (1,G,S) — consumed in the pools' NATIVE 3D (B,NKV,S) layout (legal
    here because the G=8 head group fills the block's second-minor dim;
    the per-head kernel's 4D singleton view forced a physical
    T(8,128)->T(1,128) retile of every scale pool every layer: ~490
    µs/step at 7B, r5 trace). Quantized RMW writes for values AND scales."""
    G, hd = q_ref.shape[1], q_ref.shape[3]
    S = kc_ref.shape[3]
    scale = hd ** -0.5
    length = lens_ref[pl.program_id(0)]
    pos = pos_ref[0]
    tile0 = pl.multiple_of((pos // 128) * 128, 128)
    col = jax.lax.rem(pos, 128)

    q = q_ref[0, :, 0, :]                               # (G, HD) bf16
    kc = kc_ref[0].astype(jnp.bfloat16)                 # (G, HD, S) exact
    vc = vc_ref[0].astype(jnp.bfloat16)
    ks = ks_ref[0]                                      # (G, S) f32
    vs = vs_ref[0]
    s_old = _hgrp_common(q, kc.reshape(G * hd, S), ks, length, scale, None)
    kn = kn_ref[0, :, 0, :].astype(jnp.float32)
    vn = vn_ref[0, :, 0, :].astype(jnp.float32)
    qf = q.astype(jnp.float32)
    s_new = jnp.sum(qf * kn, axis=1, keepdims=True) * scale
    m = jnp.maximum(jnp.max(s_old, axis=1, keepdims=True), s_new)
    p = jnp.exp(s_old - m)
    p_new = jnp.exp(s_new - m)
    denom = jnp.sum(p, axis=1, keepdims=True) + p_new

    pv = (p * vs).astype(jnp.bfloat16)                  # grouped dequant
    for g in range(G):
        og = jax.lax.dot_general(
            pv[g:g + 1], vc[g], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        og = og + p_new[g:g + 1] * vn[g:g + 1]
        out_ref[0, g] = (og / denom[g:g + 1]).astype(out_ref.dtype)

    # grouped quantize + RMW (f32 select round-trip, |q| <= 127 exact)
    ks_new = jnp.maximum(jnp.max(jnp.abs(kn), axis=1), KV_SCALE_EPS) / 127.0
    vs_new = jnp.maximum(jnp.max(jnp.abs(vn), axis=1), KV_SCALE_EPS) / 127.0
    kq = jnp.clip(jnp.round(kn / ks_new[:, None]), -127, 127)    # (G, HD)
    vq = jnp.clip(jnp.round(vn / vs_new[:, None]), -127, 127)
    wmask = jax.lax.broadcasted_iota(jnp.int32, (G, hd, 128), 2) == col
    oldk = kc_ref[0, :, :, pl.ds(tile0, 128)].astype(jnp.float32)
    oldv = vc_ref[0, :, :, pl.ds(tile0, 128)].astype(jnp.float32)
    outk_ref[0] = jnp.where(wmask, kq[:, :, None], oldk).astype(jnp.int8)
    outv_ref[0] = jnp.where(wmask, vq[:, :, None], oldv).astype(jnp.int8)
    smask = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1) == col
    outks_ref[0] = jnp.where(smask, ks_new[:, None],
                             ks_ref[0, :, pl.ds(tile0, 128)])
    outvs_ref[0] = jnp.where(smask, vs_new[:, None],
                             vs_ref[0, :, pl.ds(tile0, 128)])


@functools.partial(jax.jit, static_argnames=("g_blk", "interpret"))
def _decode_attn_hgrp_w8(q, k_new, v_new, cache_k, cache_v, cache_ks,
                         cache_vs, lengths, pos, g_blk, interpret=False):
    """int8 head-grouped fused decode attention + quantized cache update."""
    b, nkv, r, hd = q.shape
    assert r == 1 and nkv % g_blk == 0, (r, nkv, g_blk)
    S = cache_k.shape[3]
    head = lambda i, j, lens, p: (i, j, 0, 0)
    tile = lambda i, j, lens, p: (i, j, 0, p[0] // 128)
    shead = lambda i, j, lens, p: (i, j, 0)
    stile = lambda i, j, lens, p: (i, j, p[0] // 128)
    pool = jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype)
    # scale pools stay in their native 3D (B, NKV, S) layout: the G-head
    # block fills the second-minor dim, so no retile (see kernel docstring)
    spool = jax.ShapeDtypeStruct((b, nkv, S), cache_ks.dtype)
    out, wk, wv, wks, wvs = pl.pallas_call(
        _kernel_hgrp_w8,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nkv // g_blk),
            in_specs=[
                pl.BlockSpec((1, g_blk, r, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, 1, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, 1, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, hd, S), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, hd, S), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, S), shead,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, S), shead,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, g_blk, r, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, hd, 128), tile,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, hd, 128), tile,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, 128), stile,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_blk, 128), stile,
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, nkv, r, hd), q.dtype),
                   pool, pool, spool, spool],
        input_output_aliases={5: 1, 6: 2, 7: 3, 8: 4},
        interpret=interpret,
    )(lengths.astype(jnp.int32),
      jnp.reshape(jnp.asarray(pos, jnp.int32), (1,)),
      q, k_new, v_new, cache_k, cache_v, cache_ks, cache_vs)
    return out, wk, wv, wks, wvs


def _pick_g_blk(nkv: int, r: int, hd: int = 128, S: int = 1024,
                itemsize: int = 2) -> int:
    """Head-group size for the grouped kernels: 8 sublanes is the VPU's
    native block height, shrunk until the double-buffered K+V blocks fit
    the VMEM budget (the per-head path's _pick_b_blk discipline — without
    this a 4k-ctx MHA block pair alone exceeds 16 MB). 0 = grouped path
    not applicable (GQA with R>1 keeps the per-head kernels — that regime
    is DMA-bound, r3 A/B)."""
    if r != 1 or os.environ.get("ACCESSORY_ATTN_HGRP", "1") != "1":
        return 0
    # 10 MB covers double-buffered K+V blocks; the chip-validated default
    # (bf16, g=8, S=1024) sits at 8.4 MB. int8 callers pass itemsize+1
    # for the in-kernel bf16 upcast temps (same convention as _pick_b_blk)
    budget = 10 * 1024 * 1024
    for g in (8, 4, 2):
        if nkv % g == 0 and nkv >= g and \
                2 * 2 * g * hd * S * itemsize <= budget:
            return g
    return 0


def _kernel_bloop8(lens_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref,
                   ks_ref, vs_ref, out_ref):
    """Read-only int8 decode attention (non-fused ablation / paged use)."""
    B = q_ref.shape[0]
    base = pl.program_id(1) * B
    hd = q_ref.shape[3]
    scale = hd ** -0.5
    for b in range(B):
        length = lens_ref[base + b]
        q = q_ref[b, 0]
        kc = kc_ref[b, 0].astype(jnp.bfloat16)
        vc = vc_ref[b, 0].astype(jnp.bfloat16)
        ksc = ks_ref[b, 0]                               # (1, S) f32
        vsc = vs_ref[b, 0]
        s_old = jax.lax.dot_general(
            q, kc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * (ksc * scale)
        mask = jax.lax.broadcasted_iota(jnp.int32, s_old.shape, 1) < length
        s_old = jnp.where(mask, s_old, NEG_INF)

        kn = kn_ref[b, 0, 0].astype(jnp.float32)
        vn = vn_ref[b, 0, 0].astype(jnp.float32)
        qf = q.astype(jnp.float32)
        s_new = jnp.sum(qf * kn[None, :], axis=1, keepdims=True) * scale

        m = jnp.maximum(jnp.max(s_old, axis=1, keepdims=True), s_new)
        p_old = jnp.exp(s_old - m)
        p_new = jnp.exp(s_new - m)
        denom = jnp.sum(p_old, axis=1, keepdims=True) + p_new

        out = jax.lax.dot_general(
            (p_old * vsc).astype(jnp.bfloat16), vc,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out + p_new * vn[None, :]
        out_ref[b, 0] = (out / denom).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("b_blk", "interpret"))
def _decode_attn_bloop8(q, k_new, v_new, cache_k, cache_v, cache_ks,
                        cache_vs, lengths, b_blk, interpret=False):
    b, nkv, r, hd = q.shape
    S = cache_k.shape[3]
    head = lambda j, i, lens: (i, j, 0, 0)
    shead = lambda j, i, lens: (i, j, 0, 0)
    return pl.pallas_call(
        _kernel_bloop8,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nkv, b // b_blk),
            in_specs=[
                pl.BlockSpec((b_blk, 1, r, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, hd), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, hd, S), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, hd, S), head,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, S), shead,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, S), shead,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b_blk, 1, r, hd), head,
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, nkv, r, hd), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, k_new, v_new, cache_k, cache_v,
      cache_ks.reshape(b, nkv, 1, S), cache_vs.reshape(b, nkv, 1, S))


def cached_attention_t8(q, k_new, v_new, cache_k, cache_v, cache_ks,
                        cache_vs, pos, use_pallas: Optional[bool] = None):
    """Two-part-softmax attention over the int8 lane-major cache.

    Same contract as cached_attention_t, plus f32 scale pools
    (B, NKV, S). Decode (sq == 1) dispatches to the int8 Pallas kernel;
    the XLA fallback dequantizes and reuses the oracle path."""
    b, sq, nq, hd = q.shape
    nkv, S = cache_k.shape[1], cache_k.shape[3]
    pos_arr = jnp.asarray(pos)
    if pos_arr.ndim == 0:
        pos_arr = jnp.broadcast_to(pos_arr[None], (b,))
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if sq == 1 and hd % 8 == 0 and S % 128 == 0:
        qg = q.reshape(b, nkv, nq // nkv, hd)
        kn = k_new.reshape(b, nkv, 1, hd)
        vn = v_new.reshape(b, nkv, 1, hd)
        b_blk = _pick_b_blk(b, hd, S, cache_k.dtype.itemsize + 1)
        out = _decode_attn_bloop8(qg, kn, vn, cache_k, cache_v, cache_ks,
                                  cache_vs, pos_arr, b_blk=b_blk,
                                  interpret=not use_pallas)
        return out.reshape(b, 1, nq, hd)
    kf = dequantize_kv(cache_k, cache_ks).astype(jnp.bfloat16)
    vf = dequantize_kv(cache_v, cache_vs).astype(jnp.bfloat16)
    return cached_attention_t(q, k_new, v_new, kf, vf, pos,
                              use_pallas=use_pallas)


def decode_attention_update8(q, k_new, v_new, cache_k, cache_v, cache_ks,
                             cache_vs, pos,
                             use_pallas: Optional[bool] = None):
    """int8 sibling of decode_attention_update: attention + quantized
    in-place cache update in ONE kernel call. Returns
    (out, k_pool, v_pool, ks_pool, vs_pool)."""
    b, sq, nq, hd = q.shape
    nkv, S = cache_k.shape[1], cache_k.shape[3]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if sq == 1 and hd % 8 == 0 and S % 128 == 0 and \
            os.environ.get("ACCESSORY_FUSED_ATTN_WRITE", "1") == "1":
        qg = q.reshape(b, nkv, nq // nkv, hd)
        kn = k_new.reshape(b, nkv, 1, hd)
        vn = v_new.reshape(b, nkv, 1, hd)
        pos_arr = jnp.broadcast_to(jnp.asarray(pos)[None], (b,))
        g_blk = _pick_g_blk(nkv, nq // nkv, hd, S,
                            cache_k.dtype.itemsize + 1)
        if g_blk:
            out, wk, wv, wks, wvs = _decode_attn_hgrp_w8(
                qg, kn, vn, cache_k, cache_v, cache_ks, cache_vs, pos_arr,
                pos, g_blk=g_blk, interpret=not use_pallas)
            return out.reshape(b, 1, nq, hd), wk, wv, wks, wvs
        b_blk = _pick_b_blk(b, hd, S, cache_k.dtype.itemsize + 1)
        out, wk, wv, wks, wvs = _decode_attn_bloop_w8(
            qg, kn, vn, cache_k, cache_v, cache_ks, cache_vs, pos_arr, pos,
            b_blk=b_blk, interpret=not use_pallas)
        return out.reshape(b, 1, nq, hd), wk, wv, wks, wvs
    out = cached_attention_t8(q, k_new, v_new, cache_k, cache_v, cache_ks,
                              cache_vs, pos, use_pallas=use_pallas)
    wk, wv, wks, wvs = write_kv_layer8(cache_k, cache_v, cache_ks, cache_vs,
                                       k_new, v_new, pos)
    return out, wk, wv, wks, wvs


def _col_write_kernel4_q8(pos_ref, updk_ref, updv_ref, updks_ref, updvs_ref,
                          ck_ref, cv_ref, cks_ref, cvs_ref,
                          outk_ref, outv_ref, outks_ref, outvs_ref):
    """Per-layer int8 column write: masked RMW of the 128-lane tile holding
    ``pos`` in all FOUR pools (int8 k/v + f32 scales) in ONE call —
    separate aliased calls make XLA memory-space assignment round-trip the
    later pools through alternate memory (see _col_write_kernel)."""
    col = jax.lax.rem(pos_ref[0], 128)
    for upd_ref, blk_ref, out_ref in ((updk_ref, ck_ref, outk_ref),
                                      (updv_ref, cv_ref, outv_ref)):
        blk = blk_ref[...].astype(jnp.float32)
        mask = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 3) == col
        out_ref[...] = jnp.where(mask, upd_ref[...].astype(jnp.float32),
                                 blk).astype(jnp.int8)
    for upd_ref, blk_ref, out_ref in ((updks_ref, cks_ref, outks_ref),
                                      (updvs_ref, cvs_ref, outvs_ref)):
        blk = blk_ref[...]                      # (B, nb, 1, 128) 4D view
        mask = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 3) == col
        out_ref[...] = jnp.where(mask, upd_ref[...], blk)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _write_col_layer_q8(cache_k, cache_v, cache_ks, cache_vs,
                        upd_k, upd_v, upd_ks, upd_vs, pos, interpret=False):
    B, NKV, HD, S = cache_k.shape
    nb = _pick_nkv_blk(B, NKV, HD, cache_k.dtype.itemsize + 1)
    tile = lambda n, scal: (0, n, 0, scal[0] // 128)
    stile = lambda n, scal: (0, n, 0, scal[0] // 128)
    upd_spec = pl.BlockSpec((B, nb, HD, 1), lambda n, scal: (0, n, 0, 0),
                            memory_space=pltpu.VMEM)
    # scales viewed 4D (B, NKV, 1, ...) so the block's last-two dims stay
    # Mosaic-legal for any nb (see _decode_attn_bloop_w8)
    supd_spec = pl.BlockSpec((B, nb, 1, 1), lambda n, scal: (0, n, 0, 0),
                             memory_space=pltpu.VMEM)
    pool_spec = pl.BlockSpec((B, nb, HD, 128), tile,
                             memory_space=pltpu.VMEM)
    spool_spec = pl.BlockSpec((B, nb, 1, 128), stile,
                              memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype)
    sshape = jax.ShapeDtypeStruct((B, NKV, 1, S), cache_ks.dtype)
    wk, wv, wks, wvs = pl.pallas_call(
        _col_write_kernel4_q8,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NKV // nb,),
            in_specs=[upd_spec, upd_spec, supd_spec, supd_spec,
                      pool_spec, pool_spec, spool_spec, spool_spec],
            out_specs=[pool_spec, pool_spec, spool_spec, spool_spec],
        ),
        out_shape=[shape, shape, sshape, sshape],
        # inputs: (scalars, updk, updv, updks, updvs, ck, cv, cks, cvs)
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(pos, jnp.int32), (1,)),
      upd_k, upd_v, upd_ks.reshape(B, NKV, 1, 1),
      upd_vs.reshape(B, NKV, 1, 1), cache_k, cache_v,
      cache_ks.reshape(B, NKV, 1, S), cache_vs.reshape(B, NKV, 1, S))
    return wk, wv, wks.reshape(B, NKV, S), wvs.reshape(B, NKV, S)


def _write_kernel4_q8(pos_ref, updk_ref, updv_ref, updks_ref, updvs_ref,
                      ck_ref, cv_ref, cks_ref, cvs_ref,
                      outk_ref, outv_ref, outks_ref, outvs_ref,
                      semk, semv, semks, semvs):
    """Aliased slab DMA of a quantized chunk into all four per-layer pools
    (prefill path; pos statically 128-aligned — see _write_kernel4)."""
    pos = pl.multiple_of(pos_ref[0], 128)
    sq = updk_ref.shape[-1]
    copies = [
        pltpu.make_async_copy(updk_ref,
                              outk_ref.at[:, :, :, pl.ds(pos, sq)], semk),
        pltpu.make_async_copy(updv_ref,
                              outv_ref.at[:, :, :, pl.ds(pos, sq)], semv),
        pltpu.make_async_copy(updks_ref,
                              outks_ref.at[:, :, pl.ds(pos, sq)], semks),
        pltpu.make_async_copy(updvs_ref,
                              outvs_ref.at[:, :, pl.ds(pos, sq)], semvs),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _write_slab_layer_q8(cache_k, cache_v, cache_ks, cache_vs,
                         upd_k, upd_v, upd_ks, upd_vs, pos, interpret=False):
    shape = jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype)
    sshape = jax.ShapeDtypeStruct(cache_ks.shape, cache_ks.dtype)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    return pl.pallas_call(
        _write_kernel4_q8,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[any_spec] * 8,
            out_specs=[any_spec] * 4,
            scratch_shapes=[pltpu.SemaphoreType.DMA] * 4,
        ),
        out_shape=[shape, shape, sshape, sshape],
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(jnp.asarray([pos], jnp.int32),
      upd_k, upd_v, upd_ks, upd_vs, cache_k, cache_v, cache_ks, cache_vs)


def write_kv_layer8(cache_k, cache_v, cache_ks, cache_vs, new_k, new_v, pos,
                    use_pallas: Optional[bool] = None):
    """Quantize a chunk and write it into the per-layer int8 pools.

    cache_k/v: (B, NKV, HD, S) int8; cache_ks/vs: (B, NKV, S) f32;
    new_k/v: (B, sq, NKV, HD) float; pos: scalar start. Returns the four
    updated pools. Same dispatch rules as write_kv_layer."""
    sq = new_k.shape[1]
    qk, sk = quantize_kv_chunk(new_k)
    qv, sv = quantize_kv_chunk(new_v)
    upd_k = qk.transpose(0, 2, 3, 1)                     # (B, NKV, HD, sq)
    upd_v = qv.transpose(0, 2, 3, 1)
    upd_ks = sk.transpose(0, 2, 1)                       # (B, NKV, sq)
    upd_vs = sv.transpose(0, 2, 1)
    interp = jax.default_backend() != "tpu"
    pos_aligned = isinstance(pos, (int,)) and pos % 128 == 0
    if use_pallas is None:
        use_pallas = not interp and (sq == 1 or (sq % 128 == 0
                                                 and pos_aligned))
        if os.environ.get("ACCESSORY_KV_WRITE") == "dus":
            use_pallas = False
    if use_pallas and sq == 1:
        if cache_k.shape[3] % 128 == 0:
            return _write_col_layer_q8(cache_k, cache_v, cache_ks, cache_vs,
                                       upd_k, upd_v, upd_ks, upd_vs, pos,
                                       interpret=interp)
    elif use_pallas:
        return _write_slab_layer_q8(cache_k, cache_v, cache_ks, cache_vs,
                                    upd_k, upd_v, upd_ks, upd_vs, pos,
                                    interpret=interp)
    return (jax.lax.dynamic_update_slice(cache_k, upd_k, (0, 0, 0, pos)),
            jax.lax.dynamic_update_slice(cache_v, upd_v, (0, 0, 0, pos)),
            jax.lax.dynamic_update_slice(cache_ks, upd_ks, (0, 0, pos)),
            jax.lax.dynamic_update_slice(cache_vs, upd_vs, (0, 0, pos)))


def write_kv_t8(cache_k, cache_v, cache_ks, cache_vs, new_k, new_v, pos,
                use_pallas: Optional[bool] = None):
    """Stacked (L-leading) variant of write_kv_layer8 for the scan decode
    path. cache_k/v: (L, B, NKV, HD, S) int8; cache_ks/vs: (L, B, NKV, S);
    new_k/v: (L, B, sq, NKV, HD)."""
    qk, sk = quantize_kv_chunk(new_k)
    qv, sv = quantize_kv_chunk(new_v)
    upd_k = qk.transpose(0, 1, 3, 4, 2)
    upd_v = qv.transpose(0, 1, 3, 4, 2)
    upd_ks = sk.transpose(0, 1, 3, 2)
    upd_vs = sv.transpose(0, 1, 3, 2)
    # the stacked path is scan-sliced anyway (no Pallas fusion possible —
    # BENCHMARKS.md round 2), so plain DUS writes are the honest option
    idx5, idx4 = (0, 0, 0, 0, pos), (0, 0, 0, pos)
    return (jax.lax.dynamic_update_slice(cache_k, upd_k, idx5),
            jax.lax.dynamic_update_slice(cache_v, upd_v, idx5),
            jax.lax.dynamic_update_slice(cache_ks, upd_ks, idx4),
            jax.lax.dynamic_update_slice(cache_vs, upd_vs, idx4))


def write_kv_t(cache_k, cache_v, new_k, new_v, pos,
               use_pallas: Optional[bool] = None):
    """Bulk write of a chunk into the lane-major cache.

    cache_*: (L, B, NKV, HD, S); new_*: (L, B, sq, NKV, HD); pos: scalar
    start position. One dynamic_update_slice per pool by default.

    Dispatch: sq == 1 (decode) uses the aliased single-lane-tile
    read-modify-write kernel (no pool copy); sq % 128 == 0 uses the aliased
    whole-slab DMA kernel (Mosaic requires lane-dim DMA slices aligned to
    128); anything else falls back to dynamic_update_slice."""
    sq = new_k.shape[2]
    upd_k = new_k.transpose(0, 1, 3, 4, 2).astype(cache_k.dtype)
    upd_v = new_v.transpose(0, 1, 3, 4, 2).astype(cache_v.dtype)
    interp = jax.default_backend() != "tpu"
    # slab DMA needs a provably 128-aligned lane offset (see write_kv_layer)
    pos_aligned = isinstance(pos, (int,)) and pos % 128 == 0
    if use_pallas is None:
        use_pallas = not interp and (sq == 1 or (sq % 128 == 0
                                                 and pos_aligned))
        # ACCESSORY_KV_WRITE=dus forces the dynamic_update_slice fallback
        # (perf-ablation hook)
        if os.environ.get("ACCESSORY_KV_WRITE") == "dus":
            use_pallas = False
    if use_pallas and sq == 1:
        S = cache_k.shape[4]
        if S % 128 == 0:
            return _write_col_inplace(cache_k, cache_v, upd_k, upd_v, pos,
                                      interpret=interp)
    elif use_pallas:
        return _write_inplace(cache_k, cache_v, upd_k, upd_v, pos,
                              interpret=interp)
    idx = (0, 0, 0, 0, pos)
    return (jax.lax.dynamic_update_slice(cache_k, upd_k, idx),
            jax.lax.dynamic_update_slice(cache_v, upd_v, idx))
