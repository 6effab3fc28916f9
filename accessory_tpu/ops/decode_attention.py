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
