"""Pallas paged-pool token write: RMW only the touched page blocks.

The XLA bulk write (engine/kvcache.py write_tokens_all_layers) scatters
(L, b, s, n_kv, hd) new tokens into the stacked pools with advanced
indexing — measured 13.5 ms/step on chip at TinyLlama-4k-pool scale
(the scatter materializes full-pool copies; the pools are 1.5 GB). This
kernel writes the same tokens by read-modify-writing ONLY the (psk, minor)
page block holding each token, with the pools aliased in-out: HBM traffic
is L*n_kv*b*s page blocks (~22 MB at the same scale) instead of multiple
full-pool passes.

Layout contract = engine/kvcache.py fold storage: pools
(L, n_kv, P, psk, fold*hd); token t of a page sits at row t % psk, lane
group t // psk. int8 pools carry (L, n_kv, P, srows, 128) f32 scale pages
(token t at row t//128, lane t%128); values arrive PRE-quantized (the
caller runs quantize_kv_chunk exactly as the XLA path does).

Granularity note: Mosaic HBM DMAs move whole tiles, so a single-token
write must read the page block back first — hence RMW with
``input_output_aliases`` rather than a pure store. Decode (s == 1) and
small speculative chunks take this kernel; large prefill chunks keep the
XLA scatter, whose full-pool cost amortizes over the many tokens written
per dispatch.

Reference role: the cache_k[:bsz, start_pos:...] = keys write of
accessory/model/LLM/llama.py:210-215, paged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(meta_ref, kn_ref, vn_ref, kp_any, vp_any, okp, ovp,
            kbuf, vbuf, ksem, vsem, *, L, S, psk, fold, hd, tr):
    """Grid (b, n_kv). meta (b, s, 4) SMEM: physical page, row, lane group,
    row-tile base of each token. kn/vn (L, 1, s, 1, hd) VMEM (this
    slot+head's tokens, all layers). Pools (L, n_kv, P, psk, fold*hd) in
    ANY, aliased to outputs. kbuf/vbuf (2, tr, fold*hd) VMEM ring.

    RMW granularity is ONE row tile (``tr`` sublanes: 16 for bf16, 32 for
    int8, 8 for f32), not the whole page block: a decode-step write
    round-trips L*n_kv*b tiles (~2 KB each) instead of page blocks — at
    page_size 512 the block RMW moved 64 KB per touched page (90 MB/step
    at serving scale), which made big pages pay for their own fast reads."""
    bi = pl.program_id(0)
    h = pl.program_id(1)

    # Steps (l, j) RMW one row tile each. With S == 1 consecutive steps
    # touch different layers (disjoint tiles), so a 2-deep ring overlaps
    # the next read with the previous write. With S > 1 two tokens can
    # share a tile (same l), so the chain drains fully before each read.
    steps = [(l, j) for l in range(L) for j in range(S)]
    pend = [None, None]
    for idx, (l, j) in enumerate(steps):
        slot = idx % 2
        drain = (slot,) if S == 1 else (0, 1)
        for sl in drain:
            if pend[sl] is not None:
                for c in pend[sl]:
                    c.wait()
                pend[sl] = None
        page = meta_ref[bi, j, 0]
        base = pl.multiple_of(meta_ref[bi, j, 3], tr)
        # read back through the OUTPUT refs: on TPU they alias the inputs
        # (same HBM), and in interpret mode the output buffer is the one
        # accumulating earlier tokens' writes (reading the input ref there
        # would lose every write but the last per page)
        ck = pltpu.make_async_copy(okp.at[l, h, page, pl.ds(base, tr)],
                                   kbuf.at[slot], ksem.at[slot])
        cv = pltpu.make_async_copy(ovp.at[l, h, page, pl.ds(base, tr)],
                                   vbuf.at[slot], vsem.at[slot])
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()

        row = meta_ref[bi, j, 1] - base
        grp = meta_ref[bi, j, 2]
        kn2d = kn_ref[l, 0, 0].astype(jnp.float32)        # (s, hd)
        vn2d = vn_ref[l, 0, 0].astype(jnp.float32)
        jrows = jax.lax.broadcasted_iota(jnp.int32, kn2d.shape, 0)
        kn = jnp.sum(jnp.where(jrows == j, kn2d, 0.0), axis=0)   # (hd,)
        vn = jnp.sum(jnp.where(jrows == j, vn2d, 0.0), axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (tr, fold * hd), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (tr, fold * hd), 1)
        sel = (rows == row) & (lanes >= grp * hd) & (lanes < (grp + 1) * hd)
        # place the vector at lanes [grp*hd, (grp+1)*hd): pad to a full
        # lane row, roll by the dynamic group offset
        knrow = jnp.pad(kn, (0, (fold - 1) * hd))[None, :]  # (1, fold*hd)
        vnrow = jnp.pad(vn, (0, (fold - 1) * hd))[None, :]
        if fold > 1:
            knrow = pltpu.roll(knrow, grp * hd, 1)
            vnrow = pltpu.roll(vnrow, grp * hd, 1)
        kbuf[slot] = jnp.where(sel, knrow.astype(kbuf.dtype), kbuf[slot])
        vbuf[slot] = jnp.where(sel, vnrow.astype(vbuf.dtype), vbuf[slot])
        ck = pltpu.make_async_copy(kbuf.at[slot],
                                   okp.at[l, h, page, pl.ds(base, tr)],
                                   ksem.at[slot])
        cv = pltpu.make_async_copy(vbuf.at[slot],
                                   ovp.at[l, h, page, pl.ds(base, tr)],
                                   vsem.at[slot])
        ck.start()
        cv.start()
        pend[slot] = (ck, cv)
    for slot in (0, 1):
        if pend[slot] is not None:
            for c in pend[slot]:
                c.wait()


def _kernel_scales(meta_ref, ks_ref, vs_ref, ksp_any, vsp_any, oks, ovs,
                   kbuf, vbuf, ksem, vsem, *, L, S, srows, B, NKV):
    """Scale-page RMW sibling: pools (L, n_kv, P, srows, 128) f32; scale of
    token t at (t // 128, t % 128). meta (b, s, 3): page, srow, lane.
    ks/vs ride in SMEM (scalar prefetch) FLATTENED to 1-D — SMEM pads
    multi-dim scalar arrays so hard that the (L, b, s, n_kv) form blew the
    1 MB SMEM budget at the spec-decode write width (s=5: 704 KB for
    14 KB of payload; found when int8 pools became the serving default)."""
    bi = pl.program_id(0)
    h = pl.program_id(1)

    def flat(l, j):
        return ((l * B + bi) * S + j) * NKV + h
    steps = [(l, j) for l in range(L) for j in range(S)]
    pend = [None, None]
    for idx, (l, j) in enumerate(steps):
        slot = idx % 2
        drain = (slot,) if S == 1 else (0, 1)
        for sl in drain:
            if pend[sl] is not None:
                for c in pend[sl]:
                    c.wait()
                pend[sl] = None
        page = meta_ref[bi, j, 0]
        ck = pltpu.make_async_copy(oks.at[l, h, page], kbuf.at[slot],
                                   ksem.at[slot])
        cv = pltpu.make_async_copy(ovs.at[l, h, page], vbuf.at[slot],
                                   vsem.at[slot])
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()
        srow = meta_ref[bi, j, 1]
        lane = meta_ref[bi, j, 2]
        rows = jax.lax.broadcasted_iota(jnp.int32, (srows, 128), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (srows, 128), 1)
        sel = (rows == srow) & (lanes == lane)
        kbuf[slot] = jnp.where(sel, ks_ref[flat(l, j)], kbuf[slot])
        vbuf[slot] = jnp.where(sel, vs_ref[flat(l, j)], vbuf[slot])
        ck = pltpu.make_async_copy(kbuf.at[slot], oks.at[l, h, page],
                                   ksem.at[slot])
        cv = pltpu.make_async_copy(vbuf.at[slot], ovs.at[l, h, page],
                                   vsem.at[slot])
        ck.start()
        cv.start()
        pend[slot] = (ck, cv)
    for slot in (0, 1):
        if pend[slot] is not None:
            for c in pend[slot]:
                c.wait()


def _tile_rows(dtype, psk: int) -> int:
    """Native sublane tile for the pool dtype (the RMW granularity): 8
    rows for 4-byte, 16 for bf16, 32 for int8. Falls back to the whole
    page block when psk isn't tile-divisible (tiny pages)."""
    tr = 8 * (4 // jnp.dtype(dtype).itemsize)
    return tr if psk % tr == 0 else psk


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0, 1))
def _write_kv(k_pages, v_pages, kn, vn, meta, interpret=False):
    L, n_kv = k_pages.shape[:2]
    psk, minor = k_pages.shape[3], k_pages.shape[4]
    b, s = meta.shape[:2]
    hd = kn.shape[-1]
    tr = _tile_rows(k_pages.dtype, psk)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    slot_blk = lambda i, j, m: (0, i, j, 0, 0)
    # (L, b, s, n_kv, hd) -> (L, b, n_kv, s, hd): grid picks (slot, head)
    kn = kn.transpose(0, 1, 3, 2, 4)
    vn = vn.transpose(0, 1, 3, 2, 4)
    return pl.pallas_call(
        functools.partial(_kernel, L=L, S=s, psk=psk, fold=minor // hd,
                          hd=hd, tr=tr),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_kv),
            in_specs=[
                pl.BlockSpec((L, 1, 1, s, hd), slot_blk,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1, 1, s, hd), slot_blk,
                             memory_space=pltpu.VMEM),
                any_spec, any_spec,
            ],
            out_specs=[any_spec, any_spec],
            scratch_shapes=[
                pltpu.VMEM((2, tr, minor), k_pages.dtype),
                pltpu.VMEM((2, tr, minor), v_pages.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                   jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype)],
        # flat inputs incl. scalar prefetch: meta(0) kn(1) vn(2) kp(3) vp(4)
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(meta, kn.astype(k_pages.dtype), vn.astype(v_pages.dtype),
      k_pages, v_pages)


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0, 1))
def _write_scales(ks_pages, vs_pages, ksc, vsc, smeta, interpret=False):
    L, n_kv = ks_pages.shape[:2]
    srows = ks_pages.shape[3]
    b, s = smeta.shape[:2]
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    n_kv_s = ksc.shape[3]
    return pl.pallas_call(
        functools.partial(_kernel_scales, L=L, S=s, srows=srows,
                          B=b, NKV=n_kv_s),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, n_kv),
            in_specs=[any_spec, any_spec],
            out_specs=[any_spec, any_spec],
            scratch_shapes=[
                pltpu.VMEM((2, srows, 128), jnp.float32),
                pltpu.VMEM((2, srows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct(ks_pages.shape, jnp.float32),
                   jax.ShapeDtypeStruct(vs_pages.shape, jnp.float32)],
        # flat inputs: smeta(0) ks(1) vs(2) ksp(3) vsp(4)
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(smeta, ksc.astype(jnp.float32).reshape(-1),
      vsc.astype(jnp.float32).reshape(-1), ks_pages, vs_pages)


def paged_write_tokens(k_pages, v_pages, k_new, v_new, page_indices,
                       start_pos, ks_pages=None, vs_pages=None,
                       interpret=False):
    """Pallas write of (L, b, s, n_kv, hd) new tokens into fold-stored
    pools. Same contract as the XLA write_tokens_all_layers; the pools
    are aliased through (treat the inputs as consumed)."""
    L, b, s, n_kv, hd = k_new.shape
    minor = k_pages.shape[4]
    fold = minor // hd
    psk = k_pages.shape[3]
    ps = psk * fold

    pos = start_pos[:, None] + jnp.arange(s)[None, :]            # (b, s)
    page = jnp.take_along_axis(page_indices, pos // ps, axis=1)  # (b, s)
    t = pos % ps
    tr = _tile_rows(k_pages.dtype, psk)
    row = t % psk
    meta = jnp.stack([page, row, t // psk, (row // tr) * tr],
                     axis=-1).astype(jnp.int32)

    ksc = vsc = None
    if ks_pages is not None:
        from accessory_tpu.ops.decode_attention import quantize_kv_chunk

        k_new, ksc = quantize_kv_chunk(k_new)
        v_new, vsc = quantize_kv_chunk(v_new)

    k_pages, v_pages = _write_kv(k_pages, v_pages, k_new, v_new, meta,
                                 interpret=interpret)
    if ks_pages is None:
        return k_pages, v_pages

    smeta = jnp.stack([page, t // 128, t % 128], axis=-1).astype(jnp.int32)
    ks_pages, vs_pages = _write_scales(ks_pages, vs_pages, ksc, vsc, smeta,
                                       interpret=interpret)
    return k_pages, v_pages, ks_pages, vs_pages
