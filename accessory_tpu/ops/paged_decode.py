"""Pallas paged decode attention: read KV pages directly from HBM.

The XLA serving path (engine/kvcache.py gather_pages) materializes a dense
(b, ctx, n_kv, hd) copy of every slot's pages per layer per step — the pool
is read once, the copy written once and read back once: 3x the HBM traffic
of the context. This kernel streams each sequence's pages straight from the
HBM pool into VMEM with double-buffered DMAs driven by the scalar-prefetched
page table, carrying an online softmax across pages — context bytes move
exactly once, like the flat-cache kernels in ops/decode_attention.py.

Design notes:
  * grid (b, n_kv); each program loops over the slot's ``active_pages``
    logical pages (static per scheduler bucket), so the page loop unrolls
    at trace time and buffer parity is static.
  * k/v pools stay in ``pltpu.ANY`` (HBM) and are FOLD-stored
    (engine/kvcache.py module docstring): each page is (psk, fold*hd)
    with fold = 128//hd for hd < 128, so the minor dim hits the 128-lane
    tile exactly. Mosaic rejects HBM memref slices whose minor dim is not
    tile-aligned ("Slice shape along dimension 3 must be aligned to
    tiling (128)" — chip-verified), which is what killed the unfolded
    (page_size, hd) layout for hd=64 models. Tokens are placed
    COLUMN-major: lane group g holds the contiguous token range
    [g*psk, (g+1)*psk), so per-group masks stay iota compares and int8
    scale lanes stay in identity token order.
  * pages past a sequence's allocation point at the TRASH page (pool page
    0, engine/kvcache.py PagePool) — the DMA is harmless and the scores are
    masked by ``lengths`` exactly like the XLA oracle.
  * the current token's k/v ride separately (two-part softmax, same
    contract as ops.attention.cached_attention): pools stay READ-ONLY here
    and the model does one bulk multi-layer write per step.
  * int8 pools: values upcast int8→bf16 exactly (|q| <= 127), per-token
    scales fold into the score/prob rows — same math as _kernel_bloop_w8.
    Scale pages are (1, 128) f32 rows (page_size <= 128), DMA'd whole.

Replaces the bundled jax paged_attention kernel (whose remote compile on
this environment exceeds 9 min) on the serving decode path; reference role:
the decode branch of accessory/model/LLM/llama.py Attention.forward over
its preallocated cache_k/cache_v (llama.py:210-215), paged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# page-block DMA ring depth: page blocks are small (8-32 KB), so the loop
# is DMA-latency-bound — deeper rings hide it (chip A/B r3). VMEM cost is
# NBUF * ps * hd * itemsize per pool, trivial at these sizes.
NBUF = 8


def _finish(out_ref, q, kn_ref, vn_ref, m, denom, acc, scale, r):
    """Two-part softmax epilogue over the chunk's NEW tokens (not yet in
    pages): sq == 1 is plain decode, sq > 1 adds a causal block."""
    sq = kn_ref.shape[2]
    kn = kn_ref[0, 0].astype(jnp.float32)              # (SQ, HD)
    vn = vn_ref[0, 0].astype(jnp.float32)
    qf = q.astype(jnp.float32)
    if sq == 1:
        s_new = jnp.sum(qf * kn[0][None, :], axis=1,
                        keepdims=True) * scale         # (R, 1)
        m_fin = jnp.maximum(m, s_new)
        a_fin = jnp.exp(m - m_fin)
        p_new = jnp.exp(s_new - m_fin)
        denom = denom * a_fin + p_new
        out = acc * a_fin + p_new * vn[0][None, :]
    else:
        s_new = jax.lax.dot_general(
            qf, kn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (SQ*R, SQ)
        rowt = jax.lax.broadcasted_iota(jnp.int32, s_new.shape, 0) // r
        colt = jax.lax.broadcasted_iota(jnp.int32, s_new.shape, 1)
        s_new = jnp.where(colt <= rowt, s_new, NEG_INF)
        m_fin = jnp.maximum(m, jnp.max(s_new, axis=1, keepdims=True))
        a_fin = jnp.exp(m - m_fin)
        p_new = jnp.exp(s_new - m_fin)                 # (SQ*R, SQ)
        denom = denom * a_fin + jnp.sum(p_new, axis=1, keepdims=True)
        out = acc * a_fin + jax.lax.dot_general(
            p_new, vn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[0, 0] = (out / denom).astype(out_ref.dtype)


def _paged_kernel(pt_ref, lens_ref, q_ref, kn_ref, vn_ref, kp_ref, vp_ref,
                  out_ref, k_buf, v_buf, k_sem, v_sem, *, r, li=-1):
    """Grid (B, NKV). pt/lens in SMEM; q (1,1,SQ*R,HD) — SQ new-chunk
    queries per kv head, R = nq//nkv rows each (row t*R+g is query token t,
    group g); kn/vn (1,1,SQ,HD) the chunk's NEW k/v (not yet in pages);
    kp/vp full (NKV, P, psk, fold*HD) fold-stored refs in ANY;
    out (1,1,SQ*R,HD); k_buf/v_buf (2, psk, fold*HD) VMEM scratch;
    k_sem/v_sem DMA((2,)).

    All queries see every cached token (< lengths_old) plus a causal block
    over the chunk's own tokens — the paged form of
    ops.attention.cached_attention. SQ == 1 is plain decode; SQ > 1 serves
    the speculative-verify dispatch and short continuation chunks."""
    bi = pl.program_id(0)
    h = pl.program_id(1)
    J = pt_ref.shape[1]
    psk = k_buf.shape[1]
    q = q_ref[0, 0]                                    # (SQ*R, HD)
    hd = q.shape[1]
    fold = k_buf.shape[2] // hd
    ps = psk * fold
    scale = hd ** -0.5
    prec = (jax.lax.Precision.HIGHEST if kp_ref.dtype == jnp.float32
            else None)
    length = lens_ref[bi]

    def _copy(j, slot):
        # li >= 0: pools carry their leading layer dim (the serving loop is
        # Python-unrolled, so the index is STATIC) — slicing the stacked
        # pool in XLA before the call materializes a full-layer copy per
        # layer per step (chip trace: 233 copies/step, r3)
        page = pt_ref[bi, j]
        kp = kp_ref.at[li, h, page] if li >= 0 else kp_ref.at[h, page]
        vp = vp_ref.at[li, h, page] if li >= 0 else vp_ref.at[h, page]
        return (pltpu.make_async_copy(kp, k_buf.at[slot], k_sem.at[slot]),
                pltpu.make_async_copy(vp, v_buf.at[slot], v_sem.at[slot]))

    # deep ring: page blocks are small (ps*hd*itemsize, e.g. 8 KB at
    # ps=64/hd=64), so a 2-deep ring leaves the program DMA-latency-bound
    # (chip r3: the 4k-ctx page loop ran ~7x slower than the flat-cache
    # kernel). NBUF in-flight copies hide most of the per-DMA latency.
    nbuf = k_buf.shape[0]
    for j in range(min(nbuf, J)):
        ck, cv = _copy(j, j % nbuf)
        ck.start()
        cv.start()

    m = jnp.full((q.shape[0], 1), NEG_INF, jnp.float32)   # (R, 1)
    denom = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc = jnp.zeros((q.shape[0], hd), jnp.float32)        # (R, HD)

    for j in range(J):
        slot = j % nbuf
        wk, wv = _copy(j, slot)
        wk.wait()
        wv.wait()

        kc = k_buf[slot]                               # (psk, fold*HD)
        vc = v_buf[slot]
        for g in range(fold):
            kg = kc[:, g * hd:(g + 1) * hd] if fold > 1 else kc
            vg = vc[:, g * hd:(g + 1) * hd] if fold > 1 else vc
            s = jax.lax.dot_general(
                q, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec) * scale                # (R, psk)
            gcol = (j * ps + g * psk
                    + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
            s = jnp.where(gcol < length, s, NEG_INF)

            m_cur = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_cur)
            p = jnp.exp(s - m_cur)                     # (R, psk)
            denom = denom * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(vg.dtype), vg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                        # (R, HD)
            acc = acc * alpha + pv
            m = m_cur

        if True:  # refill this slot with the next not-yet-queued page
            nxt = j + nbuf
            if nxt < J:
                nk, nv = _copy(nxt, slot)
                nk.start()
                nv.start()

    _finish(out_ref, q, kn_ref, vn_ref, m, denom, acc, scale, r)


def _paged_kernel8(pt_ref, lens_ref, q_ref, kn_ref, vn_ref, kp_ref, vp_ref,
                   ksp_ref, vsp_ref, out_ref, k_buf, v_buf, ks_buf, vs_buf,
                   k_sem, v_sem, ks_sem, vs_sem, *, r, li=-1):
    """int8-pool variant: kp/vp int8 fold-stored + ksp/vsp (NKV, P, 1, 128)
    f32 per-token scale rows (lane t = scale of page token t), all in ANY.
    Scale slices fold into scores/probs (the int8→bf16 value upcast is
    exact for |q| <= 127). The chunk's NEW k/v stay exact (they are
    quantized only when written to the pool, after this call)."""
    bi = pl.program_id(0)
    h = pl.program_id(1)
    J = pt_ref.shape[1]
    psk = k_buf.shape[1]
    q = q_ref[0, 0]                                    # (SQ*R, HD)
    hd = q.shape[1]
    fold = k_buf.shape[2] // hd
    ps = psk * fold
    scale = hd ** -0.5
    length = lens_ref[bi]

    def _copy(j, slot):
        page = pt_ref[bi, j]
        if li >= 0:  # static layer index into the stacked pools (see bf16)
            kp, vp = kp_ref.at[li, h, page], vp_ref.at[li, h, page]
            ksp, vsp = ksp_ref.at[li, h, page], vsp_ref.at[li, h, page]
        else:
            kp, vp = kp_ref.at[h, page], vp_ref.at[h, page]
            ksp, vsp = ksp_ref.at[h, page], vsp_ref.at[h, page]
        return (
            pltpu.make_async_copy(kp, k_buf.at[slot], k_sem.at[slot]),
            pltpu.make_async_copy(vp, v_buf.at[slot], v_sem.at[slot]),
            pltpu.make_async_copy(ksp, ks_buf.at[slot], ks_sem.at[slot]),
            pltpu.make_async_copy(vsp, vs_buf.at[slot], vs_sem.at[slot]),
        )

    nbuf = k_buf.shape[0]
    for j in range(min(nbuf, J)):
        for c in _copy(j, j % nbuf):
            c.start()

    m = jnp.full((q.shape[0], 1), NEG_INF, jnp.float32)
    denom = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc = jnp.zeros((q.shape[0], hd), jnp.float32)

    for j in range(J):
        slot = j % nbuf
        for c in _copy(j, slot):
            c.wait()

        kc = k_buf[slot].astype(jnp.bfloat16)          # (psk, fold*HD)
        vc = v_buf[slot].astype(jnp.bfloat16)
        ksr = ks_buf[slot]                             # (1, 128) f32
        vsr = vs_buf[slot]
        for g in range(fold):
            kg = kc[:, g * hd:(g + 1) * hd] if fold > 1 else kc
            vg = vc[:, g * hd:(g + 1) * hd] if fold > 1 else vc
            ksc = ksr[:, g * psk:(g + 1) * psk]        # (1, psk)
            vsc = vsr[:, g * psk:(g + 1) * psk]
            s = jax.lax.dot_general(
                q, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (ksc * scale)
            gcol = (j * ps + g * psk
                    + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
            s = jnp.where(gcol < length, s, NEG_INF)

            m_cur = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_cur)
            p = jnp.exp(s - m_cur)
            denom = denom * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                (p * vsc).astype(jnp.bfloat16), vg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (R, HD)
            acc = acc * alpha + pv
            m = m_cur

        nxt = j + nbuf
        if nxt < J:
            for c in _copy(nxt, slot):
                c.start()

    _finish(out_ref, q, kn_ref, vn_ref, m, denom, acc, scale, r)


@functools.partial(jax.jit, static_argnames=("r", "li", "interpret"))
def _paged_decode(q, k_new, v_new, k_pages, v_pages, lengths, page_table,
                  r, li=-1, interpret=False):
    """q (b, nkv, SQ*R, hd); k_new/v_new (b, nkv, SQ, hd); pools
    (nkv, P, psk, fold*hd) fold-stored — or (L, nkv, P, psk, fold*hd) with
    ``li`` the STATIC layer index (unrolled serving loop; avoids the
    full-layer slice copy); page_table (b, J) — sliced to the active
    pages."""
    b, nkv, m, hd = q.shape
    sq = k_new.shape[2]
    psk, minor = k_pages.shape[-2], k_pages.shape[-1]
    head = lambda i, j, pt, lens: (i, j, 0, 0)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        functools.partial(_paged_kernel, r=r, li=li),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nkv),
            in_specs=[
                pl.BlockSpec((1, 1, m, hd), head, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, sq, hd), head, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, sq, hd), head, memory_space=pltpu.VMEM),
                any_spec,
                any_spec,
            ],
            out_specs=pl.BlockSpec((1, 1, m, hd), head,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NBUF, psk, minor), k_pages.dtype),
                pltpu.VMEM((NBUF, psk, minor), v_pages.dtype),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.SemaphoreType.DMA((NBUF,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, nkv, m, hd), q.dtype),
        interpret=interpret,
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32),
      q, k_new, v_new, k_pages, v_pages)


@functools.partial(jax.jit, static_argnames=("r", "li", "interpret"))
def _paged_decode8(q, k_new, v_new, k_pages, v_pages, ks_pages, vs_pages,
                   lengths, page_table, r, li=-1, interpret=False):
    b, nkv, m, hd = q.shape
    sq = k_new.shape[2]
    psk, minor = k_pages.shape[-2], k_pages.shape[-1]
    srows = ks_pages.shape[-2]
    head = lambda i, j, pt, lens: (i, j, 0, 0)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        functools.partial(_paged_kernel8, r=r, li=li),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nkv),
            in_specs=[
                pl.BlockSpec((1, 1, m, hd), head, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, sq, hd), head, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, sq, hd), head, memory_space=pltpu.VMEM),
                any_spec, any_spec, any_spec, any_spec,
            ],
            out_specs=pl.BlockSpec((1, 1, m, hd), head,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NBUF, psk, minor), jnp.int8),
                pltpu.VMEM((NBUF, psk, minor), jnp.int8),
                pltpu.VMEM((NBUF, srows, 128), jnp.float32),
                pltpu.VMEM((NBUF, srows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.SemaphoreType.DMA((NBUF,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, nkv, m, hd), q.dtype),
        interpret=interpret,
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32),
      q, k_new, v_new, k_pages, v_pages, ks_pages, vs_pages)


def paged_decode_attention(q, k_new, v_new, k_pages, v_pages, lengths_old,
                           page_indices, active_pages=None, ks_pages=None,
                           vs_pages=None, layer=None, interpret=False):
    """Decode attention over paged pools + the new token, Pallas path.

    Same contract as engine.kvcache.paged_cached_attention: q (b, sq, nq,
    hd), k_new/v_new (b, sq, nkv, hd), pools (n_kv, P, psk, fold*hd)
    fold-stored read-only (engine/kvcache.py docstring), ``lengths_old``
    excludes the new tokens. sq == 1 is decode; small sq > 1 (speculative
    verify / short continuation chunks) runs causal within the chunk.
    int8 pools carry (n_kv, P, 1, 128) scale rows. ``layer``: STATIC
    layer index — pools then keep their leading L dim and the kernel DMAs
    from the right layer directly (an XLA-level slice of a stacked pool
    feeding a custom call materializes a full-layer copy per layer per
    step). Returns (b, sq, nq, hd).
    """
    b, sq, nq, hd = q.shape
    nkv = k_new.shape[2]
    r = nq // nkv
    pt = page_indices
    if active_pages is not None:
        pt = pt[:, :active_pages]
    qg = q.reshape(b, sq, nkv, r, hd).transpose(0, 2, 1, 3, 4)
    qg = qg.reshape(b, nkv, sq * r, hd)
    kn = k_new.transpose(0, 2, 1, 3)  # (b, nkv, sq, hd)
    vn = v_new.transpose(0, 2, 1, 3)
    if ks_pages is not None:
        if ks_pages.ndim == 3:  # legacy unfolded (n_kv, P, ps): pad rows
            ps = ks_pages.shape[2]
            pad = [(0, 0), (0, 0), (0, 128 - ps)]
            ks_pages = jnp.pad(ks_pages, pad)[:, :, None, :]
            vs_pages = jnp.pad(vs_pages, pad)[:, :, None, :]
        out = _paged_decode8(qg, kn, vn, k_pages, v_pages, ks_pages,
                             vs_pages, lengths_old, pt, r=r,
                             li=-1 if layer is None else layer,
                             interpret=interpret)
    else:
        out = _paged_decode(qg, kn, vn, k_pages, v_pages, lengths_old, pt,
                            r=r, li=-1 if layer is None else layer,
                            interpret=interpret)
    out = out.reshape(b, nkv, sq, r, hd).transpose(0, 2, 1, 3, 4)
    return out.reshape(b, sq, nq, hd)
