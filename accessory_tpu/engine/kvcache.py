"""Paged KV cache: HBM page pool + per-sequence page tables.

Replaces the reference's static per-layer (max_bsz, max_seq, n_kv, hd)
cache tensors (accessory/model/LLM/llama.py:210-215, allocated for the worst
case per sequence) with a shared page pool: sequences own pages on demand, so
max_seq_len is no longer pre-paid per slot and long-context serving scales
by pool size, not batch×max_len (SURVEY.md §5 long-context note).

Layout (Mosaic-native): pools store each page with a 128-lane minor dim so
the Pallas kernel's per-page HBM DMA slices are tile-aligned (Mosaic
rejects HBM memref slices whose minor dim isn't a multiple of the 128
lane tile — chip-verified failure mode for head_dim < 128):
  k_pages/v_pages: (n_layers, n_kv, total_pages, page_size//k, k*hd) where
                   k = 128//hd when hd < 128 (else 1). Token t of a page
                   sits at row t % psk, lanes (t//psk)*hd..+hd with
                   psk = page_size//k — COLUMN-major placement, so each
                   lane-group g holds the contiguous token range
                   [g*psk, (g+1)*psk) and in-kernel masks stay iota
                   compares.
  ks/vs_pages:     int8 pools only — (n_layers, n_kv, total_pages, srows,
                   128) f32, scale of token t at (t//128, t%128)
                   (identity lane order; srows = ceil(page_size/128)).
  page_indices:    (batch_slots, pages_per_seq) int32 — physical page per
                   logical page of each sequence slot
  lengths:         (batch_slots,) int32 — tokens currently in each slot

Decode attention dispatches to the Pallas paged-attention kernel on TPU and
to an XLA gather+masked-softmax reference elsewhere (also the numerics
oracle in tests).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def fold_factor(head_dim: int, page_size: int) -> int:
    """Lane-fold factor for pool storage: pages store (page_size//k, k*hd)
    so the minor dim hits the 128-lane tile exactly. 1 = unfolded."""
    if head_dim < 128 and 128 % head_dim == 0 and page_size % (128 // head_dim) == 0:
        return 128 // head_dim
    return 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    k_pages: jnp.ndarray  # (L, n_kv, P, page_size//fold, fold*hd)
    v_pages: jnp.ndarray
    page_indices: jnp.ndarray  # (slots, pages_per_seq) i32
    lengths: jnp.ndarray  # (slots,) i32
    # int8 pools only: per-token-per-head f32 scales (L, n_kv, P, srows, 128)
    ks_pages: Optional[jnp.ndarray] = None
    vs_pages: Optional[jnp.ndarray] = None
    # head_dim is static metadata: pool shapes alone can't recover the fold
    head_dim: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def fold(self) -> int:
        hd = self.head_dim or self.k_pages.shape[4]
        return self.k_pages.shape[4] // hd

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3] * self.fold

    @property
    def pages_per_seq(self) -> int:
        return self.page_indices.shape[1]


def init_paged_cache(
    n_layers: int,
    n_kv: int,
    head_dim: int,
    total_pages: int,
    page_size: int,
    slots: int,
    pages_per_seq: int,
    dtype=jnp.bfloat16,
    kv_dtype: Optional[str] = None,
) -> PagedKVCache:
    """Fresh pool. When the pool covers the worst case the page table
    defaults to the identity allocation slot*pages_per_seq + j (standalone
    use without a scheduler); an OVERSUBSCRIBED pool (total_pages <
    slots*pages_per_seq, the point of paging) starts all-zero — the
    scheduler's PagePool allocator owns the table then.

    ``kv_dtype="int8"``: int8 pools + f32 scale pools — the same HBM holds
    ~2x the pages (2x serving context capacity). ``None`` resolves via
    util.resolve_kv_dtype (int8 auto-on on TPU; env ACCESSORY_KV_DTYPE
    overrides)."""
    from accessory_tpu.util import resolve_kv_dtype

    kv_dtype = resolve_kv_dtype(kv_dtype)
    if slots * pages_per_seq <= total_pages:
        idx = (jnp.arange(slots)[:, None] * pages_per_seq
               + jnp.arange(pages_per_seq)[None, :]).astype(jnp.int32)
    else:
        idx = jnp.zeros((slots, pages_per_seq), jnp.int32)
    int8_kv = kv_dtype in ("int8", "i8")
    if int8_kv:
        dtype = jnp.int8
    fold = fold_factor(head_dim, page_size)
    shape = (n_layers, n_kv, total_pages, page_size // fold, fold * head_dim)
    srows = -(-page_size // 128)
    sshape = (n_layers, n_kv, total_pages, srows, 128)
    return PagedKVCache(
        k_pages=jnp.zeros(shape, dtype),
        v_pages=jnp.zeros(shape, dtype),
        page_indices=idx,
        lengths=jnp.zeros((slots,), jnp.int32),
        ks_pages=jnp.zeros(sshape, jnp.float32) if int8_kv else None,
        vs_pages=jnp.zeros(sshape, jnp.float32) if int8_kv else None,
        head_dim=head_dim,
    )


class PagePool:
    """Host-side free-page allocator over the device page pool (the vLLM
    block-manager role). Page 0 is reserved as the TRASH page: every
    unallocated page-table entry points at it, so junk writes from idle
    slots or bucketed prefill tails land harmlessly (reads past ``lengths``
    are masked in attention).

    The device table (PagedKVCache.page_indices) is the mirror of this
    allocator's per-slot assignments; the scheduler pushes updates when
    allocation changes (admit / growth / release)."""

    TRASH = 0

    def __init__(self, total_pages: int):
        assert total_pages >= 2
        self.total_pages = total_pages
        self._free = list(range(total_pages - 1, 0, -1))  # stack, page 0 reserved
        # refcounts for live pages (prefix caching shares read-only prompt
        # pages across slots; a page frees when its last holder releases)
        self._refs: Dict[int, int] = {}

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def refcount(self, page: int) -> int:
        return self._refs.get(page, 0)

    def alloc(self, n: int):
        """Allocate n pages, or None if the pool can't satisfy it."""
        if n > len(self._free):
            return None
        out = [self._free.pop() for _ in range(n)]
        for p in out:
            self._refs[p] = 1
        return out

    def share(self, pages) -> None:
        """Add a reference to already-live pages (prefix-cache reuse)."""
        for p in pages:
            assert self._refs.get(p, 0) > 0, p
            self._refs[p] += 1

    def release(self, pages) -> None:
        for p in pages:
            assert p != self.TRASH
            self._refs[p] -= 1
            if self._refs[p] == 0:
                del self._refs[p]
                self._free.append(p)


def write_tokens(
    k_pages: jnp.ndarray,  # (n_kv, P, ps, hd) — one layer
    v_pages: jnp.ndarray,
    k_new: jnp.ndarray,  # (b, s, n_kv, hd)
    v_new: jnp.ndarray,
    page_indices: jnp.ndarray,  # (b, pages_per_seq)
    start_pos: jnp.ndarray,  # (b,) absolute position of k_new[:, 0]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter s new tokens per sequence into their pages."""
    b, s, n_kv, hd = k_new.shape
    ps = k_pages.shape[2]
    pos = start_pos[:, None] + jnp.arange(s)[None, :]  # (b, s)
    page = jnp.take_along_axis(page_indices, pos // ps, axis=1)  # (b, s)
    slot = pos % ps
    # scatter: k_pages[h, page[b,s], slot[b,s], :] = k_new[b, s, h, :]
    kn = k_new.transpose(2, 0, 1, 3).reshape(n_kv, b * s, hd)
    vn = v_new.transpose(2, 0, 1, 3).reshape(n_kv, b * s, hd)
    pf, sf = page.reshape(-1), slot.reshape(-1)
    k_pages = k_pages.at[:, pf, sf, :].set(kn.astype(k_pages.dtype))
    v_pages = v_pages.at[:, pf, sf, :].set(vn.astype(v_pages.dtype))
    return k_pages, v_pages


def write_tokens_all_layers(
    k_pages: jnp.ndarray,  # (L, n_kv, P, ps, hd)
    v_pages: jnp.ndarray,
    k_new: jnp.ndarray,  # (L, b, s, n_kv, hd)
    v_new: jnp.ndarray,
    page_indices: jnp.ndarray,  # (b, pages_per_seq)
    start_pos: jnp.ndarray,  # (b,)
    ks_pages: Optional[jnp.ndarray] = None,  # (L, n_kv, P, ps) int8 pools
    vs_pages: Optional[jnp.ndarray] = None,
):
    """One bulk scatter of every layer's new tokens into the pools —
    replaces per-layer writes inside the scan (which copy the whole pool).
    With int8 pools (scale pools given) tokens are quantized per-vector
    first and returns (k, v, ks, vs).

    Decode / small chunks (s <= 16) dispatch to the Pallas RMW kernel
    (ops/paged_write.py): the XLA scatter below copies the FULL pools
    every call (13.5 ms/step measured at TinyLlama-4k-pool scale), which
    per-token writes cannot amortize. Large prefill chunks keep the
    scatter. ACCESSORY_PAGED_WRITE=0 forces the XLA path.

    Fold-aware: pools store (psk, k*hd) pages (module docstring); token t
    of a page goes to row t % psk, lane group t // psk via a free 6D view
    of the pool, scales to (t//128, t%128) of the padded scale rows."""
    import os

    L, b, s, n_kv, hd = k_new.shape
    mode = os.environ.get("ACCESSORY_PAGED_WRITE", "1")
    if s <= 16 and hd % 8 == 0 and (
            mode == "interpret"
            or (mode == "1" and jax.default_backend() == "tpu")):
        from accessory_tpu.ops.paged_write import paged_write_tokens

        return paged_write_tokens(k_pages, v_pages, k_new, v_new,
                                  page_indices, start_pos, ks_pages,
                                  vs_pages, interpret=mode == "interpret")
    fold = k_pages.shape[4] // hd
    psk = k_pages.shape[3]
    ps = psk * fold
    P = k_pages.shape[2]
    pos = start_pos[:, None] + jnp.arange(s)[None, :]  # (b, s)
    page = jnp.take_along_axis(page_indices, pos // ps, axis=1).reshape(-1)
    t = (pos % ps).reshape(-1)
    ksc = vsc = None
    if ks_pages is not None:
        from accessory_tpu.ops.decode_attention import quantize_kv_chunk

        k_new, ksc = quantize_kv_chunk(k_new)   # int8 vals, (L,b,s,n_kv)
        v_new, vsc = quantize_kv_chunk(v_new)
    kn = k_new.transpose(0, 3, 1, 2, 4).reshape(L, n_kv, b * s, hd)
    vn = v_new.transpose(0, 3, 1, 2, 4).reshape(L, n_kv, b * s, hd)
    if fold == 1:
        k_pages = k_pages.at[:, :, page, t, :].set(kn.astype(k_pages.dtype))
        v_pages = v_pages.at[:, :, page, t, :].set(vn.astype(v_pages.dtype))
    else:
        row, grp = t % psk, t // psk
        k6 = k_pages.reshape(L, n_kv, P, psk, fold, hd)
        v6 = v_pages.reshape(L, n_kv, P, psk, fold, hd)
        k6 = k6.at[:, :, page, row, grp, :].set(kn.astype(k_pages.dtype))
        v6 = v6.at[:, :, page, row, grp, :].set(vn.astype(v_pages.dtype))
        k_pages = k6.reshape(L, n_kv, P, psk, fold * hd)
        v_pages = v6.reshape(L, n_kv, P, psk, fold * hd)
    if ks_pages is None:
        return k_pages, v_pages
    trow, tlane = t // 128, t % 128
    ks_pages = ks_pages.at[:, :, page, trow, tlane].set(
        ksc.transpose(0, 3, 1, 2).reshape(L, n_kv, b * s))
    vs_pages = vs_pages.at[:, :, page, trow, tlane].set(
        vsc.transpose(0, 3, 1, 2).reshape(L, n_kv, b * s))
    return k_pages, v_pages, ks_pages, vs_pages


def paged_attention_xla(
    q: jnp.ndarray,  # (b, nq, hd) — single decode token per slot
    k_pages: jnp.ndarray,  # (n_kv, P, ps, hd)
    v_pages: jnp.ndarray,
    lengths: jnp.ndarray,  # (b,) valid tokens (including the one just written)
    page_indices: jnp.ndarray,  # (b, pages_per_seq)
) -> jnp.ndarray:
    """Reference implementation: gather each slot's pages into a dense
    (b, max_ctx, n_kv, hd) view and run masked attention. The oracle for the
    Pallas kernel and the CPU fallback."""
    b, nq, hd = q.shape
    n_kv, _, ps, _ = k_pages.shape
    n_rep = nq // n_kv
    max_ctx = page_indices.shape[1] * ps

    # (b, pages, ps → ctx) gather
    k = k_pages[:, page_indices]  # (n_kv, b, pages, ps, hd)
    v = v_pages[:, page_indices]
    k = k.transpose(1, 2, 3, 0, 4).reshape(b, max_ctx, n_kv, hd)
    v = v.transpose(1, 2, 3, 0, 4).reshape(b, max_ctx, n_kv, hd)

    qg = q.reshape(b, n_kv, n_rep, hd)
    scores = jnp.einsum("bkrh,bskh->bkrs", qg.astype(jnp.float32),
                        k.astype(jnp.float32)) * (hd ** -0.5)
    mask = jnp.arange(max_ctx)[None, :] < lengths[:, None]  # (b, ctx)
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkrs,bskh->bkrh", probs, v.astype(jnp.float32))
    return out.reshape(b, nq, hd).astype(q.dtype)


def gather_pages(k_pages, v_pages, page_indices, active_pages=None,
                 ks_pages=None, vs_pages=None, head_dim=None):
    """Dense (b, ctx, n_kv, hd) views of each slot's pages.

    ``active_pages`` (static int) bounds the gather to the first N logical
    pages — the scheduler passes the bucketed max context so decode HBM
    traffic scales with the ACTUAL context, not max_seq_len (VERDICT r1:
    the gather path used to read pages_per_seq * ps regardless).

    ``head_dim``: real head dim for fold-stored pools (module docstring);
    None means the pool is unfolded (minor dim == hd).

    int8 pools (``ks_pages``/``vs_pages`` scales given) dequantize after
    the gather: pool reads stay at the 1-byte footprint."""
    n_kv, _, psk, minor = k_pages.shape
    hd = head_dim or minor
    fold = minor // hd
    ps = psk * fold
    if active_pages is not None:
        page_indices = page_indices[:, :active_pages]
    b, pages = page_indices.shape
    ctx = pages * ps

    def unfold(p):  # (n_kv, b, pages, psk, fold*hd) -> (b, ctx, n_kv, hd)
        if fold > 1:
            p = p.reshape(n_kv, b, pages, psk, fold, hd).transpose(
                0, 1, 2, 4, 3, 5)
        return p.reshape(n_kv, b, pages, ps, hd).transpose(
            1, 2, 3, 0, 4).reshape(b, ctx, n_kv, hd)

    k = unfold(k_pages[:, page_indices])
    v = unfold(v_pages[:, page_indices])
    if ks_pages is not None:
        if ks_pages.ndim == 4:  # (n_kv, P, srows, 128) padded layout
            srows = ks_pages.shape[2]
            ks = ks_pages[:, page_indices].reshape(
                n_kv, b, pages, srows * 128)[..., :ps]
            vs = vs_pages[:, page_indices].reshape(
                n_kv, b, pages, srows * 128)[..., :ps]
        else:  # legacy (n_kv, P, ps)
            ks = ks_pages[:, page_indices]
            vs = vs_pages[:, page_indices]
        ks = ks.transpose(1, 2, 3, 0).reshape(b, ctx, n_kv)
        vs = vs.transpose(1, 2, 3, 0).reshape(b, ctx, n_kv)
        k = (k.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
        v = (v.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
    return k, v


def paged_cached_attention(
    q: jnp.ndarray,        # (b, 1, nq, hd) decode queries
    k_new: jnp.ndarray,    # (b, 1, nkv, hd) NEW kv (not yet in pages)
    v_new: jnp.ndarray,
    k_pages: jnp.ndarray,  # (n_kv, P, ps, hd) — pool BEFORE this step
    v_pages: jnp.ndarray,
    lengths_old: jnp.ndarray,  # (b,) valid tokens per slot (excl. new)
    page_indices: jnp.ndarray,
    active_pages=None,
    ks_pages=None,
    vs_pages=None,
    layer=None,
) -> jnp.ndarray:
    """Decode attention against READ-ONLY page pools + the new token, via
    the same two-part softmax as ops.attention.cached_attention — so models
    can keep the pool out of their scan carry/outputs (the scan-copy fix).

    On TPU decode steps this dispatches to the Pallas paged kernel
    (ops/paged_decode.py): pages stream HBM→VMEM once instead of the
    gather path's dense materialization (3x context traffic). Gate:
    ACCESSORY_PAGED_KERNEL=0 forces the XLA gather path; =interpret runs
    the kernel in interpret mode on any backend (tests / verify).

    ``layer``: STATIC layer index — pools then carry their leading L dim
    into the kernel (an XLA slice of the stacked pool feeding the Pallas
    call materializes a full-layer copy per layer per step; the gather
    path slices below, where XLA fuses it into the gather for free)."""
    from accessory_tpu.ops.attention import cached_attention

    mode = os.environ.get("ACCESSORY_PAGED_KERNEL", "1")
    hd = q.shape[-1]
    # sq == 1: decode. 1 < sq <= 16: speculative-verify / short chunks —
    # still bandwidth-bound, so the kernel wins; large chunks stay on the
    # gather + dense-attention path (compute-bound, flash handles them).
    # On real hardware the kernel additionally needs Mosaic-aligned pools:
    # minor dim a multiple of the 128-lane tile (fold-stored pools) and,
    # for int8, single-row scale pages.
    aligned = (k_pages.shape[-1] % 128 == 0
               and (ks_pages is None
                    or (ks_pages.ndim >= 4 and ks_pages.shape[-2] == 1)))
    use_kernel = (
        q.shape[1] <= 16
        and hd % 8 == 0
        and (mode == "interpret"
             or (mode == "1" and jax.default_backend() == "tpu"
                 and aligned))
    )
    if use_kernel:
        from accessory_tpu.ops.paged_decode import paged_decode_attention

        return paged_decode_attention(
            q, k_new, v_new, k_pages, v_pages, lengths_old, page_indices,
            active_pages, ks_pages, vs_pages, layer=layer,
            interpret=mode == "interpret")
    if layer is not None:
        k_pages, v_pages = k_pages[layer], v_pages[layer]
        if ks_pages is not None:
            ks_pages, vs_pages = ks_pages[layer], vs_pages[layer]
    k, v = gather_pages(k_pages, v_pages, page_indices, active_pages,
                        ks_pages, vs_pages, head_dim=hd)
    return cached_attention(q, k_new, v_new, k, v, lengths_old)


def paged_attention_decode(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    lengths: jnp.ndarray,
    page_indices: jnp.ndarray,
) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU, XLA reference elsewhere."""
    # Default OFF pending validation: the bundled paged kernel's remote
    # compile on this session's relay is extremely slow (>9 min); the XLA
    # gather path is correct everywhere. Set ACCESSORY_TPU_PAGED=1 to enable.
    use_pallas = (
        jax.default_backend() == "tpu"
        and os.environ.get("ACCESSORY_TPU_PAGED", "0") == "1"
        and q.shape[-1] in (64, 128, 256)
    )
    if use_pallas:
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            paged_attention)

        pages_per_seq = page_indices.shape[1]
        block = min(pages_per_seq, 8)
        # kernel requires pages_per_seq % pages_per_compute_block == 0
        while pages_per_seq % block:
            block -= 1
        return paged_attention(
            q, k_pages, v_pages, lengths, page_indices,
            pages_per_compute_block=block)
    return paged_attention_xla(q, k_pages, v_pages, lengths, page_indices)
