"""Pallas paged decode-attention kernel (ops/paged_decode.py) vs the XLA
gather oracle (engine/kvcache.py), interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.engine.kvcache import (
    gather_pages,
    init_paged_cache,
    write_tokens_all_layers,
)
from accessory_tpu.ops.attention import cached_attention
from accessory_tpu.ops.paged_decode import paged_decode_attention


def _mk_pool(key, b, nkv, hd, ps, pages_per_seq, total_pages, lengths,
             kv_dtype=None, shuffle=True):
    """Build a pool with random contents written through the real page-table
    path (non-identity allocation when shuffle=True)."""
    cache = init_paged_cache(1, nkv, hd, total_pages, ps, b, pages_per_seq,
                             dtype=jnp.float32, kv_dtype=kv_dtype)
    rng = np.random.RandomState(7)
    if shuffle:
        perm = rng.permutation(np.arange(1, total_pages))[: b * pages_per_seq]
        pt = jnp.asarray(perm.reshape(b, pages_per_seq), jnp.int32)
    else:
        pt = cache.page_indices
    k1, k2 = jax.random.split(key)
    smax = int(lengths.max())
    k_new = jax.random.normal(k1, (1, b, smax, nkv, hd), jnp.float32)
    v_new = jax.random.normal(k2, (1, b, smax, nkv, hd), jnp.float32)
    res = write_tokens_all_layers(
        cache.k_pages, cache.v_pages, k_new, v_new, pt,
        jnp.zeros((b,), jnp.int32),
        cache.ks_pages, cache.vs_pages)
    if kv_dtype:
        kp, vp, ksp, vsp = res
        return kp[0], vp[0], ksp[0], vsp[0], pt
    kp, vp = res
    return kp[0], vp[0], None, None, pt


def test_paged_kernel_matches_gather_oracle():
    b, nq, nkv, hd, ps, pps = 3, 8, 4, 64, 8, 4
    lengths = jnp.array([9, 1, 30], jnp.int32)
    kp, vp, _, _, pt = _mk_pool(jax.random.PRNGKey(0), b, nkv, hd, ps, pps,
                                total_pages=b * pps + 3, lengths=lengths)
    q = jax.random.normal(jax.random.PRNGKey(3), (b, 1, nq, hd), jnp.float32)
    kn = jax.random.normal(jax.random.PRNGKey(4), (b, 1, nkv, hd), jnp.float32)
    vn = jax.random.normal(jax.random.PRNGKey(5), (b, 1, nkv, hd), jnp.float32)

    kd, vd = gather_pages(kp, vp, pt, head_dim=hd)
    want = cached_attention(q, kn, vn, kd, vd, lengths)
    got = paged_decode_attention(q, kn, vn, kp, vp, lengths, pt,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_kernel_active_pages_slice():
    """active_pages bounds the page loop; tokens beyond stay masked."""
    b, nq, nkv, hd, ps, pps = 2, 4, 2, 32, 8, 8
    lengths = jnp.array([14, 3], jnp.int32)  # both fit in first 2 pages
    kp, vp, _, _, pt = _mk_pool(jax.random.PRNGKey(1), b, nkv, hd, ps, pps,
                                total_pages=b * pps + 1, lengths=lengths)
    q = jax.random.normal(jax.random.PRNGKey(6), (b, 1, nq, hd), jnp.float32)
    kn = jax.random.normal(jax.random.PRNGKey(7), (b, 1, nkv, hd), jnp.float32)
    vn = jax.random.normal(jax.random.PRNGKey(8), (b, 1, nkv, hd), jnp.float32)

    kd, vd = gather_pages(kp, vp, pt, active_pages=2, head_dim=hd)
    want = cached_attention(q, kn, vn, kd, vd, lengths)
    got = paged_decode_attention(q, kn, vn, kp, vp, lengths, pt,
                                 active_pages=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # and the full-table run agrees (extra pages are masked anyway)
    got_full = paged_decode_attention(q, kn, vn, kp, vp, lengths, pt,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got_full), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_kernel_zero_length_slot():
    """A fresh slot (lengths_old == 0) attends only to its new token."""
    b, nq, nkv, hd, ps, pps = 2, 4, 4, 16, 4, 2
    lengths = jnp.array([6, 0], jnp.int32)
    kp, vp, _, _, pt = _mk_pool(jax.random.PRNGKey(2), b, nkv, hd, ps, pps,
                                total_pages=b * pps + 1,
                                lengths=jnp.maximum(lengths, 1))
    q = jax.random.normal(jax.random.PRNGKey(9), (b, 1, nq, hd), jnp.float32)
    kn = jax.random.normal(jax.random.PRNGKey(10), (b, 1, nkv, hd), jnp.float32)
    vn = jax.random.normal(jax.random.PRNGKey(11), (b, 1, nkv, hd), jnp.float32)

    got = paged_decode_attention(q, kn, vn, kp, vp, lengths, pt,
                                 interpret=True)
    # slot 1: output == v_new broadcast over its q heads
    want1 = jnp.repeat(vn[1, 0], nq // nkv, axis=0)  # (nq, hd)
    np.testing.assert_allclose(np.asarray(got[1, 0]), np.asarray(want1),
                               rtol=2e-5, atol=2e-5)
    kd, vd = gather_pages(kp, vp, pt, head_dim=hd)
    want = cached_attention(q, kn, vn, kd, vd, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_kernel_int8_pools():
    b, nq, nkv, hd, ps, pps = 2, 8, 2, 64, 8, 4
    lengths = jnp.array([11, 27], jnp.int32)
    kp, vp, ksp, vsp, pt = _mk_pool(
        jax.random.PRNGKey(3), b, nkv, hd, ps, pps,
        total_pages=b * pps + 2, lengths=lengths, kv_dtype="int8")
    q = jax.random.normal(jax.random.PRNGKey(12), (b, 1, nq, hd),
                          jnp.float32).astype(jnp.bfloat16)
    kn = jax.random.normal(jax.random.PRNGKey(13), (b, 1, nkv, hd),
                           jnp.float32).astype(jnp.bfloat16)
    vn = jax.random.normal(jax.random.PRNGKey(14), (b, 1, nkv, hd),
                           jnp.float32).astype(jnp.bfloat16)

    kd, vd = gather_pages(kp, vp, pt, ks_pages=ksp, vs_pages=vsp, head_dim=hd)
    want = cached_attention(q, kn, vn, kd, vd, lengths)
    got = paged_decode_attention(q, kn, vn, kp, vp, lengths, pt,
                                 ks_pages=ksp, vs_pages=vsp, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)


def test_paged_kernel_mha_r1():
    """n_heads == n_kv_heads (R=1, the 7B MHA shape)."""
    b, nq, nkv, hd, ps, pps = 2, 4, 4, 32, 8, 2
    lengths = jnp.array([5, 16], jnp.int32)
    kp, vp, _, _, pt = _mk_pool(jax.random.PRNGKey(4), b, nkv, hd, ps, pps,
                                total_pages=b * pps + 1, lengths=lengths)
    q = jax.random.normal(jax.random.PRNGKey(15), (b, 1, nq, hd), jnp.float32)
    kn = jax.random.normal(jax.random.PRNGKey(16), (b, 1, nkv, hd), jnp.float32)
    vn = jax.random.normal(jax.random.PRNGKey(17), (b, 1, nkv, hd), jnp.float32)
    kd, vd = gather_pages(kp, vp, pt, head_dim=hd)
    want = cached_attention(q, kn, vn, kd, vd, lengths)
    got = paged_decode_attention(q, kn, vn, kp, vp, lengths, pt,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_kernel_shared_prefix_pages():
    """Two slots sharing the same physical prompt pages (prefix cache) read
    identical context."""
    b, nq, nkv, hd, ps, pps = 2, 4, 2, 16, 4, 4
    lengths = jnp.array([10, 10], jnp.int32)
    kp, vp, _, _, pt = _mk_pool(jax.random.PRNGKey(5), 1, nkv, hd, ps, pps,
                                total_pages=pps + 4,
                                lengths=jnp.array([10], jnp.int32))
    pt2 = jnp.concatenate([pt, pt], axis=0)  # both slots → same pages
    q = jax.random.normal(jax.random.PRNGKey(18), (b, 1, nq, hd), jnp.float32)
    kn = jax.random.normal(jax.random.PRNGKey(19), (b, 1, nkv, hd), jnp.float32)
    vn = jax.random.normal(jax.random.PRNGKey(20), (b, 1, nkv, hd), jnp.float32)
    kd, vd = gather_pages(kp, vp, pt2, head_dim=hd)
    want = cached_attention(q, kn, vn, kd, vd, lengths)
    got = paged_decode_attention(q, kn, vn, kp, vp, lengths, pt2,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forward_paged_decode_via_kernel(monkeypatch):
    """Full llama forward_paged decode with the kernel routed in (interpret
    mode) == the XLA gather path."""
    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama

    args = LLaMAArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     vocab_size=97, multiple_of=32, max_seq_len=32,
                     dtype="float32")
    params = llama.init_params(jax.random.PRNGKey(0), args)
    b, prefill = 2, 8
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, prefill + 2), 0, 97)

    def run(mode):
        monkeypatch.setenv("ACCESSORY_PAGED_KERNEL", mode)
        pc = llama.init_paged_cache(args, slots=b, total_pages=2 * (32 // 8),
                                    page_size=8)
        _, pc = llama.forward_paged(params, args, tokens[:, :prefill], pc)
        outs = []
        for i in range(prefill, prefill + 2):
            lg, pc = llama.forward_paged(params, args, tokens[:, i:i + 1], pc)
            outs.append(np.asarray(lg))
        return outs

    for a, b_ in zip(run("0"), run("interpret")):
        np.testing.assert_allclose(a, b_, rtol=2e-4, atol=2e-4)


def test_paged_kernel_multi_query_chunk():
    """sq > 1 (speculative-verify shape): causal within the chunk, full
    visibility of cached tokens — matches cached_attention on the gather."""
    b, nq, nkv, hd, ps, pps, sq = 2, 8, 2, 32, 8, 4, 5
    lengths = jnp.array([13, 2], jnp.int32)
    kp, vp, _, _, pt = _mk_pool(jax.random.PRNGKey(6), b, nkv, hd, ps, pps,
                                total_pages=b * pps + 2, lengths=lengths)
    q = jax.random.normal(jax.random.PRNGKey(21), (b, sq, nq, hd), jnp.float32)
    kn = jax.random.normal(jax.random.PRNGKey(22), (b, sq, nkv, hd), jnp.float32)
    vn = jax.random.normal(jax.random.PRNGKey(23), (b, sq, nkv, hd), jnp.float32)
    kd, vd = gather_pages(kp, vp, pt, head_dim=hd)
    want = cached_attention(q, kn, vn, kd, vd, lengths)
    got = paged_decode_attention(q, kn, vn, kp, vp, lengths, pt,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_kernel_multi_query_int8():
    b, nq, nkv, hd, ps, pps, sq = 2, 4, 4, 64, 8, 4, 3
    lengths = jnp.array([9, 17], jnp.int32)
    kp, vp, ksp, vsp, pt = _mk_pool(
        jax.random.PRNGKey(7), b, nkv, hd, ps, pps,
        total_pages=b * pps + 2, lengths=lengths, kv_dtype="int8")
    q = jax.random.normal(jax.random.PRNGKey(24), (b, sq, nq, hd),
                          jnp.float32).astype(jnp.bfloat16)
    kn = jax.random.normal(jax.random.PRNGKey(25), (b, sq, nkv, hd),
                           jnp.float32).astype(jnp.bfloat16)
    vn = jax.random.normal(jax.random.PRNGKey(26), (b, sq, nkv, hd),
                           jnp.float32).astype(jnp.bfloat16)
    kd, vd = gather_pages(kp, vp, pt, ks_pages=ksp, vs_pages=vsp, head_dim=hd)
    want = cached_attention(q, kn, vn, kd, vd, lengths)
    got = paged_decode_attention(q, kn, vn, kp, vp, lengths, pt,
                                 ks_pages=ksp, vs_pages=vsp, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)
