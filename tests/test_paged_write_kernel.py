"""Pallas paged-write kernel (ops/paged_write.py) parity vs the XLA
scatter path of write_tokens_all_layers, interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.engine.kvcache import (fold_factor, init_paged_cache,
                                          write_tokens_all_layers)
from accessory_tpu.ops.paged_write import paged_write_tokens

L, NKV, HD, PS = 3, 2, 64, 64


def _setup(slots=4, pages_per_seq=4, s=1, int8=False, seed=0):
    rng = np.random.RandomState(seed)
    pc = init_paged_cache(L, NKV, HD, total_pages=slots * pages_per_seq + 1,
                          page_size=PS, slots=slots,
                          pages_per_seq=pages_per_seq,
                          kv_dtype="int8" if int8 else None)
    # non-identity page table + non-trivial pool contents
    pt = np.asarray(pc.page_indices) + 1
    kp = jnp.asarray(rng.standard_normal(pc.k_pages.shape), pc.k_pages.dtype)
    vp = jnp.asarray(rng.standard_normal(pc.v_pages.shape), pc.v_pages.dtype)
    kn = jnp.asarray(rng.standard_normal((L, slots, s, NKV, HD)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((L, slots, s, NKV, HD)), jnp.float32)
    start = jnp.asarray(rng.randint(0, pages_per_seq * PS - s, (slots,)),
                        jnp.int32)
    extra = {}
    if int8:
        extra = dict(ks_pages=jnp.asarray(
            rng.uniform(0.01, 0.02, pc.ks_pages.shape), jnp.float32),
            vs_pages=jnp.asarray(
            rng.uniform(0.01, 0.02, pc.vs_pages.shape), jnp.float32))
    return kp, vp, kn, vn, jnp.asarray(pt, jnp.int32), start, extra


@pytest.mark.parametrize("s", [1, 3])
def test_paged_write_matches_xla(s):
    kp, vp, kn, vn, pt, start, _ = _setup(s=s)
    want_k, want_v = write_tokens_all_layers(kp, vp, kn, vn, pt, start)
    got_k, got_v = paged_write_tokens(kp, vp, kn, vn, pt, start,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


@pytest.mark.parametrize("s", [1, 5])
def test_paged_write_int8_matches_xla(s):
    # s=5 is the spec-decode verify width that blew the SMEM budget with
    # 4-D scalar-prefetch scale operands (fixed: flat 1-D prefetch)
    kp, vp, kn, vn, pt, start, extra = _setup(int8=True, seed=7, s=s)
    want = write_tokens_all_layers(kp, vp, kn, vn, pt, start, **extra)
    got = paged_write_tokens(kp, vp, kn, vn, pt, start,
                             extra["ks_pages"], extra["vs_pages"],
                             interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_paged_write_page_boundary():
    """A multi-token chunk crossing a page boundary (and two tokens in the
    same page): the in-kernel RMW chain must not lose either write."""
    kp, vp, kn, vn, pt, start, _ = _setup(s=4, seed=3)
    start = jnp.full_like(start, PS - 2)  # tokens span pages 0 and 1
    want_k, want_v = write_tokens_all_layers(kp, vp, kn, vn, pt, start)
    got_k, got_v = paged_write_tokens(kp, vp, kn, vn, pt, start,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_dispatch_env(monkeypatch):
    """ACCESSORY_PAGED_WRITE=interpret routes write_tokens_all_layers
    through the kernel; results match the XLA path exactly."""
    kp, vp, kn, vn, pt, start, _ = _setup(seed=11)
    want = write_tokens_all_layers(kp, vp, kn, vn, pt, start)
    monkeypatch.setenv("ACCESSORY_PAGED_WRITE", "interpret")
    got = write_tokens_all_layers(kp, vp, kn, vn, pt, start)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
