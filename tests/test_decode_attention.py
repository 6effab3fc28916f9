"""Unit tests for the lane-major decode-attention + cache-write kernels.

Runs every Pallas kernel in interpret mode against the XLA fallback path
(the numerics oracle) — the model suites exercise the dispatch end-to-end,
these pin the kernels themselves (batch-blocked grid, aliased writes).

Reference role: decode branch of accessory/model/LLM/llama.py
Attention.forward (cache read + write + sdpa).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.ops import decode_attention as da


def _mk(b=4, nkv=2, n_rep=3, hd=64, S=256, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.standard_normal((b, 1, nkv * n_rep, hd)), dtype)
    kn = jnp.asarray(rng.standard_normal((b, 1, nkv, hd)), dtype)
    vn = jnp.asarray(rng.standard_normal((b, 1, nkv, hd)), dtype)
    ck = jnp.asarray(rng.standard_normal((b, nkv, hd, S)), dtype)
    cv = jnp.asarray(rng.standard_normal((b, nkv, hd, S)), dtype)
    lens = jnp.asarray(rng.randint(1, S, size=(b,)), jnp.int32)
    return q, kn, vn, ck, cv, lens


@pytest.mark.parametrize("b_blk", [1, 2, 4])
def test_bloop_kernel_matches_oracle(b_blk):
    q, kn, vn, ck, cv, lens = _mk()
    b, _, nq, hd = q.shape
    nkv = ck.shape[1]
    ref = da.cached_attention_t(q, kn, vn, ck, cv, lens, use_pallas=False)

    qg = q.reshape(b, nkv, nq // nkv, hd)
    out = da._decode_attn_bloop(
        qg, kn.reshape(b, nkv, 1, hd), vn.reshape(b, nkv, 1, hd),
        ck, cv, lens, b_blk=b_blk, interpret=True)
    np.testing.assert_allclose(np.asarray(out.reshape(ref.shape)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_grid_bnkv_kernel_matches_oracle():
    q, kn, vn, ck, cv, lens = _mk(seed=1)
    b, _, nq, hd = q.shape
    nkv = ck.shape[1]
    ref = da.cached_attention_t(q, kn, vn, ck, cv, lens, use_pallas=False)
    out = da._decode_attn_pallas(
        q.reshape(b, nkv, nq // nkv, hd), kn.reshape(b, nkv, 1, hd),
        vn.reshape(b, nkv, 1, hd), ck, cv, lens, interpret=True)
    np.testing.assert_allclose(np.asarray(out.reshape(ref.shape)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pick_b_blk():
    # fits: whole batch in one block
    assert da._pick_b_blk(8, 64, 256, 2) == 8
    # big cache blocks: halve until under budget
    assert da._pick_b_blk(32, 128, 8192, 2) in (1, 2)
    # non-divisible batch falls back to 1
    assert da._pick_b_blk(6, 128, 8192, 2) == 1
    bb = da._pick_b_blk(16, 64, 4096, 2)
    assert 16 % bb == 0 and 2 * bb * 64 * 4096 * 2 <= da._VMEM_BUDGET


@pytest.mark.parametrize("pos", [0, 127, 128, 255])
def test_write_col_inplace_matches_dus(pos):
    rng = np.random.RandomState(2)
    L, B, NKV, HD, S = 3, 2, 2, 8, 256
    ck = jnp.asarray(rng.standard_normal((L, B, NKV, HD, S)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((L, B, NKV, HD, S)), jnp.float32)
    uk = jnp.asarray(rng.standard_normal((L, B, NKV, HD, 1)), jnp.float32)
    uv = jnp.asarray(rng.standard_normal((L, B, NKV, HD, 1)), jnp.float32)
    wk = jax.lax.dynamic_update_slice(ck, uk, (0, 0, 0, 0, pos))
    wv = jax.lax.dynamic_update_slice(cv, uv, (0, 0, 0, 0, pos))
    gk, gv = da._write_col_inplace(ck, cv, uk, uv, pos, interpret=True)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))


def test_write_slab_inplace_matches_dus():
    rng = np.random.RandomState(3)
    L, B, NKV, HD, S = 2, 2, 2, 8, 512
    sq, pos = 128, 128
    ck = jnp.asarray(rng.standard_normal((L, B, NKV, HD, S)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((L, B, NKV, HD, S)), jnp.float32)
    uk = jnp.asarray(rng.standard_normal((L, B, NKV, HD, sq)), jnp.float32)
    uv = jnp.asarray(rng.standard_normal((L, B, NKV, HD, sq)), jnp.float32)
    wk = jax.lax.dynamic_update_slice(ck, uk, (0, 0, 0, 0, pos))
    wv = jax.lax.dynamic_update_slice(cv, uv, (0, 0, 0, 0, pos))
    gk, gv = da._write_inplace(ck, cv, uk, uv, pos, interpret=True)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))


def test_write_kv_t_dispatch_parity():
    """write_kv_t forced down the pallas path == default (DUS on CPU)."""
    rng = np.random.RandomState(4)
    L, B, NKV, HD, S = 2, 2, 2, 8, 256
    ck = jnp.asarray(rng.standard_normal((L, B, NKV, HD, S)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((L, B, NKV, HD, S)), jnp.float32)
    nk = jnp.asarray(rng.standard_normal((L, B, 1, NKV, HD)), jnp.float32)
    nv = jnp.asarray(rng.standard_normal((L, B, 1, NKV, HD)), jnp.float32)
    k0, v0 = da.write_kv_t(ck, cv, nk, nv, 37)
    k1, v1 = da.write_kv_t(ck, cv, nk, nv, 37, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


def test_fused_attention_update_matches_two_step():
    """decode_attention_update (one kernel: attention + in-place column
    write) == cached_attention_t followed by write_kv_layer."""
    q, kn, vn, ck, cv, lens = _mk(seed=9)
    b = q.shape[0]
    pos = 100  # scalar decode position (all slots aligned)
    lens = jnp.full((b,), pos, jnp.int32)

    want_out = da.cached_attention_t(q, kn, vn, ck, cv, lens,
                                     use_pallas=False)
    want_k, want_v = da.write_kv_layer(ck, cv, kn, vn, pos)

    got_out, got_k, got_v = da.decode_attention_update(
        q, kn, vn, ck, cv, pos, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


@pytest.mark.parametrize("pos", [0, 127, 128, 255])
def test_fused_attention_update_tile_positions(pos):
    """The fused column write lands in the right lane tile for any pos."""
    q, kn, vn, ck, cv, _ = _mk(seed=11)
    b = q.shape[0]
    _, got_k, got_v = da.decode_attention_update(
        q, kn, vn, ck, cv, pos, use_pallas=False)
    want_k, want_v = da.write_kv_layer(ck, cv, kn, vn, pos)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_head_grouped_kernels_match_per_head():
    """MHA head-grouped kernels (G heads per program, grouped softmax) ==
    the per-head bloop kernels, both dtypes, incl. the RMW'd pools.

    The grouped path exists because at MHA scale the per-head kernels are
    instruction-bound (~0.5 µs per (b,head) softmax chain; r5 7B budget:
    118.8 µs/layer vs a 93 µs memory floor)."""
    import numpy as np

    from accessory_tpu.ops import decode_attention as da

    rng = np.random.RandomState(0)
    b, nkv, r, hd, S = 4, 8, 1, 64, 256
    pos = 131
    q = jnp.asarray(rng.standard_normal((b, nkv, r, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, nkv, 1, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, nkv, 1, hd)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((b, nkv, hd, S)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((b, nkv, hd, S)), jnp.float32)
    lens = jnp.full((b,), pos, jnp.int32)

    o1, wk1, wv1 = da._decode_attn_bloop_w(q, kn, vn, ck, cv, lens, pos,
                                           b_blk=4, interpret=True)
    o2, wk2, wv2 = da._decode_attn_hgrp_w(q, kn, vn, ck, cv, lens, pos,
                                          g_blk=8, interpret=True)
    assert float(jnp.max(jnp.abs(o1 - o2))) < 1e-5
    assert float(jnp.max(jnp.abs(wk1 - wk2))) == 0.0
    assert float(jnp.max(jnp.abs(wv1 - wv2))) == 0.0

    ck8 = jnp.asarray(rng.randint(-127, 128, (b, nkv, hd, S)), jnp.int8)
    cv8 = jnp.asarray(rng.randint(-127, 128, (b, nkv, hd, S)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (b, nkv, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (b, nkv, S)), jnp.float32)
    qb, knb, vnb = (x.astype(jnp.bfloat16) for x in (q, kn, vn))
    r3 = da._decode_attn_bloop_w8(qb, knb, vnb, ck8, cv8, ks, vs, lens,
                                  pos, b_blk=4, interpret=True)
    r4 = da._decode_attn_hgrp_w8(qb, knb, vnb, ck8, cv8, ks, vs, lens,
                                 pos, g_blk=8, interpret=True)
    for a, c in zip(r3, r4):
        assert float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                     - c.astype(jnp.float32)))) < 1e-5


def test_pick_g_blk_dispatch_rule():
    from accessory_tpu.ops.decode_attention import _pick_g_blk

    assert _pick_g_blk(32, 1) == 8    # 7B MHA
    assert _pick_g_blk(8, 8) == 0     # 70B GQA (R=8) stays per-head
    assert _pick_g_blk(4, 8) == 0     # TinyLlama GQA
    assert _pick_g_blk(4, 1) == 4
    assert _pick_g_blk(2, 1) == 2
