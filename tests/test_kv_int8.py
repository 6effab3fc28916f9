"""int8 KV cache: quantization roundtrip, kernel-vs-oracle parity, fused
update consistency, and end-to-end generation parity.

The int8 cache stores per-token-per-head symmetric int8 k/v plus f32
scales (ops/decode_attention.py). Reference keeps fp16 caches
(accessory/model/LLM/llama.py:210-215); int8 KV is the TPU-side upgrade
(half KV HBM traffic, 2x context capacity).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.config import LLaMAArgs
from accessory_tpu.models import llama
from accessory_tpu.ops import decode_attention as da


def _args(**kw):
    base = dict(dim=64, n_layers=3, n_heads=4, n_kv_heads=2, vocab_size=128,
                multiple_of=16, max_seq_len=256, dtype="float32")
    base.update(kw)
    return LLaMAArgs(**base)


def test_quantize_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 3, 64)) * 3.0
    q, sc = da.quantize_kv_chunk(x)
    assert q.dtype == jnp.int8 and sc.shape == (2, 5, 3)
    xr = q.astype(np.float32) * np.asarray(sc)[..., None]
    err = np.abs(xr - np.asarray(x)).max()
    amax = np.abs(np.asarray(x)).max()
    assert err <= amax / 127.0  # half-ulp of the per-vector grid


def test_int8_decode_kernel_matches_oracle():
    """Pallas int8 decode kernel == XLA dequant + fp oracle path."""
    rng = np.random.RandomState(0)
    b, nkv, nq, hd, S = 2, 2, 4, 64, 256
    pos = 100
    kf = rng.randn(b, nkv, hd, S).astype(np.float32)
    vf = rng.randn(b, nkv, hd, S).astype(np.float32)
    # quantize the valid prefix the same way the write path does
    kq, ks = da.quantize_kv_chunk(jnp.asarray(kf).transpose(0, 3, 1, 2))
    vq, vs = da.quantize_kv_chunk(jnp.asarray(vf).transpose(0, 3, 1, 2))
    kq = kq.transpose(0, 2, 3, 1)
    vq = vq.transpose(0, 2, 3, 1)
    ks = ks.transpose(0, 2, 1)
    vs = vs.transpose(0, 2, 1)

    q = jnp.asarray(rng.randn(b, 1, nq, hd), jnp.float32)
    kn = jnp.asarray(rng.randn(b, 1, nkv, hd), jnp.float32)
    vn = jnp.asarray(rng.randn(b, 1, nkv, hd), jnp.float32)

    out8 = da.cached_attention_t8(q, kn, vn, kq, vq, ks, vs, pos)
    # oracle: dequantize to f32 and run the fp path (sq==1 also uses the
    # pallas fp kernel in interpret mode on CPU; force the XLA fallback)
    kdeq = da.dequantize_kv(kq, ks)
    vdeq = da.dequantize_kv(vq, vs)
    scale = hd ** -0.5
    pos_arr = np.full((b,), pos)
    outs = []
    for bi in range(b):
        per_head = []
        for g in range(nkv):
            qh = np.asarray(q)[bi, 0].reshape(nkv, nq // nkv, hd)[g]
            s_old = qh @ np.asarray(kdeq)[bi, g] * scale          # (R, S)
            s_old[:, pos_arr[bi]:] = -np.inf
            s_new = qh @ np.asarray(kn)[bi, 0, g] * scale          # (R,)
            s = np.concatenate([s_old, s_new[:, None]], axis=1)
            p = np.exp(s - s.max(axis=1, keepdims=True))
            p /= p.sum(axis=1, keepdims=True)
            o = p[:, :-1] @ np.asarray(vdeq)[bi, g].T \
                + p[:, -1:] * np.asarray(vn)[bi, 0, g]
            per_head.append(o)
        outs.append(np.stack(per_head).reshape(nq, hd))
    ref = np.stack(outs)[:, None]
    np.testing.assert_allclose(np.asarray(out8), ref, atol=2e-2, rtol=2e-2)


def test_fused_update_matches_separate():
    """decode_attention_update8 == cached_attention_t8 + write_kv_layer8."""
    rng = np.random.RandomState(1)
    b, nkv, nq, hd, S = 2, 2, 4, 64, 128
    pos = 77
    kq = jnp.asarray(rng.randint(-127, 128, (b, nkv, hd, S)), jnp.int8)
    vq = jnp.asarray(rng.randint(-127, 128, (b, nkv, hd, S)), jnp.int8)
    ks = jnp.asarray(np.abs(rng.randn(b, nkv, S)) * 0.01 + 1e-4, jnp.float32)
    vs = jnp.asarray(np.abs(rng.randn(b, nkv, S)) * 0.01 + 1e-4, jnp.float32)
    q = jnp.asarray(rng.randn(b, 1, nq, hd), jnp.float32)
    kn = jnp.asarray(rng.randn(b, 1, nkv, hd), jnp.float32)
    vn = jnp.asarray(rng.randn(b, 1, nkv, hd), jnp.float32)

    o1, wk1, wv1, wks1, wvs1 = da.decode_attention_update8(
        q, kn, vn, kq, vq, ks, vs, pos)
    o2 = da.cached_attention_t8(q, kn, vn, kq, vq, ks, vs, pos)
    wk2, wv2, wks2, wvs2 = da.write_kv_layer8(kq, vq, ks, vs, kn, vn, pos)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(wk1), np.asarray(wk2))
    np.testing.assert_array_equal(np.asarray(wv1), np.asarray(wv2))
    np.testing.assert_allclose(np.asarray(wks1), np.asarray(wks2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(wvs1), np.asarray(wvs2), rtol=1e-6)
    # the written column dequantizes back to the new k (within grid step)
    col = np.asarray(wk1)[:, :, :, pos].astype(np.float32) \
        * np.asarray(wks1)[:, :, pos][..., None]
    ref = np.asarray(kn)[:, 0]
    assert np.abs(col - ref).max() <= np.abs(ref).max() / 127 + 1e-6


@pytest.mark.parametrize("stacked", [True, False])
def test_int8_cache_forward_close_to_fp(stacked):
    """Full-model decode with the int8 cache tracks the fp cache closely."""
    args = _args()
    params = llama.init_params(jax.random.PRNGKey(0), args)
    if not stacked:
        params = llama.unstack_layers(params)
    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, 128, (2, 16)), jnp.int32)

    cf = llama.init_kv_cache(args, 2, max_len=128, stacked=stacked)
    c8 = llama.init_kv_cache(args, 2, max_len=128, stacked=stacked,
                             kv_dtype="int8")
    assert "ks" in c8 and "vs" in c8
    lf, cf = llama.forward(params, args, toks, cache=cf, cur_pos=0)
    l8, c8 = llama.forward(params, args, toks, cache=c8, cur_pos=0)
    # prefill logits: int8 error only enters via in-chunk cache reads
    np.testing.assert_allclose(np.asarray(lf), np.asarray(l8),
                               atol=0.05, rtol=0.05)
    # greedy decode stays on the same trajectory for a few steps
    pos = 16
    tok_f = jnp.argmax(lf[:, -1:], -1).astype(jnp.int32)
    tok_8 = jnp.argmax(l8[:, -1:], -1).astype(jnp.int32)
    agree = 0
    for i in range(4):
        lf, cf = llama.forward(params, args, tok_f, cache=cf, cur_pos=pos + i)
        l8, c8 = llama.forward(params, args, tok_8, cache=c8, cur_pos=pos + i)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(l8),
                                   atol=0.08, rtol=0.08)
        tok_f = jnp.argmax(lf, -1).astype(jnp.int32)
        tok_8 = jnp.argmax(l8, -1).astype(jnp.int32)
        agree += int(np.mean(np.asarray(tok_f) == np.asarray(tok_8)) == 1.0)
    assert agree >= 3  # random tiny models have near-flat logits; allow 1 flip


@pytest.mark.parametrize("unstacked", [False, True])
def test_paged_int8_close_to_fp(unstacked):
    """forward_paged with int8 pools tracks the fp pools closely."""
    args = _args()
    params = llama.init_params(jax.random.PRNGKey(0), args)
    if unstacked:
        params = llama.unstack_layers(params)
    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, 128, (2, 8)), jnp.int32)
    pt = jnp.asarray([[1, 2, 0, 0], [3, 4, 0, 0]], jnp.int32)

    def run(kv_dtype):
        pc = llama.init_paged_cache(args, slots=2, total_pages=10,
                                    page_size=8, pages_per_seq=4,
                                    kv_dtype=kv_dtype)
        pc = dataclasses.replace(pc, page_indices=pt)
        logits, pc = llama.forward_paged(params, args, toks, pc)
        d, pc = llama.forward_paged(params, args, toks[:, :1], pc,
                                    active_pages=2)
        return np.asarray(logits), np.asarray(d)

    lf, df = run(None)
    l8, d8 = run("int8")
    np.testing.assert_allclose(lf, l8, atol=0.05, rtol=0.05)
    np.testing.assert_allclose(df, d8, atol=0.08, rtol=0.08)


def test_scheduler_kv_int8():
    """ContinuousBatcher serves correctly over int8 page pools."""
    from accessory_tpu.engine.scheduler import ContinuousBatcher

    class TinyTok:
        eos_id = 2
        n_words = 128

        def encode(self, s, bos=True, eos=False):
            return [1] + [ord(c) % 100 + 10 for c in s]

        def decode(self, ids):
            return " ".join(map(str, ids))

    args = _args()
    params = llama.init_params(jax.random.PRNGKey(0), args)
    b = ContinuousBatcher(llama, args, params, TinyTok(), slots=2,
                          page_size=16, kv_dtype="int8")
    assert b.pcache.ks_pages is not None
    outs = b.run(["ab", "xyz"], max_gen_len=4)
    assert len(outs) == 2 and all(len(o.split()) >= 4 for o in outs)


def test_generator_kv_int8():
    """Generator(kv_dtype='int8') end-to-end greedy == fp cache output."""
    from accessory_tpu.engine.generate import Generator

    class TinyTok:
        eos_id = 2
        n_words = 128

        def encode(self, s, bos=True, eos=False):
            return [1] + [ord(c) % 100 + 10 for c in s]

        def decode(self, ids):
            return " ".join(map(str, ids))

    args = _args()
    params = llama.init_params(jax.random.PRNGKey(0), args)
    g_fp = Generator(llama, args, params, TinyTok(), unroll_decode=False)
    g_i8 = Generator(llama, args, params, TinyTok(), unroll_decode=False,
                     kv_dtype="int8")
    out_fp = g_fp.generate(["ab", "xyz"], max_gen_len=6, temperature=0.0)
    out_i8 = g_i8.generate(["ab", "xyz"], max_gen_len=6, temperature=0.0)
    assert len(out_fp) == len(out_i8) == 2
    # random tiny models have near-flat logits, so greedy trajectories may
    # fork at a quantization-scale tie; require a shared prefix — real
    # checkpoints keep much longer agreement (argmax test above)
    for a, b in zip(out_fp, out_i8):
        prefix = 0
        for x, y in zip(a.split(), b.split()):
            if x != y:
                break
            prefix += 1
        assert prefix >= 3, (a, b)


def test_resolve_kv_dtype_policy(monkeypatch):
    """Default policy: explicit > env > (TPU && supported → int8) > fp.

    int8 is the TPU default because it won every chip-measured config
    (BENCHMARKS.md r4: 1k ctx 5921 vs 5838, 4k 4414 vs 3873-4101,
    LLaMA2-7B +21.8%); ACCESSORY_KV_DTYPE=fp is the A/B escape hatch.
    """
    import jax

    from accessory_tpu.util import resolve_kv_dtype

    monkeypatch.delenv("ACCESSORY_KV_DTYPE", raising=False)
    # explicit always wins
    assert resolve_kv_dtype("int8") == "int8"
    assert resolve_kv_dtype("fp") == "fp"
    # env beats the backend default
    monkeypatch.setenv("ACCESSORY_KV_DTYPE", "fp")
    assert resolve_kv_dtype(None) == "fp"
    monkeypatch.setenv("ACCESSORY_KV_DTYPE", "int8")
    assert resolve_kv_dtype(None) == "int8"
    monkeypatch.delenv("ACCESSORY_KV_DTYPE")
    # backend default: int8 on TPU (when supported), fp elsewhere
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_kv_dtype(None) == "int8"
    assert resolve_kv_dtype(None, supports_int8=False) is None
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert resolve_kv_dtype(None) is None
    # the resolved value feeds init_kv_cache: int8 pools carry scale pools
    args = _args()
    c8 = llama.init_kv_cache(args, 2, kv_dtype="int8")
    cfp = llama.init_kv_cache(args, 2, kv_dtype="fp")
    assert "ks" in c8 and c8["k"].dtype == jnp.int8
    assert "ks" not in cfp and cfp["k"].dtype != jnp.int8
