"""LLaMA model invariants: decode-vs-prefill consistency, causality, GQA,
quantized forward, cache shapes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.config import LLaMAArgs
from accessory_tpu.models import llama
from accessory_tpu.quant import quantize_params


def tiny_args(**kw):
    base = dict(dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=97,
                multiple_of=16, max_seq_len=32, max_batch_size=2, dtype="float32")
    base.update(kw)
    return LLaMAArgs(**base)


@pytest.fixture(scope="module")
def model():
    args = tiny_args()
    params = llama.init_params(jax.random.key(0), args)
    return args, params


def test_forward_shapes(model):
    args, params = model
    tokens = jnp.arange(12).reshape(2, 6) % args.vocab_size
    logits, _ = llama.forward(params, args, tokens)
    assert logits.shape == (2, 6, args.vocab_size)
    assert logits.dtype == jnp.float32


def test_causality(model):
    """Changing a future token must not affect earlier logits."""
    args, params = model
    t1 = jnp.asarray([[1, 2, 3, 4, 5, 6]])
    t2 = t1.at[0, 4].set(50)
    l1, _ = llama.forward(params, args, t1)
    l2, _ = llama.forward(params, args, t2)
    np.testing.assert_allclose(np.asarray(l1[0, :4]), np.asarray(l2[0, :4]),
                               atol=1e-5, rtol=1e-5)
    assert not np.allclose(np.asarray(l1[0, 4]), np.asarray(l2[0, 4]))


def test_incremental_decode_matches_full_forward(model):
    """prefill + token-by-token decode == one-shot forward (the core KV-cache
    correctness property; reference contract is forward_inference vs forward,
    llama.py:373-427)."""
    args, params = model
    b, s = 2, 10
    tokens = jax.random.randint(jax.random.key(1), (b, s), 0, args.vocab_size)
    full, _ = llama.forward(params, args, tokens)

    cache = llama.init_kv_cache(args, b)
    # prefill first 4
    logits, cache = llama.forward(params, args, tokens[:, :4], cache=cache, cur_pos=0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :4]),
                               atol=2e-4, rtol=2e-4)
    # decode rest one token at a time
    for t in range(4, s):
        logits, cache = llama.forward(params, args, tokens[:, t:t + 1],
                                      cache=cache, cur_pos=t)
        np.testing.assert_allclose(np.asarray(logits[:, 0]), np.asarray(full[:, t]),
                                   atol=2e-4, rtol=2e-4, err_msg=f"step {t}")


def test_chunked_prefill_matches(model):
    args, params = model
    tokens = jax.random.randint(jax.random.key(2), (1, 8), 0, args.vocab_size)
    full, _ = llama.forward(params, args, tokens)
    cache = llama.init_kv_cache(args, 1)
    l1, cache = llama.forward(params, args, tokens[:, :5], cache=cache, cur_pos=0)
    l2, cache = llama.forward(params, args, tokens[:, 5:], cache=cache, cur_pos=5)
    got = jnp.concatenate([l1, l2], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), atol=2e-4, rtol=2e-4)


def test_remat_forward_matches(model):
    args, params = model
    tokens = jnp.arange(8).reshape(1, 8)
    l1, _ = llama.forward(params, args, tokens)
    l2, _ = llama.forward(params, args, tokens, remat=True)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5, rtol=1e-5)


def test_quantized_forward_close_to_dense():
    args = tiny_args(dim=128, multiple_of=64)
    params = llama.init_params(jax.random.key(3), args)
    qparams = quantize_params(params, bits=4, group_size=64)
    tokens = jnp.arange(6).reshape(1, 6)
    dense, _ = llama.forward(params, args, tokens)
    quant, _ = llama.forward(qparams, args, tokens)
    # cosine similarity of logits must stay high under W4 RTN (random-init
    # weights are the worst case for RTN; real checkpoints land much higher,
    # verified by the ppl-delta tests)
    a, b = np.asarray(dense).ravel(), np.asarray(quant).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.95, cos


def test_param_axes_tree_matches_params(model):
    args, params = model
    axes = llama.param_axes(args)
    jax.tree.map(lambda p, a: None, params, axes)  # same structure or raises


def test_long_decode_consistency():
    """Long incremental decode (150+ steps) matches the teacher-forced
    full forward on the lane-major cache."""
    N = 152
    args = LLaMAArgs(dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
                     vocab_size=64, multiple_of=16, max_seq_len=N + 16,
                     dtype="float32")
    params = llama.init_params(jax.random.PRNGKey(0), args)
    cache = llama.init_kv_cache(args, 1, max_len=N + 16)
    seq = jnp.asarray(np.random.RandomState(0).randint(1, 64, (1, N)),
                      jnp.int32)
    logits, cache = llama.forward(params, args, seq[:, :8], cache=cache,
                                  cur_pos=0)
    outs = [logits[:, -1]]
    for i in range(8, seq.shape[1]):
        logits, cache = llama.forward(params, args, seq[:, i:i + 1],
                                      cache=cache, cur_pos=i)
        outs.append(logits[:, -1])
    full, _ = llama.forward(params, args, seq)
    for i, o in enumerate(outs):
        np.testing.assert_allclose(np.asarray(o[0]),
                                   np.asarray(full[0, 7 + i]),
                                   rtol=2e-4, atol=2e-4)


def test_unstacked_decode_parity():
    """Unrolled decode loop (unstack_layers + per-layer cache) matches the
    stacked lax.scan path exactly, for dense and planes-W4 fused params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama
    from accessory_tpu.quant import quantize_params
    from accessory_tpu.quant.fuse import fuse_for_decode

    args = LLaMAArgs(dim=64, n_layers=3, n_heads=4, n_kv_heads=2,
                     vocab_size=128, multiple_of=16, max_seq_len=64,
                     dtype="float32")
    params = llama.init_params(jax.random.PRNGKey(0), args)
    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, 128, (2, 5)), jnp.int32)

    for tree in (params,
                 fuse_for_decode(quantize_params(params, bits=4,
                                                 group_size=16))):
        cs = llama.init_kv_cache(args, 2)
        cu = llama.init_kv_cache(args, 2, stacked=False)
        un = llama.unstack_layers(tree)
        assert isinstance(un["layers"], tuple) and len(un["layers"]) == 3

        tol = dict(atol=2e-5, rtol=2e-5)  # scan vs unrolled: same math, different XLA fusion order
        ls, cs = llama.forward(tree, args, toks, cache=cs, cur_pos=0)
        lu, cu = llama.forward(un, args, toks, cache=cu, cur_pos=0)
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lu), **tol)
        # decode one token and compare logits + cache content
        ls2, cs = llama.forward(tree, args, toks[:, :1], cache=cs, cur_pos=5)
        lu2, cu = llama.forward(un, args, toks[:, :1], cache=cu, cur_pos=5)
        np.testing.assert_allclose(np.asarray(ls2), np.asarray(lu2), **tol)
        np.testing.assert_allclose(
            np.asarray(cs["k"]),
            np.stack([np.asarray(c) for c in cu["k"]]), **tol)
