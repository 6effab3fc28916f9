"""Context parallelism (parallel/context.py) — beyond-reference feature.

Parity discipline: the cp-sharded forward must match the single-device
forward (same math, different device layout), in both outputs and grads.
Runs on the 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.config import LLaMAArgs
from accessory_tpu.models import llama
from accessory_tpu.ops.attention import attention
from accessory_tpu.parallel.context import cp_attention, make_cp_attn_fn
from accessory_tpu.parallel.mesh import make_mesh

ARGS = LLaMAArgs(dim=64, n_layers=2, n_heads=8, n_kv_heads=4,
                 vocab_size=128, multiple_of=32, max_seq_len=64,
                 dtype="float32")


def _mesh(cp=4, tp=2):
    return make_mesh({"dp": 8 // (cp * tp), "cp": cp, "tp": tp})


@pytest.mark.parametrize("cp,tp", [(4, 2), (2, 2), (8, 1)])
def test_cp_attention_matches_reference(cp, tp):
    mesh = _mesh(cp, tp)
    rng = np.random.RandomState(0)
    b, s, nq, nkv, hd = 2, 32, 8, 4, 16
    q = jnp.asarray(rng.standard_normal((b, s, nq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, nkv, hd)), jnp.float32)
    ref = attention(q, k, v, causal=True, q_offset=0)
    got = jax.jit(lambda q, k, v: cp_attention(q, k, v, mesh=mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_cp_forward_and_grads_match():
    mesh = _mesh(4, 2)
    params = llama.init_params(jax.random.PRNGKey(0), ARGS)
    rng = np.random.RandomState(1)
    toks = jnp.asarray(rng.randint(1, 128, (2, 64)), jnp.int32)
    labels = jnp.asarray(rng.randint(1, 128, (2, 64)), jnp.int32)

    def loss(params, attn_fn=None):
        logits, _ = llama.forward(params, ARGS, toks, attn_fn=attn_fn)
        oh = jax.nn.one_hot(labels, 128)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))

    l_ref, g_ref = jax.value_and_grad(loss)(params)
    attn_fn = make_cp_attn_fn(mesh)
    l_cp, g_cp = jax.jit(jax.value_and_grad(
        lambda p: loss(p, attn_fn)))(params)
    np.testing.assert_allclose(float(l_cp), float(l_ref), atol=1e-5,
                               rtol=1e-5)
    flat_ref = jax.tree.leaves(g_ref)
    flat_cp = jax.tree.leaves(g_cp)
    for a, b_ in zip(flat_ref, flat_cp):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=5e-5, rtol=5e-4)


def test_cp_train_step_runs_sharded():
    """Full train step with cp attention + sharded batch: loss finite and
    matches the unsharded step."""
    import optax

    from accessory_tpu.train.train_step import (TrainState, make_train_step,
                                                shard_train_state)

    mesh = _mesh(4, 2)
    params = llama.init_params(jax.random.PRNGKey(0), ARGS)
    tx = optax.sgd(1e-3)
    rng = np.random.RandomState(2)
    batch = {
        "examples": jnp.asarray(rng.randint(1, 128, (2, 64)), jnp.int32),
        "labels": jnp.asarray(rng.randint(1, 128, (2, 64)), jnp.int32),
    }

    step_ref = make_train_step(llama, ARGS, tx, remat=False)
    s0 = TrainState.create(params, tx)
    _, m_ref = jax.jit(step_ref)(s0, batch)

    attn_fn = make_cp_attn_fn(mesh)
    step_cp = make_train_step(llama, ARGS, tx, remat=False, attn_fn=attn_fn)
    s1 = TrainState.create(params, tx)
    _, m_cp = jax.jit(step_cp)(s1, batch)
    assert np.isfinite(float(m_cp["loss"]))
    np.testing.assert_allclose(float(m_cp["loss"]), float(m_ref["loss"]),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("cp,tp", [(4, 1), (2, 2)])
def test_cp_attention_splash_branch_interpret(cp, tp):
    """The TPU splash branch (q_seq_shards + manual_sharding_spec) in
    interpret mode on the CPU mesh — validates the mask-info sharding."""
    mesh = _mesh(cp, tp)
    rng = np.random.RandomState(3)
    b, s, nq, nkv, hd = 1, 512, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((b, s, nq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, nkv, hd)), jnp.float32)
    ref = attention(q, k, v, causal=True, q_offset=0)
    got = jax.jit(lambda q, k, v: cp_attention(
        q, k, v, mesh=mesh, use_splash=True, interpret=True))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_cp_with_remat_actually_injects():
    """remat=True must not drop the injected attention (regression: the
    checkpoint wrapper used to wrap _block instead of the bound block)."""
    mesh = _mesh(4, 2)
    params = llama.init_params(jax.random.PRNGKey(0), ARGS)
    rng = np.random.RandomState(5)
    toks = jnp.asarray(rng.randint(1, 128, (2, 64)), jnp.int32)

    calls = []

    def spy_attn(q, k, v):
        calls.append(1)
        from accessory_tpu.parallel.context import cp_attention
        return cp_attention(q, k, v, mesh=mesh)

    logits, _ = llama.forward(params, ARGS, toks, remat=True,
                              attn_fn=spy_attn)
    assert calls, "attn_fn was dropped under remat"
    ref, _ = llama.forward(params, ARGS, toks)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("family", ["falcon", "internlm", "mixtral"])
def test_cp_forward_other_families(family):
    """The attn_fn seam exists across trainable model families."""
    from accessory_tpu.config import FalconArgs, InternLMArgs, MixtralArgs
    from accessory_tpu.models import falcon, internlm, mixtral

    mesh = _mesh(4, 2)
    rng = np.random.RandomState(6)
    toks = jnp.asarray(rng.randint(1, 128, (2, 64)), jnp.int32)
    if family == "falcon":
        args = FalconArgs(num_layers=2, hidden_size=64,
                          num_attention_heads=8, num_kv_heads=4,
                          vocab_size=128, max_seq_len=64, dtype="float32")
        mod = falcon
    elif family == "internlm":
        args = InternLMArgs(num_layers=2, hidden_size=64,
                            num_attention_heads=8, vocab_size=128,
                            max_seq_len=64, dtype="float32")
        mod = internlm
    else:
        args = MixtralArgs(dim=64, n_layers=2, n_heads=8, n_kv_heads=4,
                           hidden_dim=128, vocab_size=128, num_experts=4,
                           max_seq_len=64, dtype="float32")
        mod = mixtral
    params = mod.init_params(jax.random.PRNGKey(0), args)
    attn_fn = make_cp_attn_fn(mesh)
    out = mod.forward(params, args, toks, attn_fn=attn_fn)
    ref = mod.forward(params, args, toks)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=3e-5, rtol=3e-5)
