"""Pipeline parallelism (parallel/pipeline.py) — beyond-reference feature.

Parity discipline: the GPipe-scheduled loss/grads must match the plain
single-program forward bit-for-bit up to float association. 8-device CPU
mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from accessory_tpu.config import LLaMAArgs
from accessory_tpu.models import llama
from accessory_tpu.parallel.mesh import make_mesh, shard_pytree
from accessory_tpu.parallel.pipeline import (make_pp_loss_fn,
                                             make_pp_train_step, pp_rules)
from accessory_tpu.train.loss import cross_entropy_loss
from accessory_tpu.train.train_step import TrainState

ARGS = LLaMAArgs(dim=64, n_layers=4, n_heads=8, n_kv_heads=4,
                 vocab_size=128, multiple_of=32, max_seq_len=32,
                 dtype="float32")


def _ref_loss(params, toks, labels):
    logits, _ = llama.forward(params, ARGS, toks)
    l, n = cross_entropy_loss(logits, labels, 0)
    return l, n


@pytest.mark.parametrize("pp,tp,M", [(4, 1, 4), (2, 2, 4), (4, 2, 8)])
def test_pp_loss_and_grads_match(pp, tp, M):
    mesh = make_mesh({"dp": 8 // (pp * tp), "pp": pp, "tp": tp})
    params = llama.init_params(jax.random.PRNGKey(0), ARGS)
    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(1, 128, (8, 32)), jnp.int32)
    labels = jnp.asarray(rng.randint(0, 128, (8, 32)), jnp.int32)

    l_ref, g_ref = jax.value_and_grad(
        lambda p: _ref_loss(p, toks, labels)[0])(params)

    loss_fn = make_pp_loss_fn(llama, ARGS, mesh, microbatches=M)
    l_pp, g_pp = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, toks, labels)[0]))(params)

    np.testing.assert_allclose(float(l_pp), float(l_ref), atol=2e-5,
                               rtol=2e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=5e-4)


def test_pp_train_step_with_sharded_params():
    """Params sharded with the pp rule table (layers axis → pp) + one
    optimizer step: loss matches the unsharded reference step."""
    pp = 4
    mesh = make_mesh({"dp": 1, "pp": pp, "tp": 2})
    params = llama.init_params(jax.random.PRNGKey(0), ARGS)
    sharded = shard_pytree(params, llama.param_axes(ARGS), mesh,
                           pp_rules())
    tx = optax.sgd(1e-3)
    rng = np.random.RandomState(1)
    batch = {
        "examples": jnp.asarray(rng.randint(1, 128, (8, 32)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 128, (8, 32)), jnp.int32),
    }
    step = make_pp_train_step(llama, ARGS, tx, mesh, microbatches=4)
    state = TrainState.create(sharded, tx)
    state2, metrics = jax.jit(step)(state, batch)
    l_ref, _ = _ref_loss(params, batch["examples"], batch["labels"])
    np.testing.assert_allclose(float(metrics["loss"]), float(l_ref),
                               atol=2e-5, rtol=2e-5)
    # params actually moved
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     state.params, state2.params)
    assert max(jax.tree.leaves(d)) > 0
