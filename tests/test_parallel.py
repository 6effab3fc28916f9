"""GSPMD sharding tests on the virtual 8-device CPU mesh.

Substitutes for multi-chip hardware (SURVEY.md §4(c)): asserts that (a)
logical-axis → PartitionSpec resolution matches the FairScale sharding table
(col=out, row=in, embed=vocab), (b) a tp-sharded llama forward is numerically
identical to the single-device run, (c) tp×dp meshes work.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec

from accessory_tpu.config import LLaMAArgs
from accessory_tpu.models import llama
from accessory_tpu.parallel import (
    INFERENCE_RULES,
    local_mesh,
    logical_to_pspec,
    make_mesh,
    shard_pytree,
)


def test_logical_to_pspec():
    mesh = make_mesh({"dp": 2, "tp": 4})
    assert logical_to_pspec(("embed", "heads"), INFERENCE_RULES, mesh) == PartitionSpec(None, "tp")
    assert logical_to_pspec(("vocab", "embed"), INFERENCE_RULES, mesh) == PartitionSpec("tp", None)
    assert logical_to_pspec(("layers", "ffn", "embed"), INFERENCE_RULES, mesh) == \
        PartitionSpec(None, "tp", None)
    # axes absent from mesh resolve to replication
    assert logical_to_pspec(("experts",), INFERENCE_RULES, mesh) == PartitionSpec(None)


def _tiny():
    args = LLaMAArgs(dim=64, n_layers=2, n_heads=8, n_kv_heads=4, vocab_size=96,
                     multiple_of=32, max_seq_len=32, dtype="float32")
    params = llama.init_params(jax.random.PRNGKey(0), args)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 10), 0, 96)
    return args, params, tokens


def test_tp_sharded_forward_matches_single_device():
    args, params, tokens = _tiny()
    ref_logits, _ = llama.forward(params, args, tokens)

    mesh = make_mesh({"dp": 2, "tp": 4})
    sp = shard_pytree(params, llama.param_axes(args), mesh, INFERENCE_RULES)
    fwd = jax.jit(lambda p, t: llama.forward(p, args, t)[0])
    out = fwd(sp, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)


def test_sharded_decode_matches():
    args, params, tokens = _tiny()
    full, _ = llama.forward(params, args, tokens)

    mesh = make_mesh({"dp": 1, "tp": 8})
    sp = shard_pytree(params, llama.param_axes(args), mesh, INFERENCE_RULES)
    cache = llama.init_kv_cache(args, 4, max_len=16)

    prefill = jax.jit(lambda p, t, c: llama.forward(p, args, t, cache=c, cur_pos=0))
    step = jax.jit(lambda p, t, c, i: llama.forward(p, args, t, cache=c, cur_pos=i))
    lp, cache = prefill(sp, tokens[:, :8], cache)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(full[:, :8]),
                               rtol=2e-4, atol=2e-4)
    for i in range(8, 10):
        li, cache = step(sp, tokens[:, i:i + 1], cache, i)
        np.testing.assert_allclose(np.asarray(li[:, 0]), np.asarray(full[:, i]),
                                   rtol=2e-4, atol=2e-4)


def test_quantized_weight_sharding():
    from accessory_tpu.quant import quantize_params

    args, params, tokens = _tiny()
    qp = quantize_params(params, bits=4, group_size=32)
    ref, _ = llama.forward(params, args, tokens)
    qref, _ = llama.forward(qp, args, tokens)

    mesh = make_mesh({"dp": 1, "tp": 8})
    sq = shard_pytree(qp, llama.param_axes(args), mesh, INFERENCE_RULES)
    out = jax.jit(lambda p, t: llama.forward(p, args, t)[0])(sq, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(qref), rtol=1e-4, atol=1e-4)
    # quantization error vs fp32 stays bounded on tiny random weights
    assert float(jnp.mean(jnp.abs(out - ref))) < 1.0
