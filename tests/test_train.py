"""Training-step tests: loss semantics, overfit sanity, grad accumulation
equivalence, sharded (dp×fsdp×tp) step parity with single device, LR
schedule shape. Reference behaviors: engine_finetune.py loop, misc.py loss
scaler/no_sync, util/lr_sched.py, util/clip_grad.py."""

import types

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.config import LLaMAArgs, MixtralArgs
from accessory_tpu.models import llama, mixtral
from accessory_tpu.train import (
    TrainState,
    cosine_lr,
    cross_entropy_loss,
    make_optimizer,
    make_train_step,
)
from accessory_tpu.train.train_step import shard_train_state


def tiny():
    args = LLaMAArgs(dim=32, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=64,
                     multiple_of=16, max_seq_len=16, dtype="float32")
    params = llama.init_params(jax.random.PRNGKey(0), args)
    return args, params


def batch(bsz=4, seq=8, vocab=64):
    k = jax.random.PRNGKey(7)
    ex = jax.random.randint(k, (bsz, seq), 1, vocab)
    labels = jnp.concatenate([jnp.zeros((bsz, 2), jnp.int32), ex[:, 2:]], axis=1)
    return {"examples": ex, "labels": labels}


def test_cross_entropy_matches_torch_semantics():
    import torch

    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 10), jnp.float32)
    labels = jnp.array([[0, 0, 3, 4, 5, 0], [1, 2, 0, 0, 6, 7]], jnp.int32)
    ours, n = cross_entropy_loss(logits, labels, ignore_index=0, shift=False)
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(np.asarray(logits)).reshape(-1, 10),
        torch.tensor(np.asarray(labels)).reshape(-1).long(), ignore_index=0)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    assert int(n) == 7


def test_cross_entropy_shift_matches_reference():
    """The default loss must apply the reference next-token shift
    (meta.py forward: output[:, :-1] vs labels[:, 1:]) on ALIGNED labels,
    exactly what the finetune datasets (alpaca/conversation) produce."""
    import torch

    logits = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 10), jnp.float32)
    labels = jnp.array([[0, 0, 3, 4, 5, 0], [1, 2, 0, 0, 6, 7]], jnp.int32)
    ours, n = cross_entropy_loss(logits, labels, ignore_index=0)
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(np.asarray(logits[:, :-1])).reshape(-1, 10),
        torch.tensor(np.asarray(labels[:, 1:])).reshape(-1).long(),
        ignore_index=0)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    assert int(n) == 6


def test_finetune_loss_learns_next_token_not_copy():
    """Regression for the unshifted-loss bug: on a deterministic
    next-token sequence (t -> t+1), a few train steps must drive the loss
    toward predicting the NEXT token. With the broken unshifted loss the
    model would instead learn the identity copy and next-token loss would
    not drop."""
    args, params = tiny()
    tx = make_optimizer(params, 5e-2, clip_norm=1.0)
    step = jax.jit(make_train_step(llama, args, tx, remat=False))
    state = TrainState.create(params, tx)
    # sequence 1,2,...,8 — aligned labels (dataset convention)
    ex = jnp.tile(jnp.arange(1, 9, dtype=jnp.int32)[None], (4, 1))
    b = {"examples": ex, "labels": ex}
    for _ in range(30):
        state, m = step(state, b)
    logits, _ = llama.forward(state.params, args, ex)
    pred = jnp.argmax(logits[0, :-1], axis=-1)
    # the model must have learned t -> t+1 on most positions
    assert int(jnp.sum(pred == ex[0, 1:])) >= 5


def test_train_step_decreases_loss():
    args, params = tiny()
    tx = make_optimizer(params, 1e-2, clip_norm=1.0)
    step = jax.jit(make_train_step(llama, args, tx, remat=False))
    state = TrainState.create(params, tx)
    b = batch()
    losses = []
    for _ in range(12):
        state, m = step(state, b)
        losses.append(float(m["c_loss"]))
    assert losses[-1] < losses[0] * 0.7, losses
    assert int(state.step) == 12


def test_grad_accum_equivalent():
    args, params = tiny()
    tx = make_optimizer(params, 1e-2)
    b = batch(bsz=4)
    s1 = TrainState.create(params, tx)
    s2 = TrainState.create(params, tx)
    step1 = jax.jit(make_train_step(llama, args, tx, remat=False, accum_steps=1))
    step2 = jax.jit(make_train_step(llama, args, tx, remat=False, accum_steps=2))
    s1, m1 = step1(s1, b)
    s2, m2 = step2(s2, b)
    # same data → same averaged gradients → same params
    for a, c in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-5)


def test_sharded_train_step_matches_single_device():
    from accessory_tpu.parallel import DEFAULT_RULES, make_mesh

    args, params = tiny()
    tx = make_optimizer(params, 1e-2, clip_norm=1.0)
    step = make_train_step(llama, args, tx, remat=True)
    b = batch(bsz=8)

    ref_state = TrainState.create(params, tx)
    ref_state, ref_m = jax.jit(step)(ref_state, b)

    mesh = make_mesh({"dp": 2, "fsdp": 2, "tp": 2})
    state = TrainState.create(params, tx)
    state = shard_train_state(state, llama.param_axes(args), mesh)
    sharded_step = jax.jit(step)
    state, m = sharded_step(state, b)

    np.testing.assert_allclose(float(m["c_loss"]), float(ref_m["c_loss"]),
                               rtol=1e-4)
    # reduction-order differences across shards are amplified by Adam's
    # rsqrt(v)+eps normalization — allow ~1% after one step
    for a, c in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-2, atol=1e-5)


def test_mixtral_train_step_with_aux():
    args = MixtralArgs(dim=32, n_layers=1, n_heads=4, n_kv_heads=2, hidden_dim=48,
                       vocab_size=64, num_experts=4, max_seq_len=16, dtype="float32")
    params = mixtral.init_params(jax.random.PRNGKey(0), args)
    tx = make_optimizer(params, 1e-2)
    step = jax.jit(make_train_step(mixtral, args, tx, remat=False, moe_aux=True))
    state = TrainState.create(params, tx)
    state, m = step(state, batch())
    assert float(m["aux_loss"]) > 0
    assert np.isfinite(float(m["loss"]))


def test_cosine_lr_shape():
    assert cosine_lr(0, 1.0, 0.0, 10, 100) == 0.0
    assert cosine_lr(5, 1.0, 0.0, 10, 100) == 0.5
    np.testing.assert_allclose(cosine_lr(10, 1.0, 0.0, 10, 100), 1.0)
    np.testing.assert_allclose(cosine_lr(100, 1.0, 0.1, 10, 100), 0.1)
    mid = cosine_lr(55, 1.0, 0.0, 10, 100)
    np.testing.assert_allclose(mid, 0.5, atol=1e-6)


def test_frozen_params_stay_frozen():
    args, params = tiny()
    tx = make_optimizer(params, 1e-2,
                        trainable=lambda name: not name.startswith("output"))
    step = jax.jit(make_train_step(llama, args, tx, remat=False))
    state = TrainState.create(params, tx)
    state, _ = step(state, batch())
    np.testing.assert_array_equal(np.asarray(state.params["output"]["weight"]),
                                  np.asarray(params["output"]["weight"]))
    assert not np.array_equal(
        np.asarray(state.params["layers"]["attention"]["wq"]["weight"]),
        np.asarray(params["layers"]["attention"]["wq"]["weight"]))


def test_layerwise_lr_scale():
    import optax

    from accessory_tpu.train.optim import scale_lr_by_prefix

    params = {"visual": {"w": jnp.ones((4, 4))}, "layers": {"w": jnp.ones((4, 4))}}
    tx = optax.chain(make_optimizer(params, 0.1),
                     scale_lr_by_prefix(params, {"visual": 0.1}))
    st = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    upd, _ = tx.update(g, st, params)
    ratio = float(np.abs(np.asarray(upd["visual"]["w"])).mean()
                  / np.abs(np.asarray(upd["layers"]["w"])).mean())
    assert abs(ratio - 0.1) < 1e-5, ratio


def test_promote_trainable_params_to_fp32():
    from accessory_tpu.train.precision import promote_trainable_params_to_fp32

    args = LLaMAArgs(dim=32, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=64,
                     multiple_of=16, max_seq_len=16, dtype="bfloat16",
                     lora_rank=4)
    params = llama.init_params(jax.random.PRNGKey(0), args)
    f = llama.get_trainable_params_filter(args)
    out = promote_trainable_params_to_fp32(params, f)
    assert out["layers"]["attention"]["wq"]["lora_a"].dtype == jnp.float32
    assert out["layers"]["attention"]["wq"]["weight"].dtype == jnp.bfloat16


def test_qpeft_train_step_with_clip_through_kernel_layout():
    """QPEFT + global-norm clip end-to-end: the frozen base is W4 in the
    planes kernel layout (what a TPU finetune actually runs), so the
    backward crosses the custom_vjp of the fused kernel, and the static
    uint32 packed leaves must not break clip_by_global_norm (both were
    real on-chip failure modes; reference regime: NormBiasLoRA over
    Linear4bit, docs/finetune/quantization.md)."""
    from accessory_tpu.quant import quantize_params

    args = LLaMAArgs(dim=128, n_layers=2, n_heads=2, n_kv_heads=2,
                     vocab_size=64, multiple_of=64, max_seq_len=16,
                     dtype="float32", lora_rank=4, bias_tuning=True,
                     norm_tuning=True)
    params = llama.init_params(jax.random.PRNGKey(0), args)
    qp = quantize_params(params, bits=4, group_size=64, layout="planes")
    trainable = llama.get_trainable_params_filter(args)
    tx = make_optimizer(qp, 1e-2, weight_decay=0.0, clip_norm=1.0,
                        trainable=trainable)
    state = TrainState.create(qp, tx)
    step = make_train_step(llama, args, tx, remat=True)
    batch = {"examples": jnp.ones((2, 16), jnp.int32) * 5,
             "labels": jnp.ones((2, 16), jnp.int32) * 7}
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["c_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # LoRA/bias/norm actually learn


def test_autocast_bf16_compute_with_fp32_masters():
    """fp32-master params + bf16 model dtype: the step must cast compute to
    bf16 inside the differentiated graph (reference default_tensor_type +
    promote_trainable_params_to_fp32 pairing) while updates/masters remain
    fp32 and training still converges."""
    from accessory_tpu.train.precision import promote_trainable_params_to_fp32

    args = LLaMAArgs(dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
                     vocab_size=64, multiple_of=16, max_seq_len=16,
                     dtype="bfloat16")
    params = llama.init_params(jax.random.PRNGKey(0), args)
    params = promote_trainable_params_to_fp32(params)
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(params)
               if jnp.issubdtype(l.dtype, jnp.floating))
    tx = make_optimizer(params, 1e-2, weight_decay=0.0, clip_norm=1.0)
    state = TrainState.create(params, tx)
    step = make_train_step(llama, args, tx)
    batch = {"examples": jnp.ones((2, 16), jnp.int32) * 5,
             "labels": jnp.ones((2, 16), jnp.int32) * 9}
    losses = []
    for _ in range(10):
        state, metrics = step(state, batch)
        losses.append(float(metrics["c_loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    # masters stayed fp32 through the update
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state.params)
               if jnp.issubdtype(l.dtype, jnp.floating))


def test_norm_only_qpeft_trains_through_fused_eligible_modules():
    """Norm-only PEFT (no lora, no bias): wo/w2 modules have neither
    lora_a nor bias, so module_linear_nr would fuse them into the raw
    kernel call — which has no autodiff rule. The training path must
    force the unfused (differentiable) composition (allow_fused=False
    threaded from the cache-free block)."""
    from accessory_tpu.quant import quantize_params

    args = LLaMAArgs(dim=128, n_layers=2, n_heads=2, n_kv_heads=2,
                     vocab_size=64, multiple_of=64, max_seq_len=16,
                     dtype="float32", norm_tuning=True)
    params = llama.init_params(jax.random.PRNGKey(0), args)
    qp = quantize_params(params, bits=4, group_size=64, layout="planes")
    trainable = llama.get_trainable_params_filter(args)
    tx = make_optimizer(qp, 1e-2, weight_decay=0.0, clip_norm=1.0,
                        trainable=trainable)
    state = TrainState.create(qp, tx)
    step = make_train_step(llama, args, tx, remat=True)
    batch = {"examples": jnp.ones((2, 16), jnp.int32) * 5,
             "labels": jnp.ones((2, 16), jnp.int32) * 7}
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["c_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
