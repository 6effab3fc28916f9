"""PEFT tests: zero-init LoRA is identity, lora-only training moves only
adapters, QPEFT (quantized base + LoRA) trains, trainable-only save+reload
composes with the base checkpoint. References: accessory/model/peft.py,
llama_peft.py:48-50, main_finetune.py:172-210 (QPEFT), misc.py:346-352."""

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.config import LLaMAArgs
from accessory_tpu.models import llama
from accessory_tpu.train import TrainState, make_optimizer, make_train_step


def args_pair():
    base = dict(dim=32, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=64,
                multiple_of=16, max_seq_len=16, dtype="float32")
    return (LLaMAArgs(**base),
            LLaMAArgs(**base, lora_rank=4, bias_tuning=True, norm_tuning=True))


def test_zero_init_lora_is_identity():
    plain, peft = args_pair()
    p0 = llama.init_params(jax.random.PRNGKey(0), plain)
    p1 = llama.init_params(jax.random.PRNGKey(0), peft)
    toks = jnp.arange(8)[None, :] % 64
    a, _ = llama.forward(p0, plain, toks)
    b, _ = llama.forward(p1, peft, toks)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_peft_training_moves_only_adapters():
    _, peft = args_pair()
    params = llama.init_params(jax.random.PRNGKey(0), peft)
    trainable = llama.get_trainable_params_filter(peft)
    tx = make_optimizer(params, 1e-2, trainable=trainable)
    step = jax.jit(make_train_step(llama, peft, tx, remat=False))
    state = TrainState.create(params, tx)
    batch = {"examples": jnp.ones((2, 8), jnp.int32) * 3,
             "labels": jnp.ones((2, 8), jnp.int32) * 5}
    for _ in range(3):
        state, m = step(state, batch)
    att = state.params["layers"]["attention"]["wq"]
    np.testing.assert_array_equal(
        np.asarray(att["weight"]),
        np.asarray(params["layers"]["attention"]["wq"]["weight"]))
    assert not np.array_equal(np.asarray(att["lora_b"]),
                              np.asarray(params["layers"]["attention"]["wq"]["lora_b"]))
    assert not np.array_equal(np.asarray(att["bias"]),
                              np.asarray(params["layers"]["attention"]["wq"]["bias"]))


def test_qpeft_forward_and_train():
    from accessory_tpu.quant import quantize_params

    _, peft = args_pair()
    params = llama.init_params(jax.random.PRNGKey(0), peft)
    qp = quantize_params(params, bits=4, group_size=16)
    # lora/bias/norm stayed dense
    assert hasattr(qp["layers"]["attention"]["wq"]["weight"], "bits")
    assert not hasattr(qp["layers"]["attention"]["wq"]["lora_a"], "bits")

    toks = jnp.arange(8)[None, :] % 64
    logits, _ = llama.forward(qp, peft, toks)
    assert np.isfinite(np.asarray(logits)).all()

    trainable = llama.get_trainable_params_filter(peft)
    tx = make_optimizer(qp, 1e-2, trainable=trainable)
    step = jax.jit(make_train_step(llama, peft, tx, remat=False))
    state = TrainState.create(qp, tx)
    batch = {"examples": jnp.ones((2, 8), jnp.int32) * 3,
             "labels": jnp.ones((2, 8), jnp.int32) * 5}
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["c_loss"]))
    assert losses[-1] < losses[0]


def test_trainable_only_save_composes(tmp_path):
    from accessory_tpu.checkpoint import load_checkpoint_list, save_checkpoint

    _, peft = args_pair()
    params = llama.init_params(jax.random.PRNGKey(0), peft)
    base_dir, delta_dir = str(tmp_path / "base"), str(tmp_path / "delta")
    save_checkpoint(base_dir, params)

    trainable = llama.get_trainable_params_filter(peft)
    mod = jax.tree.map(lambda x: x, params)
    mod["layers"]["attention"]["wq"]["lora_b"] = (
        params["layers"]["attention"]["wq"]["lora_b"] + 1.0)
    save_checkpoint(delta_dir, mod, filter=trainable)

    merged = load_checkpoint_list([base_dir, delta_dir], params)
    np.testing.assert_array_equal(
        np.asarray(merged["layers"]["attention"]["wq"]["lora_b"]),
        np.asarray(mod["layers"]["attention"]["wq"]["lora_b"]))
    np.testing.assert_array_equal(
        np.asarray(merged["layers"]["attention"]["wq"]["weight"]),
        np.asarray(params["layers"]["attention"]["wq"]["weight"]))
