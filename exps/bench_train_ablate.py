"""Bisect the full-finetune train step (the bench_all --only train config):
where do the non-MFU fractions go?

Variants (all bs2 x 2048, LLaMA-700M-class, bf16 autocast + fp32 masters):
  fwd            loss-only forward (no grad)
  fwdbwd         value_and_grad, no optimizer update (remat=dots)
  fwdbwd-noremat value_and_grad with remat off (checkpoint nothing extra)
  fwdbwd-full    value_and_grad with remat="full" (save nothing)
  full           the real train step (grad + AdamW + global-norm clip)

Derived: bwd = fwdbwd - fwd; optimizer+clip = full - fwdbwd; remat
recompute = fwdbwd - fwdbwd-noremat. The ideal-forward floor is
2N*T/peak; fwd/floor says how far the forward itself is from the MXU.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.config import LLaMAArgs
from accessory_tpu.models import llama
from accessory_tpu.train import TrainState, make_optimizer, make_train_step
from accessory_tpu.train.precision import promote_trainable_params_to_fp32
from accessory_tpu.train.train_step import (combine_params,
                                            cross_entropy_loss,
                                            partition_params)

BATCH, SEQ = 2, 2048
PEAK_FLOPS = 197e12


def timed(fn, fetch, n1=3, n2=10):
    fetch(fn())
    t0 = time.perf_counter()
    for _ in range(n1):
        out = fn()
    fetch(out)
    t1 = time.perf_counter()
    for _ in range(n1 + n2):
        out = fn()
    fetch(out)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / n2


def main():
    args = LLaMAArgs(dim=2048, n_layers=12, n_heads=16, n_kv_heads=8,
                     vocab_size=32000, multiple_of=256, max_seq_len=SEQ,
                     dtype="bfloat16")
    params = llama.init_params(jax.random.PRNGKey(0), args)
    params = promote_trainable_params_to_fp32(params, None)
    tx = make_optimizer(params, 1e-4, weight_decay=0.02, clip_norm=2.0)
    state = TrainState.create(params, tx)

    rng = np.random.RandomState(0)
    batch = {
        "examples": jnp.asarray(rng.randint(3, 32000, (BATCH, SEQ)),
                                jnp.int32),
        "labels": jnp.asarray(rng.randint(3, 32000, (BATCH, SEQ)),
                              jnp.int32)}

    def loss_fn(params, remat):
        cast = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
        logits, _ = llama.forward(cast, args, batch["examples"], remat=remat)
        loss, n = cross_entropy_loss(logits, batch["labels"], 0)
        return loss

    # variants selected by argv so each runs in a fresh process — the
    # compiled grad executables + their output buffers pushed the
    # subsequent full-step jit over 16GB when run back-to-back
    which = sys.argv[1:] or ["fwd", "fwdbwd-noremat", "fwdbwd",
                             "fwdbwd-full", "full"]
    results = {}

    if "fwd" in which:
        fwd = jax.jit(lambda p: loss_fn(p, False))
        results["fwd"] = timed(lambda: fwd(state.params),
                               lambda x: np.asarray(x))

    for name, remat in [("fwdbwd-noremat", False), ("fwdbwd", "dots"),
                        ("fwdbwd-full", "full")]:
        if name not in which:
            continue
        g = jax.jit(jax.grad(lambda p: loss_fn(p, remat)))
        try:
            results[name] = timed(
                lambda: g(state.params),
                lambda t: np.asarray(jax.tree.leaves(t)[0]).ravel()[0])
        except Exception as e:  # noqa: BLE001 — OOM at this size is data
            print(f"{name}: {type(e).__name__} {str(e)[:120]}", flush=True)
        del g

    if "full" in which:
        step_fn = jax.jit(make_train_step(llama, args, tx, remat=True),
                          donate_argnums=(0,))

        def full():
            nonlocal state
            state, metrics = step_fn(state, batch)
            return metrics["loss"]

        results["full"] = timed(full, lambda x: np.asarray(x))

    # model-flops floor (2N fwd, +4N bwd, matmul params only)
    P = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params)
            if hasattr(x, "shape") and len(getattr(x, "shape", ())) >= 2)
    T = BATCH * SEQ
    floor_fwd = 2 * P * T / PEAK_FLOPS
    floor_fb = 6 * P * T / PEAK_FLOPS
    for name, dt in results.items():
        floor = floor_fwd if name == "fwd" else floor_fb
        print(f"{name:15s} {dt*1e3:8.1f} ms  (floor {floor*1e3:6.1f} ms, "
              f"{floor/dt*100:5.1f}% of peak)", flush=True)
    if "fwdbwd" in results and "full" in results:
        print(f"{'opt+clip':15s} "
              f"{(results['full']-results['fwdbwd'])*1e3:8.1f} ms",
              flush=True)
    if "fwdbwd" in results and "fwdbwd-noremat" in results:
        print(f"{'remat cost':15s} "
              f"{(results['fwdbwd']-results['fwdbwd-noremat'])*1e3:8.1f} ms",
              flush=True)
    if "fwdbwd" in results and "fwd" in results:
        print(f"{'bwd':15s} {(results['fwdbwd']-results['fwd'])*1e3:8.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
