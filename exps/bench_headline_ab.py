"""Interleaved A/B of the headline decode step under an env-knob.

Relay congestion moves identical-config runs by +-15% within minutes, so
back-to-back `bench.py` runs can't resolve a ~5% kernel change. This harness
traces BOTH variants in one process (the env knob is read at trace time
inside each outer jit) and times them in alternating two-point windows —
congestion hits both arms equally.

Usage: python exps/bench_headline_ab.py KNOB=A KNOB=B [rounds]
e.g.   python exps/bench_headline_ab.py ACCESSORY_QMM_GROUPDOT=0 ACCESSORY_QMM_GROUPDOT=auto
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench as B


def make_step(env_kv, args, params, cache0):
    from accessory_tpu.models import llama

    k, v = env_kv.split("=", 1)
    old = os.environ.get(k)
    os.environ[k] = v
    try:
        step = jax.jit(
            lambda p, t, c, pos: llama.forward(p, args, t, cache=c,
                                               cur_pos=pos),
            donate_argnums=(2,))
        tok = jnp.ones((B.BATCH, 1), jnp.int32)
        # trace + compile now, while the env value is in effect
        logits, cache = step(params, tok, cache0, 512)
        np.asarray(logits[0, 0, 0])
    finally:
        if old is None:
            del os.environ[k]
        else:
            os.environ[k] = old
    return step, cache, tok


def main():
    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama
    from accessory_tpu.quant.fuse import fuse_for_decode

    arms = [a for a in sys.argv[1:] if "=" in a]
    rounds = int(next((a for a in sys.argv[1:] if "=" not in a), "5"))
    assert len(arms) == 2, "need exactly two KNOB=VALUE arms"

    args = LLaMAArgs(dim=2048, n_layers=22, n_heads=32, n_kv_heads=4,
                     vocab_size=32000, multiple_of=256,
                     max_seq_len=B.CACHE_LEN, dtype="bfloat16")
    params = llama.unstack_layers(fuse_for_decode(B._host_synthetic_w4(args)))

    steps = {}
    for arm in arms:
        cache0 = llama.init_kv_cache(args, B.BATCH, max_len=B.CACHE_LEN,
                                     stacked=False)
        steps[arm] = make_step(arm, args, params, cache0)

    n1, n2 = 20, 120
    fits = {arm: [] for arm in arms}
    for r in range(rounds):
        for arm in arms:
            step, cache, tok = steps[arm]
            t0 = time.perf_counter()
            for i in range(n1):
                logits, cache = step(params, tok, cache, 512 + i)
            np.asarray(logits[0, 0, 0])
            t1 = time.perf_counter()
            for i in range(n2):
                logits, cache = step(params, tok, cache, 512 + i)
            np.asarray(logits[0, 0, 0])
            t2 = time.perf_counter()
            steps[arm] = (step, cache, tok)
            per = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
            fits[arm].append(per)
            print(f"  round {r} {arm}: {per*1e3:.3f} ms/step "
                  f"({B.BATCH/per:.0f} tok/s)", flush=True)
    print()
    meds = {}
    for arm in arms:
        med = float(np.median(fits[arm]))
        meds[arm] = med
        print(f"{arm}: median {med*1e3:.3f} ms/step = "
              f"{B.BATCH/med:.1f} tok/s  (all: "
              + ", ".join(f"{f*1e3:.3f}" for f in fits[arm]) + ")")
    a, b = arms
    print(f"B vs A speedup: {meds[a]/meds[b]:.4f}x")


if __name__ == "__main__":
    main()
