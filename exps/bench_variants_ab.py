"""In-process interleaved A/B/N of headline decode-step variants.

Each variant is a dict of env vars applied at BUILD time (the kernels read
env during trace). All variants are jitted in one process; timed windows
rotate round-robin so adjacent measurements share relay congestion.

Usage: python exps/bench_variants_ab.py [pairs]
Edit VARIANTS below per experiment.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from accessory_tpu.config import LLaMAArgs
from accessory_tpu.models import llama
from accessory_tpu.quant import fuse

VARIANTS = {
    # "auto" became the planes-kernel DEFAULT in r4 — pin the old default
    # explicitly or the A/B measures identical kernels
    "base": {"ACCESSORY_QMM_GROUPDOT": "0"},
    "auto": {"ACCESSORY_QMM_GROUPDOT": "auto"},
}


def build(env):
    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        args = LLaMAArgs(dim=2048, n_layers=22, n_heads=32, n_kv_heads=4,
                         vocab_size=32000, multiple_of=256,
                         max_seq_len=B.CACHE_LEN, dtype="bfloat16")
        params = llama.unstack_layers(
            fuse.fuse_for_decode(B._host_synthetic_w4(args)))
        cache = llama.init_kv_cache(args, B.BATCH, max_len=B.CACHE_LEN,
                                    stacked=False)
        step = jax.jit(
            lambda p, t, c, pos: llama.forward(p, args, t, cache=c,
                                               cur_pos=pos),
            donate_argnums=(2,))
        tok = jnp.ones((B.BATCH, 1), jnp.int32)
        logits, cache = step(params, tok, cache, 512)
        np.asarray(logits[0, 0, 0])
        return step, params, cache, tok
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def window(step, params, cache, tok, n):
    t0 = time.perf_counter()
    logits = None
    for i in range(n):
        logits, cache = step(params, tok, cache, 512 + i)
    np.asarray(logits[0, 0, 0])
    return time.perf_counter() - t0, cache


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    variants = {}
    for name, env in VARIANTS.items():
        variants[name] = build(env)
        print(f"built {name}", flush=True)
    for name in variants:
        step, params, cache, tok = variants[name]
        _, cache = window(step, params, cache, tok, 20)
        variants[name] = (step, params, cache, tok)

    times = {n: [] for n in VARIANTS}
    names = list(VARIANTS)
    for p in range(pairs):
        order = names if p % 2 == 0 else names[::-1]
        for name in order:
            step, params, cache, tok = variants[name]
            t1, cache = window(step, params, cache, tok, 20)
            t2, cache = window(step, params, cache, tok, 120)
            variants[name] = (step, params, cache, tok)
            times[name].append((t2 - t1) / 100)
        row = "  ".join(f"{n} {times[n][-1]*1e3:.3f}" for n in names)
        print(f"pair {p}: {row} ms", flush=True)
    base = np.median(times[names[0]])
    for n in names:
        m = np.median(times[n])
        print(f"{n}: median {m*1e3:.3f} ms ({B.BATCH/m:.0f} tok/s) "
              f"vs base {(base/m-1)*100:+.2f}%")


if __name__ == "__main__":
    main()
