"""In-process interleaved A/B of decode-step variants at the headline shape.

The relay's congestion moves identical configs by ±15% across minutes
(BENCHMARKS.md round 3), so cross-process A/Bs are noise; this harness
jits BOTH variants in one process and alternates timed windows A B A B …
— adjacent windows share the congestion level, and the per-pair delta is
the signal.

Default A/B: kernel_prep (pad/convert launch diet) off vs on.

Usage: python exps/bench_prep_ab.py [pairs]
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


def build(prep: bool):
    args = LLaMAArgs(dim=2048, n_layers=22, n_heads=32, n_kv_heads=4,
                     vocab_size=32000, multiple_of=256,
                     max_seq_len=B.CACHE_LEN, dtype="bfloat16")
    os.environ["ACCESSORY_KERNEL_PREP"] = "1" if prep else "0"
    params = llama.unstack_layers(
        fuse.fuse_for_decode(B._host_synthetic_w4(args)))
    cache = llama.init_kv_cache(args, B.BATCH, max_len=B.CACHE_LEN,
                                stacked=False)
    step = jax.jit(
        lambda p, t, c, pos: llama.forward(p, args, t, cache=c, cur_pos=pos),
        donate_argnums=(2,))
    return args, params, cache, step


def window(step, params, cache, tok, n):
    t0 = time.perf_counter()
    logits = None
    for i in range(n):
        logits, cache = step(params, tok, cache, 512 + i)
    np.asarray(logits[0, 0, 0])
    return time.perf_counter() - t0, cache


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    tok = jnp.ones((B.BATCH, 1), jnp.int32)
    variants = {}
    for name, prep in (("noprep", False), ("prep", True)):
        args, params, cache, step = build(prep)
        logits, cache = step(params, tok, cache, 512)
        np.asarray(logits[0, 0, 0])
        _, cache = window(step, params, cache, tok, 20)  # warm
        variants[name] = (step, params, cache)

    deltas = []
    for p in range(pairs):
        res = {}
        order = ("noprep", "prep") if p % 2 == 0 else ("prep", "noprep")
        for name in order:
            step, params, cache = variants[name]
            # two-point fit inside the window pair
            t1, cache = window(step, params, cache, tok, 20)
            t2, cache = window(step, params, cache, tok, 120)
            variants[name] = (step, params, cache)
            res[name] = (t2 - t1) / 100
        d = res["noprep"] / res["prep"] - 1
        deltas.append(d)
        print(f"pair {p}: noprep {res['noprep']*1e3:.3f} ms  "
              f"prep {res['prep']*1e3:.3f} ms  prep speedup {d*100:+.2f}%",
              flush=True)
    print(f"median prep speedup: {np.median(deltas)*100:+.2f}%")


if __name__ == "__main__":
    main()
