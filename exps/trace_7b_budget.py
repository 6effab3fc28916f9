"""Per-kernel trace budget of the LLaMA2-7B bs8 W4 decode step.

VERDICT r4 weak #1: the TinyLlama headline got a full per-kernel budget
(BENCHMARKS.md:40-70); 7B — the one BASELINE-tracked config under the
0.85 bar — never did. This runs the same jax.profiler methodology on the
7B step (MHA 32/32, dim 4096, L=32) for bf16-KV and int8-KV pools and
digests the device lane into a per-kernel table: planes matmuls
(wqkv/wo/w13/w2 by shape), decode attention, bf16 head, glue.

Usage: python exps/trace_7b_budget.py [fp|int8|both] [steps]
Writes /tmp/trace7b_<kv>/ and prints the digest (µs/step by kernel).
"""

import gzip
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

import bench as Bm
from accessory_tpu.config import LLaMAArgs
from accessory_tpu.models import llama
from accessory_tpu.quant.fuse import fuse_for_decode

BATCH, CTX = 8, 1024


def build(kv_dtype):
    args = LLaMAArgs(dim=4096, n_layers=32, n_heads=32, vocab_size=32000,
                     multiple_of=256, max_seq_len=CTX, dtype="bfloat16")
    params = llama.unstack_layers(fuse_for_decode(Bm._host_synthetic_w4(args)))
    cache = llama.init_kv_cache(args, BATCH, max_len=CTX, stacked=False,
                                kv_dtype=kv_dtype)
    step = jax.jit(lambda p, t, c, pos: llama.forward(
        p, args, t, cache=c, cur_pos=pos), donate_argnums=(2,))
    return args, params, cache, step


def digest(logdir, n_steps):
    cands = []
    for root, _, files in os.walk(logdir):
        for f in files:
            if f.endswith("trace.json.gz"):
                cands.append(os.path.join(root, f))
    assert cands, f"no trace under {logdir}"
    prof = max(cands, key=os.path.getmtime)
    with gzip.open(prof) as f:
        tr = json.load(f)
    ev = [e for e in tr["traceEvents"] if e.get("ph") == "X"]
    # device "XLA Ops" lane: the pid whose thread_name metadata says so
    lanes = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lanes[(e["pid"], e["tid"])] = e["args"]["name"]
    xla = [k for k, v in lanes.items() if "XLA Ops" in v]
    assert xla, sorted(set(lanes.values()))
    pid, tid = xla[0]
    dev = [e for e in ev if e["pid"] == pid and e["tid"] == tid]
    span = max(e["ts"] + e["dur"] for e in dev) - min(e["ts"] for e in dev)
    agg = {}
    for e in dev:
        base = e["name"].split(".")[0]
        agg.setdefault(base, []).append(e["dur"])
    # same-named kernels with distinct shapes (the four planes matmuls)
    # cluster by duration: split a name when durations gap by >1.25x
    rows = []
    for name, durs in agg.items():
        durs.sort()
        groups, cur = [], [durs[0]]
        for d in durs[1:]:
            if d > cur[-1] * 1.25 and d - cur[-1] > 3.0:
                groups.append(cur)
                cur = [d]
            else:
                cur.append(d)
        groups.append(cur)
        for g in groups:
            tag = name if len(groups) == 1 else f"{name}[~{g[len(g)//2]:.0f}µs]"
            rows.append((tag, (len(g), sum(g))))
    rows.sort(key=lambda kv: -kv[1][1])
    total = sum(d for _, (_, d) in rows)
    print(f"  device span {span/n_steps:.1f} µs/step, "
          f"busy {total/n_steps:.1f} µs/step "
          f"(idle {(span-total)/n_steps:.1f})")
    print(f"  {'kernel':<52}{'calls/st':>9}{'µs/step':>10}{'µs/call':>9}")
    for name, (c, d) in rows[:22]:
        print(f"  {name[:52]:<52}{c/n_steps:>9.1f}{d/n_steps:>10.1f}"
              f"{d/c:>9.2f}")
    return span / n_steps


def run(kv, n_steps):
    kvname = "int8" if kv == "int8" else "fp"
    print(f"=== LLaMA2-7B bs8 {CTX}-ctx W4, kv={kvname} ===", flush=True)
    args, params, cache, step = build(kv)  # "fp" pins bf16 pools explicitly
    tok = jnp.ones((BATCH, 1), jnp.int32)
    logits, cache = step(params, tok, cache, 512)
    np.asarray(logits[0, 0, 0])
    for i in range(10):
        logits, cache = step(params, tok, cache, 513 + i)
    np.asarray(logits[0, 0, 0])
    # timed two-point fit for the tok/s alongside the trace
    def timed(n, c):
        t0 = time.perf_counter()
        for i in range(n):
            logits, c = step(params, tok, c, 600 + i)
        np.asarray(logits[0, 0, 0])
        return time.perf_counter() - t0, c

    t1, cache = timed(10, cache)
    t2, cache = timed(60, cache)
    per = (t2 - t1) / 50
    print(f"  {BATCH/per:.1f} tok/s ({per*1e3:.2f} ms/step)", flush=True)

    import shutil

    logdir = f"/tmp/trace7b_{kvname}"
    shutil.rmtree(logdir, ignore_errors=True)  # stale traces poison digest
    jax.profiler.start_trace(logdir)
    c = cache
    for i in range(n_steps):
        logits, c = step(params, tok, c, 700 + i)
    np.asarray(logits[0, 0, 0])
    jax.profiler.stop_trace()
    digest(logdir, n_steps)
    del params, cache, c


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    if which in ("fp", "both"):
        run("fp", n_steps)
    if which in ("int8", "both"):
        run("int8", n_steps)
