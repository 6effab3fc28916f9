"""W4 kernel microbenchmark: effective HBM bandwidth of the fused
dequant+matmul variants (std / planes / magic), measured as a whole jitted
scan (single-dispatch timing through the relay is unreliable — see
BENCHMARKS.md caveats).

Run: PYTHONPATH=/root/repo python bench_kernels.py [--variants std,planes]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def make_qw(k, n, gs=128, seed=0):
    from accessory_tpu.quant.qtensor import QuantizedWeight

    rng = np.random.RandomState(seed)
    packed = jnp.asarray(rng.randint(0, 2**32, (k // 8, n), np.uint64)
                         .astype(np.uint32))
    scales = jnp.asarray(rng.uniform(1e-3, 2e-3, (k // gs, n)).astype(np.float32))
    zeros = jnp.asarray(rng.randint(0, 16, (k // gs, n)).astype(np.float32))
    return QuantizedWeight(packed=packed, scales=scales, zeros=zeros, bits=4,
                           group_size=gs, in_dim=k, out_dim=n)


def bench_variant(label, qw, m, reps, inner=64):
    """Time a scan of ``inner`` dependent matmuls inside one jit."""
    from accessory_tpu.quant.qtensor import quant_matmul

    x0 = jnp.asarray(np.random.RandomState(1).randn(m, qw.in_dim),
                     jnp.bfloat16)

    def body(c, _):
        y = quant_matmul(c, qw, use_pallas=True)
        c = c + y[:, :1].astype(c.dtype)  # dependency chain, shape-preserving
        return c, ()

    @jax.jit
    def run(x):
        c, _ = jax.lax.scan(body, x, None, length=inner)
        return c

    out = run(x0)
    np.asarray(out[0, 0])  # fetch barrier (block_until_ready lies via relay)

    def timed(nrep):
        t0 = time.perf_counter()
        o = x0
        for _ in range(nrep):
            o = run(o)
        np.asarray(o[0, 0])
        return time.perf_counter() - t0

    t1 = timed(max(1, reps // 4))
    t2 = timed(reps + max(1, reps // 4))
    dt = (t2 - t1) / reps / inner
    from accessory_tpu.util.profiling import params_bytes

    wbytes = params_bytes(qw)
    bw = wbytes / dt
    print(json.dumps({
        "kernel": label, "m": m, "k": qw.in_dim, "n": qw.out_dim,
        "us_per_matmul": round(dt * 1e6, 2),
        "eff_GBps": round(bw / 1e9, 1)}), flush=True)
    return bw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="std,planes,planes_precise")
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--shapes", default="4096x4096,4096x11264,11264x4096")
    args = ap.parse_args()

    from accessory_tpu.quant.qtensor import to_magic_layout, to_planes_layout
    import dataclasses

    for shape in args.shapes.split(","):
        k, n = map(int, shape.split("x"))
        qw = make_qw(k, n)
        for v in args.variants.split(","):
            if v == "std":
                bench_variant(f"std {shape}", qw, args.m, args.reps)
            elif v == "planes":
                bench_variant(f"planes {shape}", to_planes_layout(qw),
                              args.m, args.reps)
            elif v == "planes_precise":
                qp = to_planes_layout(qw)
                # force the precise path by monkey-free flag: use planes_qmm
                from accessory_tpu.ops.quant_matmul_planes import planes_qmm
                x0 = jnp.asarray(np.random.RandomState(1).randn(args.m, k),
                                 jnp.bfloat16)

                def body(c, _):
                    y = planes_qmm(c, qp.packed, qp.scales, qp.zeros,
                                   group_size=qp.group_size, tk=qp.tile_k,
                                   precise=True)
                    return c + y[:, :1].astype(c.dtype), ()

                @jax.jit
                def run(x):
                    return jax.lax.scan(body, x, None, length=64)[0]

                out = run(x0); np.asarray(out[0, 0])
                def timed(nrep):
                    t0 = time.perf_counter()
                    o = x0
                    for _ in range(nrep):
                        o = run(o)
                    np.asarray(o[0, 0])
                    return time.perf_counter() - t0
                t1 = timed(max(1, args.reps // 4))
                t2 = timed(args.reps + max(1, args.reps // 4))
                dt = (t2 - t1) / args.reps / 64
                from accessory_tpu.util.profiling import params_bytes

                wb = params_bytes(qp)
                print(json.dumps({
                    "kernel": f"planes_precise {shape}", "m": args.m,
                    "us_per_matmul": round(dt * 1e6, 2),
                    "eff_GBps": round(wb / dt / 1e9, 1)}), flush=True)
            elif v == "magic":
                bench_variant(f"magic {shape}", to_magic_layout(qw),
                              args.m, args.reps)


if __name__ == "__main__":
    main()
