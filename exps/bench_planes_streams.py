"""Does splitting the planes kernel's weight operand into N sub-operands
raise its HBM streaming rate?

Round-3 finding (exps/bench_attn_bblk.py --stream): one DMA stream per
operand reads ~523 GB/s, four parallel streams ~689 GB/s — Pallas issues
one DMA per operand per grid step, so operand count == concurrent-stream
count. The planes kernel streams its dominant operand (packed u32
weights) as ONE operand at 562 GB/s standalone / 517 in-model. This probe
measures a planes-shaped *streaming* kernel (same grid, same block bytes,
trivial compute) with the weight bytes split 1/2/4/8 ways along k-tile
quarters, plus a full-dequant variant to see whether the VPU work hides
or exposes the stream difference.

Usage: python exps/bench_planes_streams.py [--dequant] [splits...]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# headline-ish shape: 22 layers of K=N=4096-class streaming, m=8
M, K, N = 8, 4096, 4096
TK, TN = 2048, 2048
L = 22
_MASK = 0x0F0F0F0F


def make_kernel(splits: int, dequant: bool):
    def kernel(x_ref, *refs):
        w_refs = refs[:splits]
        out_ref, acc_ref = refs[splits], refs[splits + 1]
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        x = x_ref[:]
        sub = TK // splits          # x columns per sub-operand (per half)
        for s, wr in enumerate(w_refs):
            w32 = wr[:]             # (tk/8/splits, TN)
            if dequant:
                m = jnp.uint32(_MASK)
                lo8 = pltpu.bitcast(w32 & m, jnp.int8)
                hi8 = pltpu.bitcast((w32 >> jnp.uint32(4)) & m, jnp.int8)
                for h, q8 in ((0, lo8), (1, hi8)):
                    c0 = h * (TK // 2) + s * (sub // 2)
                    acc_ref[:] += jnp.dot(
                        x[:, c0:c0 + sub // 2], q8.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            else:
                acc_ref[:] += jnp.sum(
                    pltpu.bitcast(w32[:8], jnp.int32).astype(
                        jnp.float32))[None, None]

        @pl.when(kk == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    return kernel


def build(splits: int, dequant: bool):
    grid = (1, N // TN, K // TK)
    rows = TK // 8 // splits
    in_specs = [pl.BlockSpec((8, TK), lambda i, j, kk: (i, kk),
                             memory_space=pltpu.VMEM)]
    for _ in range(splits):
        in_specs.append(pl.BlockSpec((rows, TN), lambda i, j, kk: (kk, j),
                                     memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        make_kernel(splits, dequant),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, TN), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((8, TN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * K * N, bytes_accessed=K * N // 2 + 8 * K * 2,
            transcendentals=0),
    )
    return call


def bench(splits: int, dequant: bool, reps=3, n1=5, n2=25):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal((8, K)), jnp.bfloat16)
    ws = []
    for _ in range(L):
        full = jnp.asarray(
            rng.randint(0, 2**31, (K // 8, N), dtype=np.int64), jnp.uint32)
        rows = TK // 8 // splits
        # quarter-split along within-tile word-row blocks
        parts = []
        t = full.reshape(K // TK, TK // 8, N)
        for s in range(splits):
            parts.append(t[:, s * rows:(s + 1) * rows].reshape(-1, N))
        ws.append(tuple(parts))
    call = build(splits, dequant)

    def step(x):
        for parts in ws:
            y = call(x, *parts)
            x = (x + y[:, :K].astype(jnp.float32) * 1e-9).astype(x.dtype) \
                if N >= K else x
        return x

    # on-device loop: one dispatch per `inner` steps — host-loop windows
    # measure the relay's dispatch rate, not the chip (r4 finding)
    inner, outer = 25, 6

    def many(x):
        return jax.lax.fori_loop(0, inner, lambda i, x: step(x), x)

    f = jax.jit(many)
    x = f(x)
    np.asarray(x).ravel()[0]
    ests = []
    for _ in range(reps):
        t0 = time.perf_counter()
        x = f(x)
        np.asarray(x).ravel()[0]
        t1 = time.perf_counter()
        for _ in range(outer):
            x = f(x)
        np.asarray(x).ravel()[0]
        t2 = time.perf_counter()
        ests.append(((t2 - t1) - (t1 - t0)) / ((outer - 1) * inner))
    return float(np.median(ests))


if __name__ == "__main__":
    dequant = "--dequant" in sys.argv
    splits = [int(a) for a in sys.argv[1:] if not a.startswith("-")] \
        or [1, 2, 4, 8]
    bytes_per = L * (K * N // 2)
    print(f"weight bytes/step: {bytes_per/1e6:.0f} MB  "
          f"(dequant={dequant})")
    for s in splits:
        dt = bench(s, dequant)
        print(f"splits={s}: {dt*1e3:7.3f} ms/step "
              f"({bytes_per/dt/1e9:5.1f} GB/s)", flush=True)
