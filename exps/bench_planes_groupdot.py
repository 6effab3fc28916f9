"""Chip A/B: per-element scale multiply vs post-dot per-group scaling in the
planes kernel (ACCESSORY_QMM_GROUPDOT / planes_qmm(group_dot=)).

The kernel is VPU-bound on dequant: at 562 GB/s effective vs the 715 GB/s
streaming probe, the per-element cast+multiply (~3.4 VPU ops/element with
unpack) runs slower than the HBM stream. group_dot moves the scale multiply
after the MXU (one (TM, TN) multiply-add per group of 128 rows), leaving only
the int8->bf16 cast per element — if the cast lowers to ~1 op the kernel
becomes memory-bound.

Shapes: the TinyLlama-1.1B headline decode matmuls (fused wqkv, w13 fused,
w2, W4 head) + the K=N=4096 harness shape the 562 GB/s number came from.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.ops.quant_matmul_planes import choose_tile_k, planes_qmm

SHAPES = [
    ("wqkv", 8, 2048, 2560),
    ("w13", 8, 2048, 11264),
    ("w2", 8, 5632, 2048),
    ("harness", 8, 4096, 4096),
]
G = 128


INNER = 64


def bench(m, k, n, group_dot, reps=3, n1=3, n2=13):
    """Time a lax.scan of INNER dependent kernel calls inside ONE jit —
    the same harness shape that produced the documented 562/715 GB/s
    numbers (single-dispatch timing through the relay has a ~0.1 ms
    floor that swamps these ~20 us kernels)."""
    rng = np.random.RandomState(0)
    tk = choose_tile_k(k, G)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    packed = jnp.asarray(rng.randint(0, 2 ** 32, (k // 8, n), np.uint32))
    scales = jnp.asarray(rng.uniform(1e-3, 2e-3, (k // G, n)), jnp.float32)
    zs = jnp.asarray(rng.uniform(0, 0.03, (k // G, n)), jnp.float32)

    def body(c, _):
        y = planes_qmm(c, packed, scales, zs, group_size=G, tk=tk,
                       group_dot=group_dot)
        # serialize steps with cheap elementwise feedback (no extra dot)
        reps_n = (k + n - 1) // n
        fb = jnp.concatenate([y] * reps_n, axis=1)[:, :k]
        return (fb * 1e-6 + x).astype(c.dtype), None

    @jax.jit
    def run(a):
        c, _ = jax.lax.scan(body, a, None, length=INNER)
        return c

    out = run(x)
    np.asarray(out).ravel()[0]
    ests = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n1):
            out = run(out)
        np.asarray(out).ravel()[0]
        t1 = time.perf_counter()
        for _ in range(n2):
            out = run(out)
        np.asarray(out).ravel()[0]
        t2 = time.perf_counter()
        ests.append(((t2 - t1) - (t1 - t0)) / ((n2 - n1) * INNER))
    return float(np.median(ests)), tk


def check_parity(m, k, n):
    rng = np.random.RandomState(1)
    tk = choose_tile_k(k, G)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    packed = jnp.asarray(rng.randint(0, 2 ** 32, (k // 8, n), np.uint32))
    scales = jnp.asarray(rng.uniform(1e-3, 2e-3, (k // G, n)), jnp.float32)
    zs = jnp.asarray(rng.uniform(0, 0.03, (k // G, n)), jnp.float32)
    a = np.asarray(planes_qmm(x, packed, scales, zs, group_size=G, tk=tk,
                              group_dot=False))
    b = np.asarray(planes_qmm(x, packed, scales, zs, group_size=G, tk=tk,
                              group_dot=True))
    d = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"  parity ({m}x{k}x{n}): rel max|d| = {d:.2e}", flush=True)


if __name__ == "__main__":
    import os

    if "--parity" in sys.argv:
        check_parity(8, 2048, 2560)
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    tn_tag = os.environ.get("ACCESSORY_QMM_TN", "2048")
    for name, m, k, n in SHAPES:
        if only and name not in only:
            continue
        wbytes = k * n // 2 + (k // G) * n * 8
        row = []
        times = {}
        for gd in (False, True):
            dt, tk = bench(m, k, n, gd)
            times[gd] = dt
            row.append(f"{'groupdot' if gd else 'fused':8s} {dt*1e3:7.4f} ms "
                       f"({wbytes/dt/1e9:5.1f} GB/s)")
        row.append(f"speedup {times[False]/times[True]:.3f}x")
        print(f"{name:8s} K={k} N={n} tk={tk} tn<={tn_tag}: "
              + " | ".join(row), flush=True)
