"""tile_k A/B for the planes kernel at the w2 shape (K=5632, N=2048, m=8).

choose_tile_k only doubles from 2*group_size, so K=5632 (= 512 * 11) gets
tk=512 — 11 k-steps per output tile, each paying the roll/xsum/zs VPU
work. tk=2816 is equally legal ((tk/2) % 128 == 0, divides K) and does it
in 2. Throughput only needs valid shapes, so random packed bits suffice.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.ops.quant_matmul_planes import planes_qmm

M, K, N, G = 8, 5632, 2048, 128


def bench_tk(tk, reps=3, n1=10, n2=60):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    packed = jnp.asarray(rng.randint(0, 2 ** 32, (K // 8, N), np.uint32))
    scales = jnp.asarray(rng.uniform(1e-3, 2e-3, (K // G, N)), jnp.float32)
    zs = jnp.asarray(rng.uniform(0, 0.03, (K // G, N)), jnp.float32)

    def step(a):
        y = planes_qmm(a, packed, scales, zs, group_size=G, tk=tk)
        # serialize steps with a cheap elementwise feedback (no extra dot)
        fb = jnp.concatenate([y, y, y[:, :K - 2 * N]], axis=1)
        return (fb * 1e-6 + x).astype(a.dtype)

    f = jax.jit(step)
    out = f(x)
    np.asarray(out).ravel()[0]
    ests = []
    for _ in range(reps):
        a = x
        t0 = time.perf_counter()
        for _ in range(n1):
            a = f(a)
        np.asarray(a).ravel()[0]
        t1 = time.perf_counter()
        a = x
        for _ in range(n2):
            a = f(a)
        np.asarray(a).ravel()[0]
        t2 = time.perf_counter()
        ests.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return float(np.median(ests))


if __name__ == "__main__":
    tks = [int(a) for a in sys.argv[1:]] or [512, 1408, 2816]
    wbytes = K * N // 2 + K // G * N * 8
    for tk in tks:
        if K % tk or (tk // 2) % G:
            print(f"tk={tk}: invalid for K={K}")
            continue
        dt = bench_tk(tk)
        print(f"tk={tk:5d}: {dt*1e3:7.3f} ms/step  "
              f"({wbytes/dt/1e9:5.1f} GB/s incl. chained bf16 dot)",
              flush=True)
