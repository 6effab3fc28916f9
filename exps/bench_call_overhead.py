"""Measure the fixed cost of a planes_qmm Pallas call at decode shapes.

Streams the same total weight bytes split across different call counts:
per-call fixed cost = slope of (time vs n_calls) at constant bytes.
M=8 (decode), K=2048; output width n varies per variant.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.ops.quant_matmul_planes import planes_qmm, choose_tile_k

M, K, GS = 8, 2048, 128


def mk_weights(n, count, seed=0):
    rng = np.random.RandomState(seed)
    tk = choose_tile_k(K, GS)
    packed = jnp.asarray(rng.randint(0, 2**32, size=(count, K // 8, n),
                                     dtype=np.uint32))
    scales = jnp.asarray(rng.uniform(1e-3, 2e-3, size=(count, K // GS, n))
                         .astype(np.float32))
    zs = jnp.asarray(rng.uniform(0, 0.03, size=(count, K // GS, n))
                     .astype(np.float32))
    return packed, scales, zs, tk


def timed(run, n1=200, n2=1200):
    f = jax.jit(run, static_argnums=(1,))
    for n in (n1, n2):
        np.asarray(jax.tree.leaves(f(jnp.float32(1.0), n))[0]).ravel()[0]
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(f(jnp.float32(1.0), n1))[0]).ravel()[0]
    t1 = time.perf_counter()
    np.asarray(jax.tree.leaves(f(jnp.float32(1.0), n2))[0]).ravel()[0]
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def main():
    # constant total output width 8192 per "step", split into c calls
    for c in (1, 2, 4, 8, 16):
        n = 8192 // c
        packed, scales, zs, tk = mk_weights(n, c)
        x0 = jnp.asarray(np.random.RandomState(1).standard_normal((M, K)),
                         jnp.bfloat16)

        def run(s, steps):
            def step(h, _):
                acc = h * 0
                for i in range(c):
                    y = planes_qmm(h, packed[i], scales[i], zs[i],
                                   group_size=GS, tk=tk)
                    # fold back to (M, K) to chain the dependency
                    if n % K == 0:
                        acc = acc + y.reshape(M, n // K, K).sum(axis=1)
                    else:
                        acc = acc.at[:, :n].add(y)
                return (h + acc * 1e-6).astype(h.dtype), None
            h, _ = jax.lax.scan(step, x0 * s, None, length=steps)
            return h

        dt = timed(run)
        bytes_step = c * (K * n // 2 + 2 * (K // GS) * n * 4)
        print(f"calls/step={c:2d} width={n:5d}: {dt*1e6:8.1f} us/step, "
              f"{bytes_step/dt/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
