"""Clean (on-device-loop) A/B of planes_qmm variants at the model's shapes.

The r4 streams probe showed plane dequant WITHOUT the scale multiply runs
at ~848 GB/s — the memory ceiling — while the real kernel does 522-751
per shape in-model. The delta is the scale path. Variants:
  precise   (default) int8 -> f32 cast, f32 scale mul, bf16 cast  (3 VPU passes)
  bf16      int8 -> bf16 cast, bf16 scale mul                     (2 passes)
  groupdot  post-dot per-group scaling (per-element work = 1 cast)

22 calls per shape per step, fori_loop(25) per dispatch. Run:
  python exps/bench_planes_variants.py [shape ...]   (default all four)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.ops.quant_matmul_planes import choose_tile_k, planes_qmm

SHAPES = {
    "wqkv": (2048, 2560),
    "wo": (2048, 2048),
    "w13": (2048, 11264),
    "w2": (5632, 2048),
    # LLaMA2-7B shapes (r5 trace budget: planes runs 470-550 GB/s here vs
    # 650-750 at the TinyLlama shapes — all are multi-k-tile)
    "7b_wqkv": (4096, 12288),
    "7b_wo": (4096, 4096),
    "7b_w13": (4096, 22528),
    "7b_w2": (11264, 4096),
}
GS = 128
L = 22


TK_OVERRIDE = None  # --tk=N on the CLI


def build(k, n, variant):
    rng = np.random.RandomState(0)
    tk = TK_OVERRIDE or choose_tile_k(k, GS)
    ws = []
    for _ in range(L):
        packed = jnp.asarray(
            rng.randint(0, 2**31, (k // 8, n), dtype=np.int64), jnp.uint32)
        scales = jnp.asarray(rng.uniform(1e-3, 2e-3, (k // GS, n)),
                             jnp.float32)
        zs = jnp.asarray(rng.uniform(0, 0.03, (k // GS, n)), jnp.float32)
        ws.append((packed, scales, zs))
    x0 = jnp.asarray(rng.standard_normal((8, k)), jnp.bfloat16)
    kw = {}
    if variant == "bf16":
        kw["precise"] = False
    elif variant == "groupdot":
        kw["group_dot"] = True
    elif variant.startswith("bdiag"):
        kw["group_dot"] = variant

    def step(x, ws):
        for packed, scales, zs in ws:
            y = planes_qmm(x, packed, scales, zs, group_size=GS, tk=tk, **kw)
            x = (x0 + y[:, :1].astype(jnp.float32) * 1e-9).astype(x0.dtype)
        return x

    def many(x, ws):
        return jax.lax.fori_loop(0, 25, lambda i, x: step(x, ws), x)

    return jax.jit(many), x0, ws


def bench(k, n, variant, reps=3):
    f, x0, ws = build(k, n, variant)
    x = f(x0, ws)
    np.asarray(x).ravel()[0]
    ests = []
    for _ in range(reps):
        t0 = time.perf_counter()
        x = f(x, ws)
        np.asarray(x).ravel()[0]
        t1 = time.perf_counter()
        for _ in range(5):
            x = f(x, ws)
        np.asarray(x).ravel()[0]
        t2 = time.perf_counter()
        ests.append(((t2 - t1) - (t1 - t0)) / (4 * 25))
    return float(np.median(ests))


if __name__ == "__main__":
    names = [a for a in sys.argv[1:] if not a.startswith("-")] \
        or list(SHAPES)
    variants = ("precise", "bf16", "groupdot")
    for a in sys.argv[1:]:
        if a.startswith("--tk="):
            TK_OVERRIDE = int(a[5:])
        if a.startswith("--variants="):
            variants = tuple(a[len("--variants="):].split(","))
    for nm in names:
        k, n = SHAPES[nm]
        by = L * (k * n // 2 + 2 * (k // GS) * n * 4 + 8 * k * 2 + 8 * n * 2)
        row = []
        for variant in variants:
            dt = bench(k, n, variant)
            row.append(f"{variant} {dt*1e3/L*1e3:6.2f} us/call "
                       f"({by/dt/1e9:5.0f} GB/s)")
        print(f"{nm} K={k} N={n} tk={TK_OVERRIDE or choose_tile_k(k, GS)}: "
              + "  ".join(row), flush=True)
