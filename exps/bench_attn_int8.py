"""A/B the fused decode-attention kernels: bf16 cache vs int8 cache.

Chip finding this targets: at 1k ctx, end-to-end decode with int8 KV
matches bf16 tok/s exactly (4952 both) although int8 halves the KV bytes —
so the int8 kernel carries ~2x-the-savings of overhead somewhere (scale
rows, int8->bf16 upcast relayouts, or the doubled DMA count). This
microbench times ONLY the attention+write kernels, 22 dependent layers per
step, at S=1024 and S=4096, to locate the cost.

Usage: python exps/bench_attn_int8.py [S ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.ops import decode_attention as da

L, B, NKV, R, HD = 22, 8, 4, 8, 64


def timed_loop(build_run, carry0, n1=10, n2=60):
    # pools ride as jit ARGUMENTS — closure-captured arrays get baked into
    # the HLO as literals (GB-scale compile payloads; the relay 413s)
    run = jax.jit(build_run, static_argnums=(1,))
    for n in (n1, n2):
        out = run(carry0, n)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    out = run(carry0, n1)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t1 = time.perf_counter()
    out = run(carry0, n2)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def bench_s(S):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.standard_normal((B, NKV, R, HD)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, NKV, 1, HD)), jnp.bfloat16)
    ck = jnp.asarray(rng.standard_normal((L, B, NKV, HD, S)), jnp.bfloat16)
    ck8 = jnp.asarray(
        rng.randint(-127, 127, (L, B, NKV, HD, S)), jnp.int8)
    cks = jnp.asarray(rng.uniform(0.01, 0.02, (L, B, NKV, S)), jnp.float32)
    lens = jnp.full((B,), S - 1, jnp.int32)
    pos = S - 1

    def mk(kind):
        def run(carry0, n):
            def step(carry, i):
                if kind == "bf16":
                    h, k, v = carry

                    def layer(h2, xs):
                        lk, lv = xs
                        o, wk, wv = da._decode_attn_bloop_w(
                            h2, kn, kn, lk, lv, lens, pos,
                            b_blk=da._pick_b_blk(B, HD, S, 2))
                        return o.astype(h2.dtype), (wk, wv)

                    h, (k, v) = jax.lax.scan(layer, h, (k, v))
                    return (h, k, v), None
                elif kind == "int8":
                    h, k, v, ks, vs = carry

                    def layer(h2, xs):
                        lk, lv, lks, lvs = xs
                        o, wk, wv, wks, wvs = da._decode_attn_bloop_w8(
                            h2, kn, kn, lk, lv, lks, lvs, lens, pos,
                            b_blk=da._pick_b_blk(B, HD, S, 2))
                        return o.astype(h2.dtype), (wk, wv, wks, wvs)

                    h, (k, v, ks, vs) = jax.lax.scan(
                        layer, h, (k, v, ks, vs))
                    return (h, k, v, ks, vs), None
                else:
                    h = carry[0]
                    return (h * 1.000001,) + carry[1:], None

            c, _ = jax.lax.scan(step, carry0, jnp.arange(n))
            return c[0]

        return run

    kinds = ("none", "bf16", "int8") if S <= 2048 else ("bf16", "int8")
    bytes_per = {
        "bf16": 2 * L * B * NKV * HD * S * 2,
        "int8": 2 * L * B * NKV * S * (HD + 4),
    }
    for kind in kinds:
        if kind == "int8":
            c0 = (q, ck8, ck8, cks, cks)
        else:
            c0 = (q, ck, ck)
        dt = timed_loop(mk(kind), c0)
        bw = bytes_per.get(kind, 0) / dt / 1e9 if dt > 0 else 0
        print(f"S={S:5d} attnw:{kind:5s} {dt*1e3:7.3f} ms/step"
              + (f"  {bw:6.1f} GB/s" if bw else ""), flush=True)


if __name__ == "__main__":
    ss = [int(a) for a in sys.argv[1:]] or [1024, 4096]
    for S in ss:
        bench_s(S)
