"""Bisect decode-step component costs on the real chip.

Each component is timed as a whole-jit fori_loop of many dependent steps
(single-dispatch timing through the relay is unreliable); per-step cost
comes from a two-point fit between short and long loops.

Components:
  write:dus       carry cache, dynamic_update_slice one column per step
  write:col       carry cache, aliased Pallas lane-tile read-modify-write
  write:none      carry cache untouched (control: loop overhead)
  attn:grid-bnkv  22-layer scan of the old (B, NKV)-grid kernel
  attn:bloop      22-layer scan of the batch-blocked kernel
  attn:none       22-layer scan control
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.ops import decode_attention as da

L, B, NKV, HD, S = 22, 8, 4, 64, 1024


def timed_loop(build_run, n1=20, n2=120):
    run = jax.jit(build_run, static_argnums=(1,))
    # warm BOTH loop lengths (each is its own compile)
    for n in (n1, n2):
        out = run(jnp.float32(1.0), n)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    out = run(jnp.float32(1.0), n1)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t1 = time.perf_counter()
    out = run(jnp.float32(1.0), n2)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def main():
    rng = np.random.RandomState(0)
    cache_k = jnp.asarray(rng.standard_normal((L, B, NKV, HD, S)),
                          jnp.bfloat16)
    cache_v = jnp.asarray(rng.standard_normal((L, B, NKV, HD, S)),
                          jnp.bfloat16)
    upd = jnp.asarray(rng.standard_normal((L, B, NKV, HD, 1)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, NKV, 8, HD)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, NKV, 1, HD)), jnp.bfloat16)
    lens = jnp.full((B,), 512, jnp.int32)

    # ---- writes ----
    def mk_write(kind):
        def run(x, n):
            def body(i, c):
                ck, cv = c
                pos = 512 + i
                u = (upd * x).astype(upd.dtype)
                if kind == "dus":
                    ck = jax.lax.dynamic_update_slice(ck, u, (0, 0, 0, 0, pos))
                    cv = jax.lax.dynamic_update_slice(cv, u, (0, 0, 0, 0, pos))
                elif kind == "col":
                    ck, cv = da._write_col_inplace(ck, cv, u, u, pos)
                return (ck, cv)
            ck, cv = jax.lax.fori_loop(0, n, body, (cache_k, cache_v))
            # tiny output: fetching a 92 MB carry through the relay would
            # dominate the timing
            return ck[0, 0, 0, 0, 0] + cv[0, 0, 0, 0, 0]
        return run

    which = sys.argv[1:] or ["write", "attn"]

    if "write" in which:
        for kind in ("none", "dus", "col"):
            dt = timed_loop(mk_write(kind))
            print(f"write:{kind:5s}  {dt*1e3:7.3f} ms/step", flush=True)

    # ---- attention ----
    def mk_attn(kind):
        def run(x, n):
            def step(h, _):
                def layer(h2, xs):
                    ck, cv = xs
                    if kind == "grid-bnkv":
                        o = da._decode_attn_pallas(h2, kn, kn, ck, cv, lens)
                    elif kind == "bloop":
                        o = da._decode_attn_bloop(h2, kn, kn, ck, cv, lens,
                                                  b_blk=da._pick_b_blk(
                                                      B, HD, S, 2))
                    else:
                        o = h2 * 1.000001
                    return o.astype(h2.dtype), None
                h, _ = jax.lax.scan(layer, h, (cache_k, cache_v))
                return h, None
            h0 = (q * x).astype(q.dtype)
            h, _ = jax.lax.scan(step, h0, None, length=n)
            return h
        # n is static via jit static_argnums? scan length must be static.
        return run

    if "attn" in which:
        for kind in ("none", "grid-bnkv", "bloop"):
            dt = timed_loop(mk_attn(kind))
            print(f"attn:{kind:10s} {dt*1e3:7.3f} ms/step", flush=True)

    # ---- combined read + write (the real model pattern: per step a
    # scan-over-layers attention read of the cache, then one bulk write) ----
    def mk_rw(wkind):
        def run(x, n):
            def step(carry, i):
                h, ck, cv = carry
                def layer(h2, xs):
                    lk, lv = xs
                    o = da._decode_attn_bloop(h2, kn, kn, lk, lv, lens,
                                              b_blk=da._pick_b_blk(
                                                  B, HD, S, 2))
                    return o.astype(h2.dtype), None
                h, _ = jax.lax.scan(layer, h, (ck, cv))
                pos = 512 + i
                u = (upd * h[0, 0, 0, 0].astype(jnp.float32)).astype(upd.dtype)
                if wkind == "dus":
                    ck = jax.lax.dynamic_update_slice(ck, u, (0, 0, 0, 0, pos))
                    cv = jax.lax.dynamic_update_slice(cv, u, (0, 0, 0, 0, pos))
                elif wkind == "col":
                    ck, cv = da._write_col_inplace(ck, cv, u, u, pos)
                return (h, ck, cv), None
            h0 = (q * x).astype(q.dtype)
            (h, ck, cv), _ = jax.lax.scan(
                step, (h0, cache_k, cache_v), jnp.arange(n))
            return h
        return run

    if "rw" in which:
        for wkind in ("none", "dus", "col"):
            dt = timed_loop(mk_rw(wkind))
            print(f"rw:{wkind:5s}    {dt*1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
