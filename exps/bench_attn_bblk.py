"""b_blk sweep for the fused decode-attention+write kernel at headline shape.

The round-3 step budget puts attention at ~0.35 ms/step (522 GB/s) vs the
184 MB / 744 GB/s = 0.247 ms read floor. Per layer that's ~16 us vs 11.3 —
is the gap per-program pipeline drain (fewer, bigger blocks -> less overlap)
or per-program fixed cost (more, smaller blocks -> more overhead)?

Times a 22-layer unrolled chain (like the model's decode loop) of
_decode_attn_bloop_w on per-layer pools, two-point fit, for each b_blk.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.ops import decode_attention as da

L, B, NKV, R, HD, S = 22, 8, 4, 8, 64, 1024


def bench(b_blk, kernel="bloop", reps=3, n1=5, n2=25):
    rng = np.random.RandomState(0)
    pools = [(jnp.asarray(rng.standard_normal((B, NKV, HD, S)), jnp.bfloat16),
              jnp.asarray(rng.standard_normal((B, NKV, HD, S)), jnp.bfloat16))
             for _ in range(L)]
    q0 = jnp.asarray(rng.standard_normal((B, NKV, R, HD)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, NKV, 1, HD)), jnp.bfloat16)
    lens = jnp.full((B,), 512, jnp.int32)

    if kernel == "stream":
        # pure-DMA probe with the attention kernel's exact grid + blocks:
        # reads both pools, trivial compute, no aliasing
        import functools

        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        contig = "--contig" in sys.argv  # bdiag-style (b_blk, NKV, HD, S)

        def _probe(kc_ref, vc_ref, out_ref):
            acc = jnp.zeros_like(out_ref)
            for bb in range(kc_ref.shape[0]):
                acc += (kc_ref[bb, 0, :, :64].astype(jnp.float32)
                        + vc_ref[bb, 0, :, :64].astype(jnp.float32))
            out_ref[:] = acc

        @functools.partial(jax.jit, static_argnames=())
        def probe(ck, cv):
            if contig:
                grid = (B // b_blk,)
                spec = pl.BlockSpec((b_blk, NKV, HD, S),
                                    lambda i: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
                out_spec = pl.BlockSpec((HD, 64), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
            else:
                grid = (NKV, B // b_blk)
                spec = pl.BlockSpec((b_blk, 1, HD, S),
                                    lambda j, i: (i, j, 0, 0),
                                    memory_space=pltpu.VMEM)
                out_spec = pl.BlockSpec((HD, 64), lambda j, i: (0, 0),
                                        memory_space=pltpu.VMEM)
            return pl.pallas_call(
                _probe,
                grid=grid,
                in_specs=[spec, spec],
                out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct((HD, 64), jnp.float32),
            )(ck, cv)

        def fn(q, kn_, vn_, ck, cv, lens_, pos_, b_blk_):
            s = probe(ck, cv)
            return (q + s[0, 0] * 1e-6).astype(q.dtype), ck, cv
    else:
        fn = da._decode_attn_bloop_w

    def step(q, pools, pos):
        new = []
        for ck, cv in pools:
            out, wk, wv = fn(q, kn, kn, ck, cv, lens, pos, b_blk)
            new.append((wk, wv))
            q = (out * 1e-6 + q0).astype(q.dtype)
        return q, new

    f = jax.jit(step, donate_argnums=(1,))
    q, pools = f(q0, pools, 512)
    np.asarray(q).ravel()[0]
    ests = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(n1):
            q, pools = f(q, pools, 513 + i)
        np.asarray(q).ravel()[0]
        t1 = time.perf_counter()
        for i in range(n2):
            q, pools = f(q, pools, 513 + i)
        np.asarray(q).ravel()[0]
        t2 = time.perf_counter()
        ests.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return float(np.median(ests))


if __name__ == "__main__":
    kernel = "stream" if "--stream" in sys.argv else "bloop"
    blks = [int(a) for a in sys.argv[1:] if not a.startswith("-")] \
        or [1, 2, 4, 8]
    bytes_read = L * 2 * B * NKV * HD * S * 2
    print(f"read floor @744 GB/s: {bytes_read/744e9*1e3:.3f} ms "
          f"({bytes_read/1e6:.0f} MB)")
    for b in blks:
        dt = bench(b, kernel)
        print(f"{kernel} b_blk={b}: {dt*1e3:7.3f} ms/step "
              f"({bytes_read/dt/1e9:5.1f} GB/s)", flush=True)
