"""Pool-layout A/B for the fused decode-attention+write kernel.

Current pools are (B, NKV, HD, S): a (b_blk,1,HD,S) block is b_blk
separate 128 KB strided segments (S=1024, hd=64, bf16). A pure-DMA probe
of the transposed (NKV, B, HD, S) layout — blocks (1, b_blk, HD, S) are
contiguous b_blk*128 KB runs — read 1047 GB/s vs 748 (r4 probe, trivial
compute). This harness runs the REAL kernel math (two-part softmax, MXU
dots, fused aliased column write) on both layouts in one process,
22-layer chains, interleaved windows.

Usage: python exps/bench_attn_layout.py [pairs] [S]

r4 CONCLUSIONS (all chip-measured with the on-device fori_loop):
  - pure-DMA floor for the 22-layer pool read: 0.176 ms (1047 GB/s,
    contiguous nbhs blocks) / 0.247 (bnhs).
  - ANY real-compute kernel floors at ~0.35 ms regardless of layout,
    b_blk (8 > 2 > 1), fused-write removal, exp removal, q-prescale, or
    phase-splitting (all dots first, one batched softmax, output dots) —
    the phased variant is bit-exact and NOT faster, so Mosaic already
    pipelines the per-b iterations; the ~0.5 us/(b,h) floor is the
    softmax instruction chain + MXU feed itself.
  - nbhs (contiguous) layout is worth ~+6% on the kernel (DMA slightly
    over compute on bnhs); not taken — cache-layout surgery across the
    decode/write/int8/paged stack for ~1.4% end-to-end.
  - int8 KV halves both the DMA and the VPU feed per context byte and is
    already the shipped answer where attention dominates (4k ctx +19%).
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

from accessory_tpu.ops import decode_attention as da

L, B, NKV, R, HD = 22, 8, 4, 8, 64
NEG_INF = -1e30


def _kernel_nbhs(lens_ref, pos_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref,
                 out_ref, outk_ref, outv_ref):
    """Transposed-pool variant of da._kernel_bloop_w: pools (NKV, B, HD, S),
    blocks (1, b_blk, HD, S) — contiguous HBM runs. q/kn/vn/out keep the
    (B, NKV, ...) layout."""
    Bb = q_ref.shape[0]
    base = pl.program_id(1) * Bb
    hd = q_ref.shape[3]
    scale = hd ** -0.5
    pos = pos_ref[0]
    tile0 = pl.multiple_of((pos // 128) * 128, 128)
    col = jax.lax.rem(pos, 128)
    prec = (jax.lax.Precision.HIGHEST if kc_ref.dtype == jnp.float32
            else None)
    for b in range(Bb):
        length = lens_ref[base + b]
        q = q_ref[b, 0]
        kc = kc_ref[0, b]
        vc = vc_ref[0, b]
        if _NODOT:
            s_old = (jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)
                     + jnp.sum(kc.astype(jnp.float32), axis=0,
                               keepdims=True)) * scale
        elif _SCALEQ:
            s_old = jax.lax.dot_general(
                (q.astype(jnp.float32) * scale).astype(q.dtype), kc,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        else:
            s_old = jax.lax.dot_general(
                q, kc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec) * scale
        mask = jax.lax.broadcasted_iota(jnp.int32, s_old.shape, 1) < length
        s_old = jnp.where(mask, s_old, NEG_INF)
        kn = kn_ref[b, 0, 0].astype(jnp.float32)
        vn = vn_ref[b, 0, 0].astype(jnp.float32)
        qf = q.astype(jnp.float32)
        s_new = jnp.sum(qf * kn[None, :], axis=1, keepdims=True) * scale
        m = jnp.maximum(jnp.max(s_old, axis=1, keepdims=True), s_new)
        if _NOEXP:
            p_old = jnp.abs(s_old - m)
            p_new = jnp.abs(s_new - m)
        else:
            p_old = jnp.exp(s_old - m)
            p_new = jnp.exp(s_new - m)
        denom = jnp.sum(p_old, axis=1, keepdims=True) + p_new
        if _NODOT:
            out = (jnp.sum(p_old, axis=1, keepdims=True)
                   + jnp.sum(vc.astype(jnp.float32), axis=1)[None, :])
        else:
            out = jax.lax.dot_general(
                p_old.astype(vc.dtype), vc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        out = out + p_new * vn[None, :]
        out_ref[b, 0] = (out / denom).astype(out_ref.dtype)
        wmask = jax.lax.broadcasted_iota(jnp.int32, (hd, 128), 1) == col
        oldk = kc_ref[0, b, :, pl.ds(tile0, 128)].astype(jnp.float32)
        oldv = vc_ref[0, b, :, pl.ds(tile0, 128)].astype(jnp.float32)
        outk_ref[0, b] = jnp.where(wmask, kn[:, None],
                                   oldk).astype(outk_ref.dtype)
        outv_ref[0, b] = jnp.where(wmask, vn[:, None],
                                   oldv).astype(outv_ref.dtype)


def _kernel_nbhs_phased(lens_ref, pos_ref, q_ref, kn_ref, vn_ref, kc_ref,
                        vc_ref, out_ref, outk_ref, outv_ref, s_scr):
    """Phase-split variant: all score dots first (scratch), ONE batched
    masked-softmax over (b_blk*R, S), then all output dots — lets the MXU
    dots of iteration b+1 overlap the VPU softmax of iteration b."""
    Bb = q_ref.shape[0]
    base = pl.program_id(1) * Bb
    hd = q_ref.shape[3]
    R = q_ref.shape[2]
    S = kc_ref.shape[3]
    scale = hd ** -0.5
    pos = pos_ref[0]
    tile0 = pl.multiple_of((pos // 128) * 128, 128)
    col = jax.lax.rem(pos, 128)
    prec = None
    # phase 1: scores
    for b in range(Bb):
        q = q_ref[b, 0]
        s_scr[b * R:(b + 1) * R, :] = jax.lax.dot_general(
            q, kc_ref[0, b], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec) * scale
    # phase 2: one batched masked softmax (rows grouped per b)
    lens_rows = jnp.concatenate(
        [jnp.full((R, 1), lens_ref[base + b], jnp.int32)
         for b in range(Bb)], axis=0)                       # (Bb*R, 1)
    sc = s_scr[:, :]
    mask = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1) < lens_rows
    sc = jnp.where(mask, sc, NEG_INF)
    kn_all = jnp.concatenate(
        [jnp.broadcast_to(kn_ref[b, 0, 0].astype(jnp.float32)[None],
                          (R, hd)) for b in range(Bb)], axis=0)
    q_all = jnp.concatenate([q_ref[b, 0] for b in range(Bb)],
                            axis=0).astype(jnp.float32)
    s_new = jnp.sum(q_all * kn_all, axis=1, keepdims=True) * scale
    m = jnp.maximum(jnp.max(sc, axis=1, keepdims=True), s_new)
    p_old = jnp.exp(sc - m)
    p_new = jnp.exp(s_new - m)
    denom = jnp.sum(p_old, axis=1, keepdims=True) + p_new
    pb = p_old.astype(kc_ref.dtype)
    s_scr[:, :] = pb.astype(jnp.float32)
    # phase 3: output dots + write
    for b in range(Bb):
        vc = vc_ref[0, b]
        out = jax.lax.dot_general(
            s_scr[b * R:(b + 1) * R, :].astype(vc.dtype), vc,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        vn = vn_ref[b, 0, 0].astype(jnp.float32)
        kn = kn_ref[b, 0, 0].astype(jnp.float32)
        out = out + p_new[b * R:(b + 1) * R] * vn[None, :]
        out_ref[b, 0] = (out / denom[b * R:(b + 1) * R]).astype(
            out_ref.dtype)
        wmask = jax.lax.broadcasted_iota(jnp.int32, (hd, 128), 1) == col
        oldk = kc_ref[0, b, :, pl.ds(tile0, 128)].astype(jnp.float32)
        oldv = vc_ref[0, b, :, pl.ds(tile0, 128)].astype(jnp.float32)
        outk_ref[0, b] = jnp.where(wmask, kn[:, None],
                                   oldk).astype(outk_ref.dtype)
        outv_ref[0, b] = jnp.where(wmask, vn[:, None],
                                   oldv).astype(outv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("b_blk",))
def attn_nbhs_phased(q, k_new, v_new, cache_k, cache_v, lengths, pos, b_blk):
    b, nkv, r, hd = q.shape
    S = cache_k.shape[3]
    head_q = lambda j, i, lens, p: (i, j, 0, 0)
    head_c = lambda j, i, lens, p: (j, i, 0, 0)
    tile = lambda j, i, lens, p: (j, i, 0, p[0] // 128)
    pool_shape = jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype)
    out, wk, wv = pl.pallas_call(
        _kernel_nbhs_phased,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nkv, b // b_blk),
            in_specs=[
                pl.BlockSpec((b_blk, 1, r, hd), head_q,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, hd), head_q,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, hd), head_q,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_blk, hd, S), head_c,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_blk, hd, S), head_c,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((b_blk, 1, r, hd), head_q,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_blk, hd, 128), tile,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_blk, hd, 128), tile,
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((b_blk * r, S), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, nkv, r, hd), q.dtype),
                   pool_shape, pool_shape],
        input_output_aliases={5: 1, 6: 2},
    )(lengths.astype(jnp.int32),
      jnp.reshape(jnp.asarray(pos, jnp.int32), (1,)),
      q, k_new, v_new, cache_k, cache_v)
    return out, wk, wv


@functools.partial(jax.jit, static_argnames=("b_blk", "write"))
def attn_nbhs(q, k_new, v_new, cache_k, cache_v, lengths, pos, b_blk,
              write=True):
    b, nkv, r, hd = q.shape
    S = cache_k.shape[3]
    head_q = lambda j, i, lens, p: (i, j, 0, 0)
    head_c = lambda j, i, lens, p: (j, i, 0, 0)
    tile = ((lambda j, i, lens, p: (j, i, 0, p[0] // 128)) if write
            else (lambda j, i, lens, p: (j, i, 0, 0)))
    pool_shape = jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype)
    tile_shape = jax.ShapeDtypeStruct((nkv, b, hd, 128), cache_k.dtype)
    out, wk, wv = pl.pallas_call(
        _kernel_nbhs,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nkv, b // b_blk),
            in_specs=[
                pl.BlockSpec((b_blk, 1, r, hd), head_q,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, hd), head_q,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_blk, 1, 1, hd), head_q,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_blk, hd, S), head_c,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_blk, hd, S), head_c,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((b_blk, 1, r, hd), head_q,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_blk, hd, 128), tile,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_blk, hd, 128), tile,
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, nkv, r, hd), q.dtype),
                   pool_shape if write else tile_shape,
                   pool_shape if write else tile_shape],
        input_output_aliases={5: 1, 6: 2} if write else {},
    )(lengths.astype(jnp.int32),
      jnp.reshape(jnp.asarray(pos, jnp.int32), (1,)),
      q, k_new, v_new, cache_k, cache_v)
    if not write:
        return out, cache_k, cache_v
    return out, wk, wv


import os
_NOEXP = os.environ.get("ATTN_NOEXP", "0") == "1"
_SCALEQ = os.environ.get("ATTN_SCALEQ", "0") == "1"
_NODOT = os.environ.get("ATTN_NODOT", "0") == "1"


def bench(layout, S, b_blk, reps=5, inner=25, outer=6):
    """One dispatch covers ``inner`` on-device steps (lax.fori_loop over
    the 22-layer chain) so relay dispatch overhead amortizes — the
    per-call harness measures the relay's dispatch rate, not the chip,
    whenever device time/step < dispatch latency (r4 finding)."""
    rng = np.random.RandomState(0)
    shape = (B, NKV, HD, S) if layout == "bnhs" else (NKV, B, HD, S)
    pools = [(jnp.asarray(rng.standard_normal(shape), jnp.bfloat16),
              jnp.asarray(rng.standard_normal(shape), jnp.bfloat16))
             for _ in range(L)]
    q0 = jnp.asarray(rng.standard_normal((B, NKV, R, HD)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, NKV, 1, HD)), jnp.bfloat16)
    lens = jnp.full((B,), S // 2, jnp.int32)
    if layout == "bnhs":
        fn = da._decode_attn_bloop_w
    elif layout == "nbhs_nw":
        fn = functools.partial(attn_nbhs, write=False)
    elif layout == "nbhs_ph":
        fn = attn_nbhs_phased
    else:
        fn = attn_nbhs

    def many(q, pools):
        flat = [p for kv in pools for p in kv]

        def body(i, carry):
            q, flat = carry
            pos = S // 2 + 1 + (i % (S // 2 - 2))
            new = []
            for li in range(L):
                ck, cv = flat[2 * li], flat[2 * li + 1]
                out, wk, wv = fn(q, kn, kn, ck, cv, lens, pos, b_blk)
                new += [wk, wv]
                q = (out * 1e-6 + q0).astype(q.dtype)
            return q, new

        q, flat = jax.lax.fori_loop(0, inner, body, (q, flat))
        return q, [(flat[2 * i], flat[2 * i + 1]) for i in range(L)]

    f = jax.jit(many, donate_argnums=(1,))
    q, pools = f(q0, pools)
    np.asarray(q).ravel()[0]
    ests = []
    for _ in range(reps):
        t0 = time.perf_counter()
        q, pools = f(q, pools)
        np.asarray(q).ravel()[0]
        t1 = time.perf_counter()
        for _ in range(outer):
            q, pools = f(q, pools)
        np.asarray(q).ravel()[0]
        t2 = time.perf_counter()
        ests.append(((t2 - t1) - (t1 - t0)) / ((outer - 1) * inner))
    return float(np.median(ests))


def parity(S=256):
    rng = np.random.RandomState(1)
    ck = rng.standard_normal((B, NKV, HD, S)).astype(np.float32)
    cv = rng.standard_normal((B, NKV, HD, S)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((B, NKV, R, HD)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, NKV, 1, HD)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((B, NKV, 1, HD)), jnp.bfloat16)
    lens = jnp.full((B,), S // 2, jnp.int32)
    pos = S // 2
    a = jnp.asarray(ck, jnp.bfloat16)
    o1, wk1, wv1 = da._decode_attn_bloop_w(
        q, kn, vn, a, jnp.asarray(cv, jnp.bfloat16), lens, pos, 8)
    o2, wk2, wv2 = attn_nbhs(
        q, kn, vn, jnp.asarray(ck.transpose(1, 0, 2, 3), jnp.bfloat16),
        jnp.asarray(cv.transpose(1, 0, 2, 3), jnp.bfloat16), lens, pos, 8)
    print("out max|d|:", float(jnp.max(jnp.abs(
        o1.astype(jnp.float32) - o2.astype(jnp.float32)))))
    print("wk max|d|:", float(jnp.max(jnp.abs(
        wk1.astype(jnp.float32)
        - wk2.transpose(1, 0, 2, 3).astype(jnp.float32)))))


if __name__ == "__main__":
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    parity(min(S, 256))
    bytes_read = L * 2 * B * NKV * HD * S * 2
    print(f"read floor @744: {bytes_read/744e9*1e3:.3f} ms"
          f" ({bytes_read/1e6:.0f} MB)")
    deltas = []
    for p in range(pairs):
        order = ("bnhs", "nbhs") if p % 2 == 0 else ("nbhs", "bnhs")
        res = {}
        for lay in order:
            res[lay] = bench(lay, S, b_blk=8 if S <= 1024 else 2, reps=1)
        d = res["bnhs"] / res["nbhs"] - 1
        deltas.append(d)
        print(f"pair {p}: bnhs {res['bnhs']*1e3:.3f} ms "
              f"({bytes_read/res['bnhs']/1e9:5.1f} GB/s)  nbhs "
              f"{res['nbhs']*1e3:.3f} ms ({bytes_read/res['nbhs']/1e9:5.1f}"
              f" GB/s)  speedup {d*100:+.1f}%", flush=True)
    print(f"median nbhs speedup: {np.median(deltas)*100:+.1f}%")
