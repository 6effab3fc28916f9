"""Paged decode: Pallas page-streaming kernel vs XLA dense-gather fallback,
fixed-batch DEVICE-time A/B at long context.

The serving Poisson benches can't show this difference — every dispatch
pays ~30 ms of relay fetch, so a few-hundred-us kernel delta vanishes in
wall-clock (r3 matrix: 55.3 vs 55.3 tok/s). This harness measures the
steady-state decode step itself: TinyLlama-class W4, bs8 slots all at
4k-token context (64 pages of 64), 100-step two-point fit.

The gather fallback materializes a dense (b, ctx, n_kv, hd) copy of every
slot's pages PER LAYER PER STEP (3x the context bytes: pool read + dense
write + attention read); the kernel streams pages once. Reference role:
the static-batch generate (meta.py:371-467) this engine replaces.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

B, CTX = 8, 4096
PS = int(os.environ.get("BENCH_PAGE_SIZE", "64"))


def main():
    import dataclasses

    import bench as Bm
    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama
    from accessory_tpu.quant.fuse import fuse_for_decode

    args = LLaMAArgs(dim=2048, n_layers=22, n_heads=32, n_kv_heads=4,
                     vocab_size=32000, multiple_of=256, max_seq_len=CTX,
                     dtype="bfloat16")
    params = llama.unstack_layers(fuse_for_decode(Bm._host_synthetic_w4(args)))

    pages_per_seq = CTX // PS
    # default "fp" pins bf16 pools for the A/B baseline (resolve_kv_dtype
    # would auto-pick int8 on TPU); BENCH_KV_DTYPE=int8 selects int8
    kv_dtype = os.environ.get("BENCH_KV_DTYPE") or "fp"
    pcache = llama.init_paged_cache(
        args, slots=B, total_pages=B * pages_per_seq + 1, page_size=PS,
        pages_per_seq=pages_per_seq, kv_dtype=kv_dtype)
    # fill to CTX-256: every step decodes deep into the pool
    pcache = dataclasses.replace(
        pcache, lengths=jnp.full((B,), CTX - 256, jnp.int32))
    tok = jnp.ones((B, 1), jnp.int32)

    # donate the cache: without it XLA must preserve the input pools and
    # the write kernel's aliasing degrades to a full 2x-pool copy per step
    # (the two 1.13 ms copies in the r3 trace)
    step = jax.jit(lambda p, t, c: llama.forward_paged(
        p, args, t, c, active_pages=pages_per_seq), donate_argnums=(2,))

    logits, pcache = step(params, tok, pcache)
    np.asarray(logits[0, 0, 0])

    def timed(n, c):
        t0 = time.perf_counter()
        for _ in range(n):
            logits, c = step(params, tok, c)
        np.asarray(logits[0, 0, 0])
        return time.perf_counter() - t0, c

    n1, n2 = 20, 120
    t1, pcache = timed(n1, pcache)
    t2, pcache = timed(n2, pcache)
    per_step = (t2 - t1) / (n2 - n1)
    mode = ("kernel" if os.environ.get("ACCESSORY_PAGED_KERNEL", "1") == "1"
            else "gather")
    print(json.dumps({
        "metric": f"paged decode 4k-ctx bs8 W4 ({mode}"
                  + (f", kv={kv_dtype}" if kv_dtype != "fp" else "") + ")",
        "value": round(B / per_step, 1), "unit": "tok/s",
        "ms_per_step": round(per_step * 1e3, 3),
        "vs_baseline": 0.0}), flush=True)


if __name__ == "__main__":
    main()
