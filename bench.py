"""Benchmark: W4A16 decode throughput of the flagship config on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

Model: TinyLlama-1.1B-class LLaMA (BASELINE.json config 1: dim 2048, 22
layers, GQA 32/4, vocab 32000), W4A16 group-128 weight-only quantized
(OmniQuant-format, the BASELINE.json centerpiece), batch-8 incremental decode
with a 1024-token KV cache through the fused dequant+matmul Pallas kernel.

``vs_baseline`` is the fraction of the HBM-bandwidth roofline achieved: the
reference publishes no tokens/s (SURVEY.md §6), so speed-of-light is the
comparator (north star ≥85%). roofline tok/s = HBM_BW / bytes_per_token,
where bytes_per_token sums every weight leaf's actual stored bytes (packed
4-bit + scales/zeros for quantized leaves, bf16 elsewhere) / batch + the KV
bytes each step reads. Timing uses host-fetch barriers with a two-point fit
(the relay's block_until_ready returns before execution completes).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: remote compiles through the relay cost minutes;
# cached reloads are seconds. TPU-only — CPU AOT entries bake in host CPU
# features and this container migrates between hosts (stale entries can
# SIGILL/SIGSEGV on load).
if (not os.environ.get("JAX_COMPILATION_CACHE_DIR")
        and os.environ.get("JAX_PLATFORMS", "").strip().lower() != "cpu"):
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

# v5e (TPU v5 lite): ~819 GB/s HBM bandwidth per chip (measured streaming
# ceiling on this chip: ~656 GB/s elementwise, ~744 GB/s read-reduce)
HBM_BW = 819e9

BATCH = 8
CACHE_LEN = 1024
STEPS = 100


def leaf_bytes(tree) -> int:
    from accessory_tpu.util.profiling import params_bytes

    return params_bytes(tree)


def _host_synthetic_w4(args, group_size=128):
    """Numpy-built params tree with random W4 leaves (same shapes/dtypes as
    quantize_params output; values irrelevant to throughput)."""
    import jax

    from accessory_tpu.models import llama
    from accessory_tpu.quant.qtensor import QuantizedWeight
    from accessory_tpu.quant.quantize import DEFAULT_BLOCKLIST, _path_str

    rng = np.random.RandomState(0)
    base = (rng.standard_normal(8191) * 0.02).astype(np.float32)
    shapes = jax.eval_shape(lambda: llama.init_params(jax.random.PRNGKey(0), args))

    quant_head = os.environ.get("BENCH_W4_HEAD", "0") == "1"

    def visit(path, s):
        name = _path_str(path)
        block = DEFAULT_BLOCKLIST if (quant_head and "output" in name) else (
            tuple(DEFAULT_BLOCKLIST) + ("output",))
        quantizable = (
            not any(b in name for b in block)
            and jnp.issubdtype(s.dtype, jnp.floating)
            and s.ndim in (2, 3) and s.shape[-2] % group_size == 0)
        if quantizable:
            from accessory_tpu.ops.quant_matmul_planes import choose_tile_k

            lead, (k, n) = s.shape[:-2], s.shape[-2:]
            packed = rng.randint(0, 2 ** 32, size=lead + (k // 8, n),
                                 dtype=np.uint32)
            scales = rng.uniform(1e-3, 2e-3, size=lead + (k // group_size, n)
                                 ).astype(np.float32)
            zeros = np.round(rng.uniform(0, 15, size=scales.shape)
                             ).astype(np.float32)
            # random packed words are a valid "planes" packing of (other)
            # random nibbles — build in the fast int8-staged kernel layout
            # directly (zeros slot holds the folded zeros*scales)
            from accessory_tpu.quant.qtensor import _scale_store_dtype

            sd = _scale_store_dtype(None)  # ACCESSORY_SCALES_DTYPE A/B
            return QuantizedWeight(
                packed=jnp.asarray(packed),
                scales=jnp.asarray(scales).astype(sd),
                zeros=jnp.asarray(zeros * scales).astype(sd), bits=4,
                group_size=group_size, in_dim=k, out_dim=n,
                layout="planes", tile_k=choose_tile_k(k, group_size))
        return jnp.asarray(np.resize(base, s.shape), dtype=s.dtype)

    import jax.tree_util as jtu

    return jtu.tree_map_with_path(visit, shapes)


def _probe_device(timeout_s: float = 300.0) -> bool:
    """Fail fast when the TPU relay is unreachable: jax.devices() and even
    tiny transfers hang FOREVER during relay outages (observed hours-long),
    which would hang the whole bench run. Probe with a tiny matmul + host
    fetch in a daemon thread; give up after ``timeout_s`` (first tiny
    compile through a healthy relay is ~10-40 s)."""
    import threading

    ok = []

    def _try():
        x = jnp.ones((8, 8), jnp.float32)
        ok.append(float(np.asarray((x @ x))[0, 0]))

    t = threading.Thread(target=_try, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main() -> None:
    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama

    if not _probe_device():
        print(json.dumps({
            "metric": "TinyLlama-1.1B W4A16 decode bs8",
            "value": 0.0, "unit": "tok/s", "vs_baseline": 0.0,
            "error": "TPU relay unreachable (device probe timed out); "
                     "see BENCHMARKS.md for last measured numbers",
            "last_measured_tok_s": [5779.1, 5831.33],
            "last_measured_vs_baseline": [0.8749, 0.8828],
            "last_measured_at": "2026-08-20 closing matrix + standalone"}),
            flush=True)
        return

    args = LLaMAArgs(dim=2048, n_layers=22, n_heads=32, n_kv_heads=4,
                     vocab_size=32000, multiple_of=256, max_seq_len=CACHE_LEN,
                     dtype="bfloat16")
    # host-side numpy init of synthetic W4 weights: on-device init/quantize
    # costs a dozen remote compiles through the relay (can exceed the
    # driver's timeout when the compile service is congested)
    params = _host_synthetic_w4(args)
    if os.environ.get("BENCH_FUSE", "1") == "1":
        from accessory_tpu.quant.fuse import fuse_for_decode
        params = fuse_for_decode(params)
    unstack = os.environ.get("BENCH_UNSTACK", "1") == "1"
    if unstack:
        params = llama.unstack_layers(params)
    # BENCH_KV_DTYPE=int8: quantized KV pools (int8 values + f32 per-token
    # scales) — halves KV read traffic, and the roofline denominator
    # shrinks with it (bytes actually touched). Chip A/B at 1024 ctx bs8:
    # int8 matches bf16 tok/s exactly (4952 both) — the kernel's scale
    # processing eats the saved stream at short context; int8 wins in the
    # KV-dominated 4k-ctx regime (bench_all --only kv8-longctx).
    # The headline stays bf16-KV ("fp" pins it: the engine's resolve_kv_dtype
    # would otherwise auto-pick int8 on TPU) so vs_baseline keeps the same
    # roofline basis across rounds; BENCH_KV_DTYPE=int8 is the A/B.
    kv_dtype = os.environ.get("BENCH_KV_DTYPE") or "fp"
    if kv_dtype in ("bf16", "fp"):
        kv_dtype = "fp"
    cache = llama.init_kv_cache(args, BATCH, max_len=CACHE_LEN,
                                stacked=not unstack, kv_dtype=kv_dtype)

    weight_bytes = leaf_bytes(params)
    kv_elt = 1 + 4 / args.head_dim if kv_dtype == "int8" else 2
    kv_bytes_per_tok = int(args.n_layers * CACHE_LEN * args.kv_heads
                           * args.head_dim * kv_elt * 2)
    roofline_tok_s = HBM_BW / (weight_bytes / BATCH + kv_bytes_per_tok)

    step = jax.jit(
        lambda p, t, c, pos: llama.forward(p, args, t, cache=c, cur_pos=pos),
        donate_argnums=(2,))

    tok = jnp.ones((BATCH, 1), jnp.int32)
    logits, cache = step(params, tok, cache, 512)
    _ = np.asarray(logits[0, 0, 0])  # host fetch = real barrier

    def timed(n_steps, cache):
        t0 = time.perf_counter()
        logits = None
        for i in range(n_steps):
            logits, cache = step(params, tok, cache, 512 + i)
        _ = np.asarray(logits[0, 0, 0])
        return time.perf_counter() - t0, cache

    # median of 5 two-point fits per SET, best of 3 sets spaced 10 s apart:
    # relay/compile-service congestion moves identical-config runs by
    # +-15% within minutes (r3 matrix: 4019-5542 tok/s on the same binary)
    # and whole multi-minute windows can sag ~20% (r5 close: 4300-4700
    # through two trees while the raw chip probe held 755-766 GB/s). The
    # within-set median rejects single-window jitter (and the two-point
    # fit's under-measurement mode, where a congested t1 window shrinks
    # t2-t1); congestion is otherwise one-sided slow, so the FASTEST
    # set-median is the chip's number, not the relay's mood. Sets cost
    # ~1.5 s each — the spacing, not the measuring, is the wall cost.
    n1, n2 = 20, STEPS + 20
    set_medians = []
    for s in range(3):
        if s:
            time.sleep(10.0)
        fits = []
        for _ in range(5):
            t1, cache = timed(n1, cache)
            t2, cache = timed(n2, cache)
            fits.append((t2 - t1) / (n2 - n1))
        set_medians.append(sorted(fits)[2])
    per_step = min(set_medians)

    tok_s = BATCH / per_step
    # vs_baseline uses the 819 GB/s spec bandwidth; the chip's measured
    # ceilings are ~656 GB/s elementwise (read+write) and ~744 GB/s
    # read-reduce. Decode is read-dominated (the only write is one token's
    # KV per step), so 744 GB/s is the relevant physical ceiling:
    # vs_measured_ceiling is the fraction of what any read-bound kernel
    # could do on this chip.
    MEASURED_BW = 744e9
    kv_tag = "int8-KV " if kv_dtype == "int8" else ""
    print(json.dumps({
        "metric": f"decode tokens/s/chip TinyLlama-1.1B W4A16 g128 {kv_tag}"
                  "bs8 (fused dequant+matmul Pallas)",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / roofline_tok_s, 4),
        "vs_measured_ceiling": round(
            tok_s / (roofline_tok_s * MEASURED_BW / HBM_BW), 4),
        "set_tok_s": [round(BATCH / m, 1) for m in set_medians],
    }))


if __name__ == "__main__":
    main()
