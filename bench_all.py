"""Extended benchmark suite over the BASELINE.json configs (one JSON line
per config; `bench.py` remains the driver's single headline line).

Configs (BASELINE.json):
  1. TinyLlama-1.1B W4A16 decode (same as bench.py)
  2. LLaMA2-7B W4A16 decode, single chip (bf16 7B = 13.5GB won't fit v5e
     HBM alongside cache — exactly the reference's quantization pitch)
  3. Mixtral-style MoE W4A16 top-2 decode (scaled to fit one chip: the full
     8x7B is 47B params = 23.5GB W4 > 16GB HBM; we bench a 4-expert variant
     with the same per-token compute shape and report it as such)
  5. SPHINX-class multimodal prefill (visual ensemble + LLM prefill)

Run: PYTHONPATH=/root/repo python bench_all.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

HBM_BW = 819e9


def fetch(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def timed_steps(step, params, tok, cache, n1=20, n2=100, pos0=512):
    """Per-step seconds: best of 3 sets of median-of-3 two-point fits.

    Relay/compile-service congestion sags whole multi-minute windows by
    ~20% (the r5 closing matrix's cold-window rows; bench.py has the
    full story). Congestion is one-sided slow, so the fastest set-median
    is the chip's number; the within-set median rejects the two-point
    fit's under-measurement mode (a congested t1 window shrinks t2-t1)."""
    logits, cache = step(params, tok, cache, pos0)
    fetch(logits)

    def run(n, cache):
        t0 = time.perf_counter()
        logits = None
        for i in range(n):
            logits, cache = step(params, tok, cache, pos0 + i)
        fetch(logits)
        return time.perf_counter() - t0, cache

    set_medians = []
    for s in range(3):
        if s:
            time.sleep(5.0)
        fits = []
        for _ in range(3):
            t1, cache = run(n1, cache)
            t2, cache = run(n2 + n1, cache)
            fits.append((t2 - t1) / n2)
        set_medians.append(sorted(fits)[1])
    return min(set_medians)


def weight_bytes(tree):
    from accessory_tpu.util.profiling import params_bytes

    return params_bytes(tree)


def random_qweight(key, shape, group_size=128, stacked=True):
    """Synthetic W4 weight with random packed data — avoids materializing
    the full bf16 tensor (a 7B bf16 init + quantize OOMs the 16GB chip).
    Built directly in the int8-staged "planes" kernel layout (random words
    are a valid planes packing of random nibbles; zeros = folded z*s)."""
    from accessory_tpu.ops.quant_matmul_planes import choose_tile_k
    from accessory_tpu.quant.qtensor import QuantizedWeight, _scale_store_dtype

    *lead, k, n = shape
    k = k + ((-k) % 1024 if k >= 1024 else (-k) % group_size)  # kernel pad
    ks = jax.random.split(key, 3)
    packed = jax.random.bits(ks[0], (*lead, k // 8, n), jnp.uint32)
    sd = _scale_store_dtype(None)  # ACCESSORY_SCALES_DTYPE A/B
    scales = jax.random.uniform(ks[1], (*lead, k // group_size, n),
                                jnp.float32, 1e-3, 2e-3).astype(sd)
    zeros = jnp.round(jax.random.uniform(ks[2], (*lead, k // group_size, n),
                                         jnp.float32, 0, 15)).astype(sd)
    return QuantizedWeight(packed=packed, scales=scales, zeros=zeros * scales,
                           bits=4, group_size=group_size, in_dim=k, out_dim=n,
                           layout="planes", tile_k=choose_tile_k(k, group_size))


def synthetic_quantized_params(init_fn, key, group_size=128):
    """Build the params tree directly from SHAPES, creating synthetic W4
    leaves in place of eligible weights — peak memory stays at the quantized
    footprint (never materializes the dense bf16 model)."""
    from accessory_tpu.quant.quantize import DEFAULT_BLOCKLIST, _path_str

    shapes = jax.eval_shape(init_fn)

    def visit(path, s):
        name = _path_str(path)
        kk = jax.random.fold_in(key, hash(name) % (1 << 30))
        quantizable = (
            not any(b in name for b in tuple(DEFAULT_BLOCKLIST)
                    + ("output", "lora", "bias"))
            and jnp.issubdtype(s.dtype, jnp.floating)
            and ((s.ndim == 3 and s.shape[1] % group_size == 0)
                 or (s.ndim == 4 and s.shape[2] % group_size == 0)))
        if quantizable:
            return random_qweight(kk, s.shape, group_size)
        return (jax.random.normal(kk, s.shape, jnp.float32) * 0.02).astype(s.dtype)

    return jax.tree_util.tree_map_with_path(visit, shapes)


def bench_llama_decode(name, args_kw, batch=8, cache_len=1024,
                       kv_dtype="fp"):
    # "fp" pins bf16 pools (resolve_kv_dtype would auto-pick int8 on TPU);
    # the explicit kv_dtype="int8" rows are the A/B against it.
    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama

    args = LLaMAArgs(max_seq_len=cache_len, dtype="bfloat16", **args_kw)
    params = synthetic_quantized_params(
        lambda: llama.init_params(jax.random.PRNGKey(0), args),
        jax.random.PRNGKey(0))
    # decode-optimized layout: fused wqkv/w13 + trace-time-unrolled layer
    # loop over per-layer buffers (BENCHMARKS.md: the scan-slice copy).
    # Sequential rebinds keep peak HBM at 2x weights, not 3x (each transform
    # copies; the old tree frees when its last reference drops).
    from accessory_tpu.quant.fuse import fuse_for_decode

    params = fuse_for_decode(params)
    params = llama.unstack_layers(params)
    cache = llama.init_kv_cache(args, batch, max_len=cache_len,
                                stacked=False, kv_dtype=kv_dtype)
    step = jax.jit(lambda p, t, c, pos: llama.forward(
        p, args, t, cache=c, cur_pos=pos), donate_argnums=(2,))
    dt = timed_steps(step, params, jnp.ones((batch, 1), jnp.int32), cache)
    wb = weight_bytes(params)
    # KV bytes actually touched per step (read ctx + write 1): int8 pools
    # halve them (plus one f32 scale per head-vector)
    kv_elt = 1 + 4 / args.head_dim if kv_dtype == "int8" else 2
    kv = int(args.n_layers * cache_len * args.kv_heads * args.head_dim
             * kv_elt * 2)
    roof = HBM_BW / (wb / batch + kv)
    tag = " kv-int8" if kv_dtype == "int8" else ""
    print(json.dumps({
        "metric": f"decode tok/s/chip {name} W4A16{tag} bs{batch}",
        "value": round(batch / dt, 1), "unit": "tok/s",
        "vs_baseline": round(batch / dt / roof, 4)}), flush=True)


def bench_moe_decode(batch=8, cache_len=512):
    from accessory_tpu.config import MixtralArgs
    from accessory_tpu.models import mixtral
    from accessory_tpu.quant import DEFAULT_BLOCKLIST, quantize_params

    args = MixtralArgs(dim=4096, n_layers=8, n_heads=32, n_kv_heads=8,
                       hidden_dim=14336, vocab_size=32000, num_experts=4,
                       num_experts_per_tok=2, max_seq_len=cache_len,
                       dtype="bfloat16")
    params = synthetic_quantized_params(
        lambda: mixtral.init_params(jax.random.PRNGKey(0), args),
        jax.random.PRNGKey(0))
    # unrolled decode loop (unstack_layers is model-agnostic tree surgery)
    from accessory_tpu.models.llama import unstack_layers

    params = unstack_layers(params)
    cache = mixtral.init_kv_cache(args, batch, max_len=cache_len,
                                  stacked=False)
    step = jax.jit(lambda p, t, c, pos: mixtral.forward(
        p, args, t, cache=c, cur_pos=pos, moe_impl="ragged"),
        donate_argnums=(2,))
    dt = timed_steps(step, params, jnp.ones((batch, 1), jnp.int32), cache,
                     n1=10, n2=50, pos0=256)
    wb = weight_bytes(params)
    kv = args.n_layers * cache_len * args.kv_heads * args.head_dim * 4
    # top-2/4 experts: only half the expert bytes are touched per token
    print(json.dumps({
        "metric": "decode tok/s/chip MoE-4x7Bclass W4A16 top2 bs8",
        "value": round(batch / dt, 1), "unit": "tok/s",
        "vs_baseline": round(batch / dt / (HBM_BW / (wb / batch + kv)), 4)}),
        flush=True)


def bench_sphinx_prefill():
    from accessory_tpu.config import SphinxArgs
    from accessory_tpu.models import sphinx

    args = SphinxArgs(dim=2048, n_layers=22, n_heads=32, n_kv_heads=4,
                      vocab_size=32000, multiple_of=256, max_seq_len=1024,
                      dtype="bfloat16", visual="ens_light",
                      convnext_depths=(3, 3, 27, 3),
                      convnext_dims=(256, 512, 1024, 2048),
                      dino_width=1024, dino_layers=12, dino_heads=16)
    params = sphinx.init_params(jax.random.PRNGKey(0), args)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 224, 224),
                             jnp.float32)
    toks = jnp.ones((4, 64), jnp.int32)
    fwd = jax.jit(lambda p, t, im: sphinx.forward(p, args, t, images=im)[0])
    out = fwd(params, toks, imgs)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fwd(params, toks, imgs)
    fetch(out)
    dt = (time.perf_counter() - t0) / 10
    print(json.dumps({
        "metric": "SPHINX-class multimodal prefill (4 imgs + 64 toks)",
        "value": round(dt * 1e3, 1), "unit": "ms",
        "vs_baseline": 0.0}), flush=True)


def bench_prefill_ttft(batch=1, prompt_len=2048):
    """Time-to-first-token: one full prefill of the flagship config
    (BASELINE metric: p50 TTFT)."""
    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama

    args = LLaMAArgs(dim=2048, n_layers=22, n_heads=32, n_kv_heads=4,
                     vocab_size=32000, multiple_of=256, max_seq_len=prompt_len,
                     dtype="bfloat16")
    params = synthetic_quantized_params(
        lambda: llama.init_params(jax.random.PRNGKey(0), args),
        jax.random.PRNGKey(0))
    toks = jnp.ones((batch, prompt_len), jnp.int32)
    # donate + reuse the pool across calls — serving pre-allocates pools
    # (engine/kvcache.py) and a full prefill at cur_pos=0 overwrites every
    # position it reads, so per-call re-init measured ~28 ms of pure
    # alloc/zero overhead on top of the 45 ms device prefill (r4 trace)
    fwd = jax.jit(lambda p, t, c: llama.forward(p, args, t, cache=c,
                                                cur_pos=0),
                  donate_argnums=(2,))
    cache = llama.init_kv_cache(args, batch, max_len=prompt_len)

    def once(cache):
        logits, cache = fwd(params, toks, cache)
        fetch(logits)
        return cache

    cache = once(cache)  # compile
    t0 = time.perf_counter()
    for _ in range(5):
        cache = once(cache)
    dt = (time.perf_counter() - t0) / 5
    print(json.dumps({
        "metric": f"TTFT TinyLlama-1.1B W4A16 prefill {prompt_len} toks",
        "value": round(dt * 1e3, 1), "unit": "ms",
        "vs_baseline": round(batch * prompt_len / dt, 1)}), flush=True)


PEAK_FLOPS = 197e12  # v5e spec bf16 (measured asymptote 183 = 93%)


def bench_70b_projection(batch=8, cache_len=1024, dim=8192, n_heads=64,
                         multiple_of=4096, vocab=32000, n1=10, n2=50):
    """LLaMA2-70B W4A16 decode, projected from measured 70B-shaped layers
    (BASELINE north star names 70B; the full model is 34 GB W4 — a v5p/
    multi-chip footprint — so we measure REAL 70B layers (dim 8192, GQA
    8 kv heads, ffn 28672) at L=4 and L=8 on this chip and fit
    t(L) = t0 + L*dt: per-layer time is exact, head/embed/dispatch
    overhead lands in t0, and t(80) is the single-chip-equivalent step
    time. vs_baseline is the same HBM roofline used for the other decode
    benches, scaled to the full 80-layer weight+KV footprint."""
    import dataclasses

    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama
    from accessory_tpu.quant.fuse import fuse_for_decode

    # 12 layers (~5.8 GB W4) is the largest base that leaves room for the
    # duplicate tree while fuse_for_decode runs (16 OOM'd on chip: fuse
    # concatenates the quantized leaves into fresh arrays)
    args8 = LLaMAArgs(dim=dim, n_layers=12, n_heads=n_heads, n_kv_heads=8,
                      vocab_size=vocab, multiple_of=multiple_of,
                      ffn_dim_multiplier=1.3, max_seq_len=cache_len,
                      dtype="bfloat16")
    params = synthetic_quantized_params(
        lambda: llama.init_params(jax.random.PRNGKey(0), args8),
        jax.random.PRNGKey(0))
    params = llama.unstack_layers(fuse_for_decode(params))
    tok = jnp.ones((batch, 1), jnp.int32)

    # L=4..12: the fit quality (R^2, residuals) and the 2-point-vs-3-point
    # t(80) band bound the extrapolation error (VERDICT r2 weak #6).
    Ls = (4, 8, 12)
    times = {}
    for L in Ls:
        if L > args8.n_layers:
            continue
        argsL = dataclasses.replace(args8, n_layers=L)
        pL = dict(params, layers=params["layers"][:L])
        cache = llama.init_kv_cache(argsL, batch, max_len=cache_len,
                                    stacked=False)
        step = jax.jit(lambda p, t, c, pos, a=argsL: llama.forward(
            p, a, t, cache=c, cur_pos=pos), donate_argnums=(2,))
        times[L] = timed_steps(step, pL, tok, cache, n1=n1, n2=n2)

    ls = np.array(sorted(times), np.float64)
    ts = np.array([times[int(l)] for l in ls])
    dt_layer, t0 = np.polyfit(ls, ts, 1)
    pred = t0 + dt_layer * ls
    ss_res = float(np.sum((ts - pred) ** 2))
    ss_tot = float(np.sum((ts - ts.mean()) ** 2))
    r2 = 1.0 - ss_res / max(ss_tot, 1e-30)
    t80 = t0 + 80 * dt_layer
    # 2-point fit (the round-2 method) for the extrapolation band
    dt2 = (times[8] - times[4]) / 4
    t80_2pt = times[4] + 76 * dt2
    layer_bytes = weight_bytes(params["layers"][0])
    other_bytes = weight_bytes(
        {k: v for k, v in params.items() if k != "layers"})
    kv = int(80 * cache_len * 8 * args8.head_dim * 2 * 2)  # 8 kv heads, bf16
    roof = HBM_BW / ((80 * layer_bytes + other_bytes) / batch + kv)
    print(json.dumps({
        "metric": f"decode tok/s/chip LLaMA2-70B W4A16 bs{batch} "
                  "(projected from measured 70B layers)",
        "value": round(batch / t80, 1), "unit": "tok/s",
        "vs_baseline": round(batch / t80 / roof, 4),
        "ms_per_layer": round(dt_layer * 1e3, 3),
        "fit_r2": round(r2, 6),
        "fit_points_ms": {int(l): round(times[int(l)] * 1e3, 2)
                          for l in ls},
        "fit_residuals_us": [round((t - p) * 1e6, 1)
                             for t, p in zip(ts, pred)],
        "t80_ms": round(t80 * 1e3, 2),
        "t80_2pt_ms": round(t80_2pt * 1e3, 2),
        "extrapolation_band_pct": round(
            abs(t80 - t80_2pt) / t80 * 100, 2)}), flush=True)


def _matmul_param_count(tree):
    """Matmul-visited parameter count (embedding lookup excluded, lm head
    included) — the N in the 6N-flops-per-token convention."""
    from accessory_tpu.quant.qtensor import QuantizedWeight

    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            tree, is_leaf=lambda x: isinstance(x, QuantizedWeight))[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if "tok_embeddings" in name or "norm" in name:
            continue
        if isinstance(leaf, QuantizedWeight):
            total += int(np.prod(leaf.packed.shape[:-2], initial=1)) \
                * leaf.in_dim * leaf.out_dim
        elif getattr(leaf, "ndim", 0) >= 2:
            total += int(np.prod(leaf.shape))
    return total


def bench_train_step(name, args_kw, batch, seq_len, qpeft=False, n1=3,
                     n2=10, remat=True):
    """Training-step throughput + MFU (the reference's headline finetune
    numbers are GPU-hours for exactly these two regimes: full finetune and
    quantized-base PEFT, docs/finetune/quantization.md:41-46).

    qpeft=False: bf16 model promoted to fp32 masters, AdamW on everything
    (main_finetune full mode). qpeft=True: frozen W4 base + LoRA/bias/norm
    trainable (NormBiasLoRA over Linear4bit, reference quant.py+peft.py).
    MFU uses model flops (6N full / 4N qpeft — no dW for frozen weights,
    plus causal-attention flops); hw_util adds remat recompute.
    """
    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama
    from accessory_tpu.train import (
        TrainState, make_optimizer, make_train_step)
    from accessory_tpu.train.precision import promote_trainable_params_to_fp32

    args = LLaMAArgs(max_seq_len=seq_len, dtype="bfloat16", **args_kw)
    if qpeft:
        params = synthetic_quantized_params(
            lambda: llama.init_params(jax.random.PRNGKey(0), args),
            jax.random.PRNGKey(0))
        trainable = llama.get_trainable_params_filter(args)
    else:
        params = llama.init_params(jax.random.PRNGKey(0), args)
        trainable = None
    if os.environ.get("ACCESSORY_TRAIN_UNROLL", "1") == "1":
        # unrolled layer loop (r4): the layer scan's activation saves and
        # dW accumulators full-copy their stacked buffers every iteration
        # (trace: 26+ ms/step of bitcast_dynamic-update-slice fusions at
        # 700M scale) — per-layer buffers remove it: 22.5k -> 24.6k tok/s,
        # MFU 0.47 -> 0.51. Scan stays the library default (O(1) compile
        # in depth for big L); the bench measures the fast layout.
        params = llama.unstack_layers(params)
    params = promote_trainable_params_to_fp32(params, trainable)
    tx = make_optimizer(params, 1e-4, weight_decay=0.02, clip_norm=2.0,
                        trainable=trainable)
    state = TrainState.create(params, tx)
    step_fn = jax.jit(make_train_step(llama, args, tx, remat=remat),
                      donate_argnums=(0,))

    rng = np.random.RandomState(0)
    batch_data = {
        "examples": jnp.asarray(rng.randint(3, 32000, (batch, seq_len)),
                                jnp.int32),
        "labels": jnp.asarray(rng.randint(3, 32000, (batch, seq_len)),
                              jnp.int32)}
    state, metrics = step_fn(state, batch_data)  # compile
    fetch(metrics["loss"])

    def run(n, state):
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step_fn(state, batch_data)
        fetch(metrics["loss"])
        return time.perf_counter() - t0, state

    t1, state = run(n1, state)
    t2, state = run(n1 + n2, state)
    dt = (t2 - t1) / n2
    tok_s = batch * seq_len / dt

    P = _matmul_param_count(params)
    d_attn = args.n_heads * (args.dim // args.n_heads)
    attn_fwd = 2 * seq_len * d_attn * args.n_layers  # causal avg S/2
    if qpeft:
        model_tok = 4 * P + 3 * attn_fwd  # no dW for the frozen base
        hw_tok = 6 * P + 4 * attn_fwd     # + remat forward recompute
    else:
        model_tok = 6 * P + 3 * attn_fwd
        hw_tok = 8 * P + 4 * attn_fwd
    print(json.dumps({
        "metric": f"train step {name} bs{batch}x{seq_len}"
                  + (" QPEFT-W4" if qpeft else " full-finetune"),
        "value": round(tok_s, 1), "unit": "tok/s",
        "vs_baseline": round(model_tok * tok_s / PEAK_FLOPS, 4),
        "model_tflops": round(model_tok * tok_s / 1e12, 1),
        "hw_util": round(hw_tok * tok_s / PEAK_FLOPS, 4)}), flush=True)


def bench_dit_train(dim=1024, n_layers=24, n_heads=16, batch=32,
                    input_size=32, n1=3, n2=10, remat="full"):
    """Large-DiT training-step throughput (the reference sub-project's
    headline metric is training speed, Large-DiT-ImageNet/train.py).
    DiT-L/2-class latent-space step: fp32 AdamW + EMA + VLB loss + remat.
    Reports imgs/s and MFU (6N x tokens model-flops convention)."""
    from accessory_tpu.dit.diffusion import GaussianDiffusion
    from accessory_tpu.dit.model import DiTArgs, init_dit
    from accessory_tpu.dit.train import make_dit_train_step
    from accessory_tpu.train import TrainState, make_optimizer

    args_d = DiTArgs(dim=dim, n_layers=n_layers, n_heads=n_heads,
                     input_size=input_size, num_classes=1000)
    params = init_dit(jax.random.PRNGKey(0), args_d)
    diffusion = GaussianDiffusion()
    tx = make_optimizer(params, 1e-4, weight_decay=0.0, clip_norm=1.0)
    state = TrainState.create(params, tx)
    ema = jax.tree.map(jnp.copy, params)
    step = jax.jit(make_dit_train_step(args_d, diffusion, tx, remat=remat),
                   donate_argnums=(0, 1))

    rng = np.random.RandomState(0)
    latents = jnp.asarray(rng.standard_normal(
        (batch, args_d.in_channels, input_size, input_size)), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 1000, (batch,)), jnp.int32)
    key = jax.random.PRNGKey(1)
    state, ema, metrics, key = step(state, ema, latents, labels, key)
    fetch(metrics["loss"])

    def run(n, state, ema, key):
        t0 = time.perf_counter()
        for _ in range(n):
            state, ema, metrics, key = step(state, ema, latents, labels, key)
        fetch(metrics["loss"])
        return time.perf_counter() - t0, state, ema, key

    t1, state, ema, key = run(n1, state, ema, key)
    t2, state, ema, key = run(n1 + n2, state, ema, key)
    dt = (t2 - t1) / n2

    P = _matmul_param_count(params)
    tokens = (input_size // args_d.patch_size) ** 2
    # bidirectional attention, full S per query: fwd = 4*T^2*D per layer
    attn_fwd_img = 4 * tokens * tokens * dim * n_layers
    model_flops = (6 * P * tokens + 3 * attn_fwd_img) * batch
    print(json.dumps({
        "metric": f"DiT-L/2-class train step bs{batch} (fp32+EMA+VLB)",
        "value": round(batch / dt, 2), "unit": "imgs/s",
        "vs_baseline": round(model_flops / dt / PEAK_FLOPS, 4)}),
        flush=True)


def bench_scheduler(slots=8, n_requests=16, rate=1.0, prompt_len=128,
                    gen_len=64, page_size=64, decode_steps=8,
                    prefix_cache=False, spec_lookup=0, shared_prefix=0,
                    max_seq_len=512, tag="", sweep_rates=None,
                    trace_device=False):
    """Continuous-batching serving benchmark: Poisson arrivals into the
    scheduler; reports p50 TTFT and aggregate generated tok/s (the serving
    role of reference multi_gpu_wrapper.py:143-321).

    rate (req/s) is set near the sustainable service rate — an
    oversaturated queue measures queueing delay, not the scheduler. NOTE:
    in this environment every decode step pays a ~30 ms host fetch through
    the axon relay, which bounds per-slot step latency; a co-located host
    runs the same loop at the ~2 ms device step time."""
    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.engine.scheduler import ContinuousBatcher
    from accessory_tpu.models import llama

    class _Tok:
        """Synthetic tokenizer: maps any prompt to a fixed-length id list."""
        eos_id = 2
        n_words = 32000

        def encode(self, s, bos=True, eos=False):
            rng = np.random.RandomState(abs(hash(s)) % (1 << 31))
            toks = [1] + list(rng.randint(3, 32000, prompt_len - 1))
            if shared_prefix:
                # shared system-prompt prefix (the prefix-cache workload)
                srng = np.random.RandomState(1234)
                toks[:shared_prefix] = list(
                    srng.randint(3, 32000, shared_prefix))
            return toks

        def encode_segment(self, s):
            return [3]

        def encode_wo_prefix_space(self, s):
            return [3]

        def decode(self, ids):
            return " ".join(map(str, ids))

    args = LLaMAArgs(dim=2048, n_layers=22, n_heads=32, n_kv_heads=4,
                     vocab_size=32000, multiple_of=256,
                     max_seq_len=max_seq_len, dtype="bfloat16")
    params = synthetic_quantized_params(
        lambda: llama.init_params(jax.random.PRNGKey(0), args),
        jax.random.PRNGKey(0))
    cb = ContinuousBatcher(llama, args, params, _Tok(), slots=slots,
                           page_size=page_size, decode_steps=decode_steps,
                           prefix_cache=prefix_cache,
                           spec_lookup=spec_lookup,
                           prefill_chunk=None)

    # warm the compile caches before timing: the scheduler pads admission
    # groups to powers of two, so warm each pow2 group size + decode (a
    # server does this once at startup; remote compiles are tens of seconds)
    n = 1
    while n <= slots:
        # full gen_len on the last (all-slots) round: decode runs with
        # pow2-bucketed ACTIVE page counts that grow with generated length
        # — 2-token warmups never reach the deeper buckets, so a fresh
        # compile landed mid-Poisson-run (r3 sweep: 34 s p50 at rate 8)
        gl = gen_len if n == slots else 2
        for i in range(n):
            cb.add_request(f"warmup{n}-{i}", max_gen_len=gl)
        while cb.pending or any(r is not None for r in cb.active.values()):
            cb.step()
        n *= 2
    if prefix_cache:
        # second pass: the first pass populated the prefix cache, so every
        # timed admission takes the prefix-HIT path (suffix continuation
        # prefill) — a different compiled shape per pow2 group size. The
        # pass-1 gp=1 group ran COLD, so without this the first solo timed
        # arrival mints a fresh remote compile (tens of seconds) that
        # backlogs the whole Poisson run (r3 matrix: p50 TTFT 9.4 s).
        n = 1
        while n <= slots:
            for i in range(n):
                cb.add_request(f"warmup{n}-{i}", max_gen_len=2)
            while cb.pending or any(r is not None
                                    for r in cb.active.values()):
                cb.step()
            n *= 2
    cb.finished.clear()

    def run_poisson(rate, n_requests, seed=0):
        rng = np.random.RandomState(seed)
        arrivals = np.cumsum(rng.exponential(1.0 / rate, n_requests))
        t0 = time.perf_counter()
        submitted = 0
        ttft = {}
        first_seen = {}
        while submitted < n_requests or cb.pending or \
                any(r is not None for r in cb.active.values()):
            now = time.perf_counter() - t0
            while submitted < n_requests and arrivals[submitted] <= now:
                uid = cb.add_request(f"req{seed}-{submitted}",
                                     max_gen_len=gen_len)
                ttft[uid] = arrivals[submitted]
                submitted += 1
            cb.step()
            now = time.perf_counter() - t0
            for s, r in cb.active.items():
                if r is not None and r.uid not in first_seen:
                    first_seen[r.uid] = now
            for r in cb.finished:
                if r.uid not in first_seen:
                    first_seen[r.uid] = now
        total = time.perf_counter() - t0
        n_generated = sum(len(r.output_tokens) for r in cb.finished)
        run_poisson.last = {"n_generated": n_generated, "total": total}
        cb.finished.clear()
        ttfts = sorted(first_seen[u] - ttft[u]
                       for u in ttft if u in first_seen)
        p50 = ttfts[len(ttfts) // 2] if ttfts else 0.0
        p99 = ttfts[min(len(ttfts) - 1,
                        int(len(ttfts) * 0.99))] if ttfts else 0.0
        return n_generated / total, p50, p99

    if sweep_rates:
        # saturation sweep: ramp offered load until completion throughput
        # flattens — the knee is the sustainable service rate (the number
        # the single Poisson-point benches can't show). Completion tok/s
        # at the knee also bounds what the relay's ~30 ms/dispatch allows.
        rows = []
        for r_ in sweep_rates:
            agg, p50, p99 = run_poisson(r_, n_requests, seed=int(r_ * 10))
            rows.append({"rate_req_s": r_, "agg_tok_s": round(agg, 1),
                         "p50_ttft_ms": round(p50 * 1e3, 1),
                         "p99_ttft_ms": round(p99 * 1e3, 1)})
            print(json.dumps({"sweep_point": rows[-1]}), flush=True)
        best = max(rows, key=lambda x: x["agg_tok_s"])
        # knee = lowest rate achieving >= 95% of the peak throughput
        knee = next(x for x in rows
                    if x["agg_tok_s"] >= 0.95 * best["agg_tok_s"])
        print(json.dumps({
            "metric": f"scheduler saturation TinyLlama W4 {slots} slots"
                      + (f" {tag}" if tag else ""),
            "value": best["agg_tok_s"], "unit": "tok/s",
            "knee_rate_req_s": knee["rate_req_s"],
            "knee_p50_ttft_ms": knee["p50_ttft_ms"],
            "knee_p99_ttft_ms": knee["p99_ttft_ms"],
            "sweep": rows, "vs_baseline": 0.0}), flush=True)
        return

    if trace_device:
        # device-span vs wall-span split (VERDICT r4 #5): the whole Poisson
        # run is traced; the "XLA Ops" lane's busy time is what the chip
        # actually worked — tokens/busy_s is the device-bound aggregate a
        # co-located host would see, wall - busy is host+relay overhead.
        import tempfile

        from accessory_tpu.util.profiling import device_busy_from_trace

        logdir = tempfile.mkdtemp(prefix="sched_trace_")
        jax.profiler.start_trace(logdir)
        try:
            agg, p50, _ = run_poisson(rate, n_requests)
        finally:
            jax.profiler.stop_trace()
        d = device_busy_from_trace(logdir)
        # run_poisson's OWN span/token-count (the wrapper's wall would
        # include the multi-second trace-file finalize)
        n_gen = run_poisson.last["n_generated"]
        wall = run_poisson.last["total"]
        dev_agg = n_gen / max(d["busy_s"], 1e-9)
        print(json.dumps({
            "metric": f"scheduler device-bound agg TinyLlama W4 {slots} "
                      f"slots decode_steps={decode_steps}"
                      + (f" {tag}" if tag else ""),
            "value": round(dev_agg, 1), "unit": "tok/s",
            "wall_agg_tok_s": round(agg, 1),
            "p50_ttft_ms": round(p50 * 1e3, 1),
            "device_busy_s": round(d["busy_s"], 2),
            "wall_s": round(wall, 2),
            "device_busy_frac": round(d["busy_s"] / wall, 3),
            "vs_baseline": 0.0}), flush=True)
        return

    agg, p50, _ = run_poisson(rate, n_requests)
    extra = {}
    if prefix_cache:
        extra["prefix_hit_pages"] = cb.prefix_hits
    if spec_lookup:
        # NOTE: with random weights + random prompts the model cannot
        # copy patterns, so lookup acceptance ~0 — this point measures
        # the verify-path overhead, not speculation gains
        extra["spec_tok_per_dispatch"] = round(
            (cb.spec_accepted + cb.spec_steps) / max(1, cb.spec_steps), 2)
    print(json.dumps({
        "metric": f"scheduler serving TinyLlama W4 {slots} slots Poisson"
                  + (f" {tag}" if tag else ""),
        "value": round(agg, 1), "unit": "tok/s",
        "p50_ttft_ms": round(p50 * 1e3, 1),
        "vs_baseline": 0.0, **extra}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    choices=[None, "tiny", "7b", "moe", "sphinx", "ttft",
                             "sched", "longctx", "kv8", "kv8-longctx",
                             "7b-kv8",
                             "sched-pc", "sched-spec", "sched-long",
                             "sched-sweep", "sched-nsteps", "train",
                             "train-qpeft", "70b", "dit"])
    a = ap.parse_args()
    if a.only == "sched":
        bench_scheduler()
    if a.only == "sched-sweep":
        # saturation: ramp offered load to the knee (VERDICT r2 missing #3).
        # 48 requests per point so the queue reaches steady state; r3 chip
        # run was still un-saturated at 16 req/s (746 tok/s, p50 275 ms),
        # so the ramp extends to 64
        bench_scheduler(n_requests=48,
                        sweep_rates=[2.0, 4.0, 8.0, 16.0, 32.0, 64.0])
    if a.only == "sched-nsteps":
        # deep saturation (rate past the r4 knee) with the multi-step decode
        # knob swept 8 -> 32, each run traced so the device-bound aggregate
        # (tokens / device-busy-s) is reported next to the wall number —
        # the figure a co-located production host would see (VERDICT r4 #5)
        for n in (8, 16, 32):
            bench_scheduler(n_requests=48, rate=64.0, decode_steps=n,
                            trace_device=True, tag="deep-saturation")
    if a.only == "sched-pc":
        # shared 64-token prefix across requests: measures prompt caching
        bench_scheduler(prefix_cache=True, shared_prefix=64,
                        tag="prefix-cache")
    if a.only == "sched-spec":
        bench_scheduler(spec_lookup=4, decode_steps=1, tag="spec-lookup")
    if a.only == "sched-long":
        # long-prompt serving: context reads dominate decode — the regime
        # the Pallas paged kernel (vs dense gather) is built for. Big pages
        # (256 tokens): the kernel's per-page DMA descriptor cost dominates
        # small pages (r3 A/B at 4k ctx: ps64 18.3 ms/step, ps256 6.8,
        # ps512 5.5 vs gather 11.9); fragmentation (~ps/2 per seq) is noise
        # at 2k+ prompts
        bench_scheduler(slots=4, n_requests=8, rate=0.5, prompt_len=2048,
                        gen_len=128, max_seq_len=4096, page_size=256,
                        tag="2k-prompt")
    if a.only == "dit":
        bench_dit_train()
    if a.only == "70b":
        bench_70b_projection()
    if a.only == "train":
        # full finetune sized for fp32 masters + AdamW on one 16GB chip
        # (TinyLlama at fp32 p+g+m+v = 17.6GB does NOT fit — the single-chip
        # full-finetune ceiling is ~800M params, same math as the
        # reference's per-GPU VRAM tables)
        bench_train_step("LLaMA-700M-class",
                         dict(dim=2048, n_layers=12, n_heads=16,
                              n_kv_heads=8, vocab_size=32000,
                              multiple_of=256),
                         batch=2, seq_len=2048)
    if a.only == "train-qpeft":
        # the reference's NormBiasLoRA-over-Linear4bit headline regime
        bench_train_step("LLaMA2-7B",
                         dict(dim=4096, n_layers=32, n_heads=32,
                              vocab_size=32000, multiple_of=256,
                              lora_rank=16, bias_tuning=True,
                              norm_tuning=True),
                         # "full" remat: with dots-saveable the saved FFN
                         # intermediates (L x b x s x 11008 bf16) alone blow
                         # the 16GB chip (r2 matrix OOM: 17.32G/15.75G)
                         batch=8, seq_len=512, qpeft=True, remat="full")
    if a.only in (None, "tiny"):
        bench_llama_decode("TinyLlama-1.1B",
                           dict(dim=2048, n_layers=22, n_heads=32,
                                n_kv_heads=4, vocab_size=32000,
                                multiple_of=256))
    if not a.quick and a.only in (None, "7b"):
        bench_llama_decode("LLaMA2-7B",
                           dict(dim=4096, n_layers=32, n_heads=32,
                                vocab_size=32000, multiple_of=256))
    if not a.quick and a.only in (None, "moe"):
        bench_moe_decode()
    if not a.quick and a.only in (None, "sphinx"):
        bench_sphinx_prefill()
    if not a.quick and a.only in (None, "ttft"):
        bench_prefill_ttft()
    if a.only == "longctx":
        # long-context decode: KV reads dominate (736 MB/step at 4k) —
        # exercises the lane-major cache + batch-blocked attention at the
        # regime the paged pool is built for
        bench_llama_decode("TinyLlama-1.1B 4k-ctx",
                           dict(dim=2048, n_layers=22, n_heads=32,
                                n_kv_heads=4, vocab_size=32000,
                                multiple_of=256), cache_len=4096)
    if a.only == "7b-kv8":
        # 7B MHA is the KV-read-dominated regime even at 1k ctx (per-step
        # reads: ~4 GB KV vs ~3.5 GB W4 weights at bs8) — int8 KV halves
        # the dominant term; the production serving config for this model
        bench_llama_decode("LLaMA2-7B",
                           dict(dim=4096, n_layers=32, n_heads=32,
                                vocab_size=32000, multiple_of=256),
                           kv_dtype="int8")
    if a.only == "kv8":
        bench_llama_decode("TinyLlama-1.1B",
                           dict(dim=2048, n_layers=22, n_heads=32,
                                n_kv_heads=4, vocab_size=32000,
                                multiple_of=256), kv_dtype="int8")
    if a.only == "kv8-longctx":
        bench_llama_decode("TinyLlama-1.1B 4k-ctx",
                           dict(dim=2048, n_layers=22, n_heads=32,
                                n_kv_heads=4, vocab_size=32000,
                                multiple_of=256), cache_len=4096,
                           kv_dtype="int8")
