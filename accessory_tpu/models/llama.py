"""LLaMA / LLaMA2 / CodeLLaMA — pure-functional JAX implementation.

Behavioral reference: accessory/model/LLM/llama.py (ModelArgs :28-43, RoPE
:46-77, GQA repeat_kv :80-89, Attention :92-218, SwiGLU FeedForward :226-256,
Transformer :259-427). This is a ground-up TPU design, not a translation:

  * params are a pytree; per-layer weights are **stacked on a leading layer
    axis** and the decoder runs as one ``lax.scan`` — compile time is O(1) in
    depth and remat/pipeline policies attach to the scan body.
  * weights are stored (in_dim, out_dim) so application is ``x @ w``.
  * one code path serves training, prefill, and decode: the caller passes an
    optional KV cache + absolute position offset. Masking is positional, no
    O(L^2) mask materialization (reference builds full causal masks in the
    non-flash path, llama.py:199-224).
  * tensor parallelism is *not* in this file: sharding is applied from the
    logical axes returned by ``param_axes`` (see accessory_tpu.parallel) —
    the GSPMD equivalent of FairScale Column/RowParallelLinear.

Numerics parity choices: RoPE fp32 (llama.py:72-77), softmax fp32, RMSNorm
fp32, logits fp32 (llama.py:427).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from accessory_tpu.config import LLaMAArgs
from accessory_tpu.ops.attention import attention
from accessory_tpu.ops.decode_attention import (cached_attention_t,
                                                cached_attention_t8,
                                                decode_attention_update,
                                                decode_attention_update8,
                                                write_kv_layer,
                                                write_kv_layer8, write_kv_t,
                                                write_kv_t8)
from accessory_tpu.ops.linear import linear, module_linear, module_linear_nr
from accessory_tpu.ops.norms import rms_norm
from accessory_tpu.util import remat_policy
from accessory_tpu.ops.rope import apply_rope, precompute_rope, rope_rows

Params = Dict[str, Any]

# Generator may unstack layers for the trace-time-unrolled decode loop
SUPPORTS_UNROLLED_DECODE = True
# forward_paged also accepts unstacked layers (ContinuousBatcher uses this)
SUPPORTS_UNROLLED_PAGED = True
# forward_paged(continuation=True) continues each slot at its current
# length — the scheduler's chunked-prefill admission requires it
SUPPORTS_CHUNKED_PREFILL = True
# init_kv_cache(kv_dtype="int8") → quantized KV pools (half the KV HBM
# traffic, 2x context capacity; ops/decode_attention.py int8 kernels)
SUPPORTS_KV_INT8 = True
# _block consumes fused wqkv/w13 weights (quant/fuse.py fuse_for_decode);
# enables the engine's auto-fuse + the decode-RoPE kernel epilogue
SUPPORTS_FUSED_QKV = True


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_params(key: jax.Array, args: LLaMAArgs) -> Params:
    """Random-init parameter pytree (trunc-normal-ish; exact init is
    irrelevant for inference, matched loosely for training)."""
    dtype = jnp.dtype(args.dtype)
    hd = args.head_dim
    nq, nkv = args.n_heads, args.kv_heads
    ffn = args.ffn_hidden_dim
    L = args.n_layers

    def dense(k, shape, scale=None):
        fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
        scale = scale or fan_in ** -0.5
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    ks = jax.random.split(key, 20)
    params: Params = {
        "tok_embeddings": {"weight": dense(ks[0], (args.vocab_size, args.dim), 0.02)},
        "layers": {
            "attention_norm": {"weight": jnp.ones((L, args.dim), dtype)},
            "ffn_norm": {"weight": jnp.ones((L, args.dim), dtype)},
            "attention": {
                "wq": {"weight": dense(ks[1], (L, args.dim, nq * hd))},
                "wk": {"weight": dense(ks[2], (L, args.dim, nkv * hd))},
                "wv": {"weight": dense(ks[3], (L, args.dim, nkv * hd))},
                "wo": {"weight": dense(ks[4], (L, nq * hd, args.dim))},
            },
            "feed_forward": {
                "w1": {"weight": dense(ks[5], (L, args.dim, ffn))},
                "w2": {"weight": dense(ks[6], (L, ffn, args.dim))},
                "w3": {"weight": dense(ks[7], (L, args.dim, ffn))},
            },
        },
        "norm": {"weight": jnp.ones((args.dim,), dtype)},
        "output": {"weight": dense(ks[8], (args.dim, args.vocab_size))},
    }

    # PEFT additions (reference llama_peft.py:48-50 + peft.py:23-268):
    # lora_a random, lora_b ZERO so the adapter starts as identity
    if args.lora_rank > 0:
        r = args.lora_rank
        att, ff = params["layers"]["attention"], params["layers"]["feed_forward"]
        dims = {"wq": (args.dim, nq * hd), "wk": (args.dim, nkv * hd),
                "wv": (args.dim, nkv * hd), "wo": (nq * hd, args.dim)}
        for i, (name, (din, dout)) in enumerate(dims.items()):
            att[name]["lora_a"] = dense(ks[9 + i], (L, din, r))
            att[name]["lora_b"] = jnp.zeros((L, r, dout), dtype)
        fdims = {"w1": (args.dim, ffn), "w2": (ffn, args.dim), "w3": (args.dim, ffn)}
        for i, (name, (din, dout)) in enumerate(fdims.items()):
            ff[name]["lora_a"] = dense(ks[13 + i], (L, din, r))
            ff[name]["lora_b"] = jnp.zeros((L, r, dout), dtype)
    if args.bias_tuning:
        att, ff = params["layers"]["attention"], params["layers"]["feed_forward"]
        for name, dout in (("wq", nq * hd), ("wk", nkv * hd), ("wv", nkv * hd),
                           ("wo", args.dim)):
            att[name]["bias"] = jnp.zeros((L, dout), dtype)
        for name, dout in (("w1", ffn), ("w2", args.dim), ("w3", ffn)):
            ff[name]["bias"] = jnp.zeros((L, dout), dtype)
    return params


def get_trainable_params_filter(args: LLaMAArgs):
    """Name-predicate for the trainable subset (reference
    get_trainable_params protocol, meta.py:216-224 + llama_peft trainability:
    PEFT mode trains only lora/bias/norm; full mode trains everything)."""
    peft = args.lora_rank > 0 or args.bias_tuning or args.norm_tuning
    if not peft:
        return lambda name: True

    def f(name: str) -> bool:
        if args.lora_rank > 0 and "lora" in name:
            return True
        if args.bias_tuning and name.endswith("bias"):
            return True
        if args.norm_tuning and "norm" in name:
            return True
        return False

    return f


def param_axes(args: LLaMAArgs) -> Params:
    """Logical sharding axes, same tree structure as params.

    Names resolve through accessory_tpu.parallel.sharding rules; the defaults
    put "heads"/"ffn" on the tp mesh axis and "embed" on fsdp — exactly where
    FairScale shards (column = out dim, row = in dim, embed = vocab dim 0 in
    our (vocab, dim) layout → shard "vocab" on tp).
    """
    A = lambda *names: tuple(names)  # noqa: E731
    axes = {
        "tok_embeddings": {"weight": A("vocab", "embed")},
        "layers": {
            "attention_norm": {"weight": A("layers", None)},
            "ffn_norm": {"weight": A("layers", None)},
            "attention": {
                "wq": {"weight": A("layers", "embed", "heads")},
                "wk": {"weight": A("layers", "embed", "heads")},
                "wv": {"weight": A("layers", "embed", "heads")},
                "wo": {"weight": A("layers", "heads", "embed")},
            },
            "feed_forward": {
                "w1": {"weight": A("layers", "embed", "ffn")},
                "w2": {"weight": A("layers", "ffn", "embed")},
                "w3": {"weight": A("layers", "embed", "ffn")},
            },
        },
        "norm": {"weight": A(None)},
        "output": {"weight": A("embed", "vocab")},
    }
    att, ff = axes["layers"]["attention"], axes["layers"]["feed_forward"]
    if args.lora_rank > 0:
        # reference TP placement: lora_a row-parallel (shard in), lora_b
        # column-parallel (shard out) — peft.py:132, :238
        for name in ("wq", "wk", "wv"):
            att[name]["lora_a"] = A("layers", "embed", None)
            att[name]["lora_b"] = A("layers", None, "heads")
        att["wo"]["lora_a"] = A("layers", "heads", None)
        att["wo"]["lora_b"] = A("layers", None, "embed")
        for name in ("w1", "w3"):
            ff[name]["lora_a"] = A("layers", "embed", None)
            ff[name]["lora_b"] = A("layers", None, "ffn")
        ff["w2"]["lora_a"] = A("layers", "ffn", None)
        ff["w2"]["lora_b"] = A("layers", None, "embed")
    if args.bias_tuning:
        for name in ("wq", "wk", "wv"):
            att[name]["bias"] = A("layers", "heads")
        att["wo"]["bias"] = A("layers", None)
        for name in ("w1", "w3"):
            ff[name]["bias"] = A("layers", "ffn")
        ff["w2"]["bias"] = A("layers", None)
    return axes


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

def init_kv_cache(args: LLaMAArgs, batch: int, max_len: Optional[int] = None,
                  dtype=None, stacked: bool = True,
                  kv_dtype: Optional[str] = None) -> Dict[str, jnp.ndarray]:
    """Static per-layer KV cache, stacked on the layer axis.

    TPU version of the reference's lazily-allocated (max_bsz, max_seq, n_kv,
    hd) tensors (llama.py:210-215, 429-435) — here allocation is explicit and
    the buffers are donated through decode steps so XLA updates in place.

    ``kv_dtype="int8"`` stores per-token-
    per-head symmetric int8 k/v plus f32 scale pools ``ks``/``vs`` —
    half the KV HBM traffic and 2x the context per GB
    (ops/decode_attention.py int8 kernels); ``None`` resolves via
    util.resolve_kv_dtype (int8 auto-on on TPU, env ACCESSORY_KV_DTYPE
    overrides).
    """
    from accessory_tpu.util import resolve_kv_dtype

    max_len = max_len or args.max_seq_len
    dtype = dtype or jnp.dtype(args.dtype)
    kv_dtype = resolve_kv_dtype(kv_dtype)  # int8 auto-on on TPU (measured best)
    int8_kv = kv_dtype in ("int8", "i8")
    if int8_kv:
        dtype = jnp.int8
    # lane-major layout (L, B, NKV, HD, S): the context axis sits on the
    # 128-wide vector lanes so the Pallas decode-attention kernel streams
    # the cache once with no relayout (ops/decode_attention.py)
    shape = (args.n_layers, batch, args.kv_heads, args.head_dim, max_len)
    sshape = (args.n_layers, batch, args.kv_heads, max_len)
    if not stacked:
        # per-layer buffers for the unrolled decode loop (unstack_layers):
        # scan-sliced operands can't fuse into Pallas calls, so stacked
        # caches pay a full copy per layer inside the layer scan
        cache = {"k": tuple(jnp.zeros(shape[1:], dtype)
                            for _ in range(args.n_layers)),
                 "v": tuple(jnp.zeros(shape[1:], dtype)
                            for _ in range(args.n_layers))}
        if int8_kv:
            cache["ks"] = tuple(jnp.zeros(sshape[1:], jnp.float32)
                                for _ in range(args.n_layers))
            cache["vs"] = tuple(jnp.zeros(sshape[1:], jnp.float32)
                                for _ in range(args.n_layers))
        return cache
    cache = {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if int8_kv:
        cache["ks"] = jnp.zeros(sshape, jnp.float32)
        cache["vs"] = jnp.zeros(sshape, jnp.float32)
    return cache


def unstack_layers(params: Params) -> Params:
    """Convert the stacked ``layers`` pytree (every leaf (L, ...)) into a
    tuple of per-layer trees. forward() then unrolls the decode loop so
    each Pallas kernel reads its own HBM buffer instead of a scan-slice
    copy (BENCHMARKS.md round 2 — the slice copy re-streams all weights).

    Apply AFTER quantization/fusion, before jit. One-time device slicing.
    """
    layers = params["layers"]
    if isinstance(layers, (list, tuple)):
        return params
    import jax as _jax

    from accessory_tpu.quant.qtensor import QuantizedWeight

    def split_experts(tree):
        # expert-stacked QuantizedWeights (packed (E, K/8, N)) become
        # tuples of per-expert weights: XLA materializes a static slice
        # before every cond-gated expert call otherwise (ops/moe.py)
        from accessory_tpu.ops.moe import _qw_index

        def f(x):
            if isinstance(x, QuantizedWeight) and x.packed.ndim == 3:
                return tuple(_qw_index(x, e)
                             for e in range(x.packed.shape[0]))
            return x

        return _jax.tree.map(
            f, tree, is_leaf=lambda x: isinstance(x, QuantizedWeight))

    n = _jax.tree.leaves(layers)[0].shape[0]
    out = dict(params)
    out["layers"] = tuple(
        split_experts(_jax.tree.map(lambda x: x[i], layers))
        for i in range(n))
    return out


def cache_axes() -> Dict[str, Tuple]:
    ax = ("layers", "batch", "heads", None, None)
    # ks/vs only exist for int8 caches; sharding code ignores extra keys
    return {"k": ax, "v": ax,
            "ks": ("layers", "batch", "heads", None),
            "vs": ("layers", "batch", "heads", None)}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _block(h, layer, args: LLaMAArgs, cos, sin, q_offset, kv_len,
           cache_k=None, cache_v=None, update_cache=False,
           cache_ks=None, cache_vs=None, rope_t=None, attn_fn=None):
    """One transformer block.

    Returns (h, k_new, v_new) — or, with ``update_cache=True`` (unrolled
    decode loop, per-layer cache buffers), (h, new_cache_k, new_cache_v)
    with the new token's k/v written in place by the fused
    attention+cache-update kernel (ops.decode_attention). With an int8
    cache (``cache_ks``/``cache_vs`` scale pools given) the fused update
    returns (h, wk, wv, wks, wvs)."""
    b, sq, _ = h.shape
    hd, nq, nkv = args.head_dim, args.n_heads, args.kv_heads
    att = layer["attention"]
    # training (cache-free) differentiates through these matmuls: the fused
    # kernel form has no autodiff rule, so force the unfused composition
    # (plain quant matmul carries the custom_vjp)
    fuse_ok = cache_k is not None

    if "wqkv" in att:
        # decode-time fused projection (quant/fuse.py): one full-width
        # matmul, split on the output axis; attention_norm folds into the
        # kernel prologue and decode-RoPE into the epilogue
        # (module_linear_nr — rope_t from ops.rope.rope_rows)
        qkv = module_linear_nr(h, att["wqkv"],
                               norm=layer["attention_norm"],
                               eps=args.norm_eps, rope=rope_t)
        q = qkv[..., :nq * hd].reshape(b, sq, nq, hd)
        k = qkv[..., nq * hd:(nq + nkv) * hd].reshape(b, sq, nkv, hd)
        v = qkv[..., (nq + nkv) * hd:].reshape(b, sq, nkv, hd)
        if rope_t is None:
            q = apply_rope(q, cos, sin, args.rope_style)
            k = apply_rope(k, cos, sin, args.rope_style)
    else:
        x = rms_norm(h, layer["attention_norm"]["weight"], args.norm_eps)
        q = module_linear(x, att["wq"]).reshape(b, sq, nq, hd)
        k = module_linear(x, att["wk"]).reshape(b, sq, nkv, hd)
        v = module_linear(x, att["wv"]).reshape(b, sq, nkv, hd)
        q = apply_rope(q, cos, sin, args.rope_style)
        k = apply_rope(k, cos, sin, args.rope_style)

    wk = wv = wks = wvs = None
    if cache_k is not None and update_cache:
        # fused attention + in-place cache update (one kernel call)
        if cache_ks is not None:
            out, wk, wv, wks, wvs = decode_attention_update8(
                q, k, v, cache_k, cache_v, cache_ks, cache_vs, q_offset)
        else:
            out, wk, wv = decode_attention_update(q, k, v, cache_k, cache_v,
                                                  q_offset)
    elif cache_k is not None:
        # READ-ONLY cache + two-part softmax (pallas kernel at decode); the
        # caller writes k/v into the cache once outside the layer scan
        if cache_ks is not None:
            out = cached_attention_t8(q, k, v, cache_k, cache_v,
                                      cache_ks, cache_vs, q_offset)
        else:
            out = cached_attention_t(q, k, v, cache_k, cache_v, q_offset)
    elif attn_fn is not None:
        # injected attention (e.g. parallel.context.cp_attention — the
        # sequence axis of h is cp-sharded and only attention mixes
        # positions, so this is the single seam context parallelism needs)
        out = attn_fn(q, k, v)
    else:
        out = attention(q, k, v, causal=True, q_offset=0)

    h = module_linear_nr(out.reshape(b, sq, nq * hd), att["wo"], residual=h,
                         allow_fused=fuse_ok)

    ff = layer["feed_forward"]
    if "w13" in ff:
        from accessory_tpu.ops.ffn_fused import ffn_fusible, ffn_qmm

        w13_w = ff["w13"].get("weight")
        w2_w = ff["w2"].get("weight") if isinstance(ff["w2"], dict) else None
        m_rows = b * sq
        if (fuse_ok and sq == 1 and "lora_a" not in ff["w2"]
                and ff["w2"].get("bias") is None
                and ffn_fusible(w13_w, w2_w, m_rows)
                and jax.default_backend() == "tpu"):
            # whole FFN (w13 → SwiGLU → w2 + residual) in ONE kernel:
            # removes a per-layer kernel boundary and the (m, ffn) HBM
            # round-trip (r5 trace: in-model kernels pay 16-19 µs/call
            # of ramp vs back-to-back chains). Norm stays an XLA op when
            # it cannot fold (multi-k-tile), matching module_linear_nr.
            xn = rms_norm(h, layer["ffn_norm"]["weight"], args.norm_eps)
            x2d = xn.reshape(m_rows, xn.shape[-1]).astype(w13_w.act_dtype)
            h = ffn_qmm(
                x2d, w13_w.packed, w13_w.scales, w13_w.zeros,
                w2_w.packed, w2_w.scales, w2_w.zeros,
                residual=h.reshape(m_rows, -1),
                group_size=w13_w.group_size, tk1=w13_w.tile_k,
                tk2=w2_w.tile_k).reshape(h.shape)
        else:
            gu = module_linear_nr(h, ff["w13"], norm=layer["ffn_norm"],
                                  eps=args.norm_eps, allow_fused=fuse_ok)
            hidden = gu.shape[-1] // 2
            gate = jax.nn.silu(gu[..., :hidden])
            h = module_linear_nr(gate * gu[..., hidden:], ff["w2"],
                                 residual=h, allow_fused=fuse_ok)
    else:
        x = rms_norm(h, layer["ffn_norm"]["weight"], args.norm_eps)
        gate = jax.nn.silu(module_linear(x, ff["w1"]))
        h = module_linear_nr(gate * module_linear(x, ff["w3"]), ff["w2"],
                             residual=h, allow_fused=fuse_ok)
    if update_cache and wk is not None:
        if wks is not None:
            return h, wk, wv, wks, wvs
        return h, wk, wv
    return h, k, v


def forward(
    params: Params,
    args: LLaMAArgs,
    tokens: jnp.ndarray,
    *,
    cache: Optional[Dict[str, jnp.ndarray]] = None,
    cur_pos=0,
    remat: bool = False,
    embeds: Optional[jnp.ndarray] = None,
    attn_fn=None,
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """Unified forward.

    Training (cache=None): returns (logits fp32 (b, s, vocab), None) —
      reference llama.py:373-391.
    Prefill/decode (cache given): tokens are the new chunk at absolute
      position ``cur_pos``; returns (logits for the chunk, updated cache) —
      reference forward_inference llama.py:394-427 (which keeps only the last
      position; we return the chunk and let the engine slice, so the same
      function also serves scoring APIs).
    ``embeds`` optionally replaces token embedding lookup (multimodal splice).
    """
    b = tokens.shape[0]
    h = embeds if embeds is not None else (
        jnp.take(params["tok_embeddings"]["weight"], tokens, axis=0))
    sq = h.shape[1]  # embeds may be longer than tokens (multimodal splice)

    if cache is not None:
        ck0 = cache["k"]
        max_rope = (ck0[0].shape[3] if isinstance(ck0, (list, tuple))
                    else ck0.shape[4])
    else:
        max_rope = sq
    cos_full, sin_full = precompute_rope(
        args.head_dim, max_rope, args.rope_theta, args.rope_scaling)
    if cache is not None:
        cos = jax.lax.dynamic_slice_in_dim(cos_full, cur_pos, sq, 0)
        sin = jax.lax.dynamic_slice_in_dim(sin_full, cur_pos, sq, 0)
        kv_len = cur_pos + sq
    else:
        cos, sin = cos_full[:sq], sin_full[:sq]
        kv_len = None

    rope_t = None
    # default ON: chip-verified exact vs the XLA rope (exps/
    # verify_kv_int8_tpu.py, max|d|=0) and measured +5% decode throughput
    # (BENCHMARKS.md rope-fuse A/B); numerics also pinned by
    # tests/test_rope_fuse.py in interpret mode
    if (cache is not None and sq == 1
            and os.environ.get("ACCESSORY_ROPE_FUSE", "1") == "1"):
        # decode-RoPE as per-column rows, folded into the fused-wqkv
        # kernel epilogue (one shared position for the whole batch);
        # built ONCE per step, shared by every layer
        cr, sr = rope_rows(cos[0], sin[0], args.n_heads + args.kv_heads,
                           args.kv_heads, args.head_dim, args.rope_style)
        rope_t = (cr, sr, args.rope_style, args.head_dim)

    block = _block if attn_fn is None else functools.partial(
        _block, attn_fn=attn_fn)
    if remat:
        block = jax.checkpoint(
            block, policy=remat_policy(remat),
            static_argnums=(2,))

    if cache is not None and isinstance(params["layers"], (list, tuple)):
        # UNROLLED decode loop over unstacked layers (see unstack_layers):
        # inside lax.scan, the per-layer dynamic-slice of stacked weights
        # and cache cannot fuse into a Pallas custom call, so XLA
        # materializes a copy of every operand every layer — re-streaming
        # all touched bytes twice (measured ~0.9 ms/step at TinyLlama
        # scale, BENCHMARKS.md round 2). With per-layer buffers the
        # kernels read HBM directly and each layer writes its own slot.
        fused = sq == 1  # fused attention+cache-update kernel at decode
        int8_kv = "ks" in cache
        new_k, new_v, new_ks, new_vs = [], [], [], []
        for i, (layer, ck, cv) in enumerate(
                zip(params["layers"], cache["k"], cache["v"])):
            cks = cache["ks"][i] if int8_kv else None
            cvs = cache["vs"][i] if int8_kv else None
            # _block directly: remat never applies to the decode loop, and
            # the static update_cache flag must not pass through checkpoint
            if fused and int8_kv:
                h, wk, wv, wks, wvs = _block(h, layer, args, cos, sin,
                                             cur_pos, kv_len, ck, cv, True,
                                             cks, cvs, rope_t)
            else:
                h, k_new, v_new = _block(h, layer, args, cos, sin, cur_pos,
                                         kv_len, ck, cv, fused, cks, cvs,
                                         rope_t)
                if fused:
                    wk, wv = k_new, v_new  # already-updated pools
                elif int8_kv:
                    wk, wv, wks, wvs = write_kv_layer8(
                        ck, cv, cks, cvs, k_new, v_new, cur_pos)
                else:
                    wk, wv = write_kv_layer(ck, cv, k_new, v_new, cur_pos)
            new_k.append(wk)
            new_v.append(wv)
            if int8_kv:
                new_ks.append(wks)
                new_vs.append(wvs)
        new_cache = {"k": tuple(new_k), "v": tuple(new_v)}
        if int8_kv:
            new_cache["ks"] = tuple(new_ks)
            new_cache["vs"] = tuple(new_vs)
    elif cache is not None and "ks" in cache:
        def body(h, xs):
            layer, ck, cv, cks, cvs = xs
            # _block directly: remat never applies to cached inference, and
            # the static update_cache flag must not pass through checkpoint
            h, k_new, v_new = _block(h, layer, args, cos, sin, cur_pos,
                                     kv_len, ck, cv, False, cks, cvs,
                                     rope_t)
            return h, (k_new, v_new)

        h, (new_k, new_v) = jax.lax.scan(
            body, h, (params["layers"], cache["k"], cache["v"],
                      cache["ks"], cache["vs"]))
        wk, wv, wks, wvs = write_kv_t8(cache["k"], cache["v"], cache["ks"],
                                       cache["vs"], new_k, new_v, cur_pos)
        new_cache = {"k": wk, "v": wv, "ks": wks, "vs": wvs}
    elif cache is not None:
        def body(h, xs):
            layer, ck, cv = xs
            # _block directly: remat never applies to cached inference
            h, k_new, v_new = _block(h, layer, args, cos, sin, cur_pos,
                                     kv_len, ck, cv, rope_t=rope_t)
            return h, (k_new, v_new)

        h, (new_k, new_v) = jax.lax.scan(
            body, h, (params["layers"], cache["k"], cache["v"]))
        # single bulk write of all layers' new kv
        wk, wv = write_kv_t(cache["k"], cache["v"], new_k, new_v, cur_pos)
        new_cache = {"k": wk, "v": wv}
    elif isinstance(params["layers"], (list, tuple)):
        # cache-free scoring on unstacked params (compute_logits path)
        for layer in params["layers"]:
            h, _, _ = block(h, layer, args, cos, sin, 0, None)
        new_cache = None
    else:
        def body(h, layer):
            h, _, _ = block(h, layer, args, cos, sin, 0, None)
            return h, None

        h, _ = jax.lax.scan(body, h, params["layers"])
        new_cache = None

    logits = module_linear_nr(h, params["output"], norm=params["norm"],
                              eps=args.norm_eps).astype(jnp.float32)
    return logits, new_cache


# ---------------------------------------------------------------------------
# paged decode path
# ---------------------------------------------------------------------------

def init_paged_cache(args: LLaMAArgs, slots: int, total_pages: int,
                     page_size: int = 64, pages_per_seq: Optional[int] = None,
                     dtype=None, kv_dtype: Optional[str] = None):
    from accessory_tpu.engine.kvcache import init_paged_cache as _init

    # kv_dtype=None resolves inside engine.kvcache.init_paged_cache
    pages_per_seq = pages_per_seq or (args.max_seq_len // page_size)
    return _init(args.n_layers, args.kv_heads, args.head_dim, total_pages,
                 page_size, slots, pages_per_seq,
                 dtype=dtype or jnp.dtype(args.dtype), kv_dtype=kv_dtype)


def forward_paged(params: Params, args: LLaMAArgs, tokens: jnp.ndarray, pcache,
                  active_pages: Optional[int] = None,
                  continuation: bool = False):
    """Forward against a PagedKVCache (engine/kvcache.py).

    Three modes, mirroring forward_inference's prefill/decode split
    (llama.py:394-427) but with per-slot positions:
      * sq > 1 — full prefill from position 0 for every slot (chunk
        self-attention + page writes)
      * sq > 1, ``continuation=True`` — CHUNKED prefill: each slot's chunk
        continues at its current ``pcache.lengths`` offset (per-slot rope
        positions, two-part attention over the already-cached pages +
        causal within the chunk, page writes at the offset). With
        lengths == 0 this is exactly the fresh prefill, so one compiled
        shape serves every chunk of a long prompt.
      * sq == 1 — one decode token per slot at position pcache.lengths,
        attended via the paged decode kernel

    Returns (logits (b, sq, vocab) fp32, updated PagedKVCache with
    lengths += sq).
    """
    from accessory_tpu.engine.kvcache import (
        paged_cached_attention, write_tokens_all_layers)
    from accessory_tpu.ops.attention import attention as dense_attention

    b, sq = tokens.shape
    hd, nq, nkv = args.head_dim, args.n_heads, args.kv_heads
    h = jnp.take(params["tok_embeddings"]["weight"], tokens, axis=0)

    max_pos = pcache.pages_per_seq * pcache.page_size
    cos_full, sin_full = precompute_rope(
        hd, max_pos, args.rope_theta, args.rope_scaling)
    decode = sq == 1
    if decode:
        pos = pcache.lengths  # (b,)
        cos = jnp.take(cos_full, pos, axis=0)[:, None, :]  # (b, 1, d/2)
        sin = jnp.take(sin_full, pos, axis=0)[:, None, :]
        start = pos
    elif continuation:
        pos2d = pcache.lengths[:, None] + jnp.arange(sq)[None, :]  # (b, sq)
        cos = jnp.take(cos_full, pos2d, axis=0)  # (b, sq, d/2)
        sin = jnp.take(sin_full, pos2d, axis=0)
        start = pcache.lengths
    else:
        cos, sin = cos_full[:sq], sin_full[:sq]
        start = jnp.zeros((b,), jnp.int32)

    page_indices = pcache.page_indices
    old_lengths = pcache.lengths

    # pools stay READ-ONLY inside the scan (carrying them through scan
    # outputs copies the whole pool every layer — see cached_attention)
    def paged_block(h, layer, kp, vp, kps=None, vps=None, li=None):
        att = layer["attention"]
        if "wqkv" in att:
            qkv = module_linear_nr(h, att["wqkv"],
                                   norm=layer["attention_norm"],
                                   eps=args.norm_eps)
            q = qkv[..., :nq * hd].reshape(b, sq, nq, hd)
            k = qkv[..., nq * hd:(nq + nkv) * hd].reshape(b, sq, nkv, hd)
            v = qkv[..., (nq + nkv) * hd:].reshape(b, sq, nkv, hd)
        else:
            x = rms_norm(h, layer["attention_norm"]["weight"], args.norm_eps)
            q = module_linear(x, att["wq"]).reshape(b, sq, nq, hd)
            k = module_linear(x, att["wk"]).reshape(b, sq, nkv, hd)
            v = module_linear(x, att["wv"]).reshape(b, sq, nkv, hd)
        q = apply_rope(q, cos, sin, args.rope_style)
        k = apply_rope(k, cos, sin, args.rope_style)

        if decode or continuation:
            out = paged_cached_attention(
                q, k, v, kp, vp, old_lengths, page_indices, active_pages,
                kps, vps, layer=li)
        else:
            out = dense_attention(q, k, v, causal=True, q_offset=0)

        h = module_linear_nr(out.reshape(b, sq, nq * hd), att["wo"],
                             residual=h)
        ff = layer["feed_forward"]
        if "w13" in ff:
            gu = module_linear_nr(h, ff["w13"], norm=layer["ffn_norm"],
                                  eps=args.norm_eps)
            hidden = gu.shape[-1] // 2
            gate = jax.nn.silu(gu[..., :hidden])
            h = module_linear_nr(gate * gu[..., hidden:], ff["w2"],
                                 residual=h)
        else:
            x = rms_norm(h, layer["ffn_norm"]["weight"], args.norm_eps)
            gate = jax.nn.silu(module_linear(x, ff["w1"]))
            h = module_linear_nr(gate * module_linear(x, ff["w3"]),
                                 ff["w2"], residual=h)
        return h, k, v

    int8_kv = pcache.ks_pages is not None
    if isinstance(params["layers"], (list, tuple)):
        # unrolled paged decode (see forward: scan-sliced weights can't
        # fuse into Pallas calls). Pools pass WHOLE with the static layer
        # index: an XLA slice feeding the Pallas kernel materializes a
        # full-layer pool copy per layer per step (chip trace r3: 233
        # copies, 44 x 67 MB of them pool slices). The gather fallback
        # slices inside paged_cached_attention, where XLA fuses it.
        nk, nv = [], []
        for i, layer in enumerate(params["layers"]):
            h, k, v = paged_block(
                h, layer, pcache.k_pages, pcache.v_pages,
                pcache.ks_pages if int8_kv else None,
                pcache.vs_pages if int8_kv else None, li=i)
            nk.append(k)
            nv.append(v)
        new_k, new_v = jnp.stack(nk), jnp.stack(nv)
    elif int8_kv:
        def body(h, xs):
            layer, kp, vp, kps, vps = xs
            h, k, v = paged_block(h, layer, kp, vp, kps, vps)
            return h, (k, v)

        h, (new_k, new_v) = jax.lax.scan(
            body, h, (params["layers"], pcache.k_pages, pcache.v_pages,
                      pcache.ks_pages, pcache.vs_pages))
    else:
        def body(h, xs):
            layer, kp, vp = xs
            h, k, v = paged_block(h, layer, kp, vp)
            return h, (k, v)

        h, (new_k, new_v) = jax.lax.scan(
            body, h, (params["layers"], pcache.k_pages, pcache.v_pages))

    if int8_kv:
        k_pages, v_pages, ks_pages, vs_pages = write_tokens_all_layers(
            pcache.k_pages, pcache.v_pages, new_k, new_v, page_indices,
            start, pcache.ks_pages, pcache.vs_pages)
        new_cache = dataclasses.replace(
            pcache, k_pages=k_pages, v_pages=v_pages, ks_pages=ks_pages,
            vs_pages=vs_pages, lengths=old_lengths + sq)
    else:
        k_pages, v_pages = write_tokens_all_layers(
            pcache.k_pages, pcache.v_pages, new_k, new_v, page_indices,
            start)
        new_cache = dataclasses.replace(
            pcache, k_pages=k_pages, v_pages=v_pages,
            lengths=old_lengths + sq)

    logits = module_linear_nr(h, params["output"], norm=params["norm"],
                              eps=args.norm_eps).astype(jnp.float32)
    return logits, new_cache
