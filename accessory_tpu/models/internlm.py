"""InternLM — pure-functional JAX implementation.

Behavioral reference: accessory/model/LLM/internlm.py (ModelArgs :45-63,
fused-QKV MHA with bias :66-95, "half"-pair RoPE :30-41, FeedForward
:172-200 where w1=gate, w2=up, w3=down, hidden = round_up(hidden_size *
mlp_ratio, multiple_of), rmsnorm/layernorm switch :211-216).

Parameters keep the reference naming (Wqkv fused, out_proj, w1/w2/w3 in the
internlm sense) so HF/reference checkpoints map 1:1.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import functools

import jax
import jax.numpy as jnp

from accessory_tpu.config import InternLMArgs
from accessory_tpu.ops.attention import attention
from accessory_tpu.ops.decode_attention import (cached_attention_t,
                                                cached_attention_t8,
                                                decode_attention_update,
                                                decode_attention_update8,
                                                write_kv_layer,
                                                write_kv_layer8, write_kv_t,
                                                write_kv_t8)
from accessory_tpu.ops.linear import linear
from accessory_tpu.ops.norms import layer_norm, rms_norm
from accessory_tpu.util import remat_policy
from accessory_tpu.ops.rope import apply_rope, precompute_rope

Params = Dict[str, Any]

# Generator may unstack layers for the trace-time-unrolled decode loop
SUPPORTS_UNROLLED_DECODE = True
# init_kv_cache(kv_dtype="int8") supported (ops/decode_attention.py)
SUPPORTS_KV_INT8 = True


def _hidden_dim(args: InternLMArgs) -> int:
    h = int(args.hidden_size * args.mlp_ratio)
    return args.multiple_of * ((h + args.multiple_of - 1) // args.multiple_of)


def _norm(x, w, args: InternLMArgs, bias=None):
    if args.norm_type == "rmsnorm":
        return rms_norm(x, w, args.layer_norm_epsilon)
    return layer_norm(x, w, bias, args.layer_norm_epsilon)


def init_params(key: jax.Array, args: InternLMArgs) -> Params:
    dtype = jnp.dtype(args.dtype)
    d = args.hidden_size
    L = args.num_layers
    H = _hidden_dim(args)

    def dense(k, shape, scale=None):
        fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
        scale = scale or fan_in ** -0.5
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    ks = jax.random.split(key, 10)
    params: Params = {
        "word_embeddings": {"weight": dense(ks[0], (args.vocab_size, d), 0.02)},
        "layers": {
            "norm1": {"weight": jnp.ones((L, d), dtype)},
            "norm2": {"weight": jnp.ones((L, d), dtype)},
            "mixer": {
                "Wqkv": {"weight": dense(ks[1], (L, d, 3 * d)),
                         "bias": jnp.zeros((L, 3 * d), dtype)},
                "out_proj": {"weight": dense(ks[2], (L, d, d)),
                             "bias": jnp.zeros((L, d), dtype)},
            },
            "mlp": {
                "w1": {"weight": dense(ks[3], (L, d, H))},
                "w2": {"weight": dense(ks[4], (L, d, H))},
                "w3": {"weight": dense(ks[5], (L, H, d))},
            },
        },
        "norm": {"weight": jnp.ones((d,), dtype)},
        "output": {"weight": dense(ks[6], (d, args.vocab_size))},
    }
    if args.norm_type == "layernorm":
        params["layers"]["norm1"]["bias"] = jnp.zeros((L, d), dtype)
        params["layers"]["norm2"]["bias"] = jnp.zeros((L, d), dtype)
        params["norm"]["bias"] = jnp.zeros((d,), dtype)
    return params


def param_axes(args: InternLMArgs) -> Params:
    A = lambda *names: tuple(names)  # noqa: E731
    axes: Params = {
        "word_embeddings": {"weight": A("vocab", "embed")},
        "layers": {
            "norm1": {"weight": A("layers", None)},
            "norm2": {"weight": A("layers", None)},
            "mixer": {
                "Wqkv": {"weight": A("layers", "embed", "heads"),
                         "bias": A("layers", "heads")},
                "out_proj": {"weight": A("layers", "heads", "embed"),
                             "bias": A("layers", None)},
            },
            "mlp": {
                "w1": {"weight": A("layers", "embed", "ffn")},
                "w2": {"weight": A("layers", "embed", "ffn")},
                "w3": {"weight": A("layers", "ffn", "embed")},
            },
        },
        "norm": {"weight": A(None)},
        "output": {"weight": A("embed", "vocab")},
    }
    if args.norm_type == "layernorm":
        axes["layers"]["norm1"]["bias"] = A("layers", None)
        axes["layers"]["norm2"]["bias"] = A("layers", None)
        axes["norm"]["bias"] = A(None)
    return axes


def init_kv_cache(args: InternLMArgs, batch: int, max_len: Optional[int] = None,
                  dtype=None, stacked: bool = True,
                  kv_dtype: Optional[str] = None) -> Dict[str, jnp.ndarray]:
    from accessory_tpu.util import resolve_kv_dtype

    max_len = max_len or args.max_seq_len
    dtype = dtype or jnp.dtype(args.dtype)
    kv_dtype = resolve_kv_dtype(kv_dtype)  # int8 auto-on on TPU
    int8_kv = kv_dtype in ("int8", "i8")
    if int8_kv:
        dtype = jnp.int8
    nh = args.num_attention_heads
    hd = args.hidden_size // nh
    # lane-major (L, B, NKV, HD, S) — see ops/decode_attention.py
    shape = (args.num_layers, batch, nh, hd, max_len)
    sshape = (args.num_layers, batch, nh, max_len)
    if not stacked:
        # per-layer buffers for the unrolled decode loop (see models.llama)
        cache = {"k": tuple(jnp.zeros(shape[1:], dtype)
                            for _ in range(args.num_layers)),
                 "v": tuple(jnp.zeros(shape[1:], dtype)
                            for _ in range(args.num_layers))}
        if int8_kv:
            cache["ks"] = tuple(jnp.zeros(sshape[1:], jnp.float32)
                                for _ in range(args.num_layers))
            cache["vs"] = tuple(jnp.zeros(sshape[1:], jnp.float32)
                                for _ in range(args.num_layers))
        return cache
    cache = {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if int8_kv:
        cache["ks"] = jnp.zeros(sshape, jnp.float32)
        cache["vs"] = jnp.zeros(sshape, jnp.float32)
    return cache


def cache_axes() -> Dict[str, Tuple]:
    return {"k": ("layers", "batch", "heads", None, None),
            "v": ("layers", "batch", "heads", None, None)}


def _block(h, layer, args: InternLMArgs, cos, sin, q_offset, kv_len,
           cache_k=None, cache_v=None, update_cache=False,
           cache_ks=None, cache_vs=None, attn_fn=None):
    b, sq, _ = h.shape
    d = args.hidden_size
    nh = args.num_attention_heads
    hd = d // nh
    mx = layer["mixer"]

    x = _norm(h, layer["norm1"]["weight"], args, layer["norm1"].get("bias"))
    qkv = linear(x, mx["Wqkv"]["weight"], mx["Wqkv"]["bias"])
    qkv = qkv.reshape(b, sq, 3, nh, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    # internlm uses the (x_j, x_{j+d/2}) pairing (internlm.py:30-41)
    q = apply_rope(q, cos, sin, "half")
    k = apply_rope(k, cos, sin, "half")

    wk = wv = wks = wvs = None
    if cache_k is not None and update_cache:
        # fused attention + in-place cache update (ops.decode_attention)
        if cache_ks is not None:
            out, wk, wv, wks, wvs = decode_attention_update8(
                q, k, v, cache_k, cache_v, cache_ks, cache_vs, q_offset)
        else:
            out, wk, wv = decode_attention_update(q, k, v, cache_k, cache_v,
                                                  q_offset)
    elif cache_k is not None:
        # read-only cache + two-part softmax (ops.attention.cached_attention)
        if cache_ks is not None:
            out = cached_attention_t8(q, k, v, cache_k, cache_v,
                                      cache_ks, cache_vs, q_offset)
        else:
            out = cached_attention_t(q, k, v, cache_k, cache_v, q_offset)
    elif attn_fn is not None:
        # injected attention (parallel.context.cp_attention) — the single
        # seam context parallelism needs (see models/llama.py)
        out = attn_fn(q, k, v)
    else:
        out = attention(q, k, v, causal=True, q_offset=0)

    h = h + linear(out.reshape(b, sq, d), mx["out_proj"]["weight"],
                   mx["out_proj"]["bias"])

    x = _norm(h, layer["norm2"]["weight"], args, layer["norm2"].get("bias"))
    mlp = layer["mlp"]
    if args.use_swiglu:
        inner = jax.nn.silu(linear(x, mlp["w1"]["weight"])) * linear(x, mlp["w2"]["weight"])
    else:
        inner = jax.nn.gelu(linear(x, mlp["w1"]["weight"]))
    h = h + linear(inner, mlp["w3"]["weight"])
    if update_cache and wk is not None:
        if wks is not None:
            return h, wk, wv, wks, wvs
        return h, wk, wv
    return h, k, v


def forward(
    params: Params,
    args: InternLMArgs,
    tokens: jnp.ndarray,
    *,
    cache: Optional[Dict[str, jnp.ndarray]] = None,
    cur_pos=0,
    remat: bool = False,
    attn_fn=None,
    embeds: Optional[jnp.ndarray] = None,
):
    b, sq = tokens.shape
    h = embeds if embeds is not None else (
        jnp.take(params["word_embeddings"]["weight"], tokens, axis=0))
    hd = args.hidden_size // args.num_attention_heads

    if cache is not None:
        ck0 = cache["k"]
        max_rope = (ck0[0].shape[3] if isinstance(ck0, (list, tuple))
                    else ck0.shape[4])
    else:
        max_rope = sq
    cos_full, sin_full = precompute_rope(hd, max_rope, args.rope_theta, args.rope_scaling)
    if cache is not None:
        cos = jax.lax.dynamic_slice_in_dim(cos_full, cur_pos, sq, 0)
        sin = jax.lax.dynamic_slice_in_dim(sin_full, cur_pos, sq, 0)
        kv_len = cur_pos + sq
    else:
        cos, sin = cos_full[:sq], sin_full[:sq]
        kv_len = None

    block = _block if attn_fn is None else functools.partial(
        _block, attn_fn=attn_fn)
    if remat:
        block = jax.checkpoint(
            block, policy=remat_policy(remat),
            static_argnums=(2,))

    if cache is not None and isinstance(params["layers"], (list, tuple)):
        # unrolled decode loop over unstacked layers (models.llama.forward)
        fused = sq == 1  # fused attention+cache-update kernel at decode
        int8_kv = "ks" in cache
        new_k, new_v, new_ks, new_vs = [], [], [], []
        for i, (layer, ck, cv) in enumerate(
                zip(params["layers"], cache["k"], cache["v"])):
            cks = cache["ks"][i] if int8_kv else None
            cvs = cache["vs"][i] if int8_kv else None
            if fused and int8_kv:
                h, wk_, wv_, wks_, wvs_ = _block(h, layer, args, cos, sin,
                                                 cur_pos, kv_len, ck, cv,
                                                 True, cks, cvs)
            else:
                h, k_new, v_new = _block(h, layer, args, cos, sin, cur_pos,
                                         kv_len, ck, cv, fused, cks, cvs)
                if fused:
                    wk_, wv_ = k_new, v_new  # already-updated pools
                elif int8_kv:
                    wk_, wv_, wks_, wvs_ = write_kv_layer8(
                        ck, cv, cks, cvs, k_new, v_new, cur_pos)
                else:
                    wk_, wv_ = write_kv_layer(ck, cv, k_new, v_new, cur_pos)
            new_k.append(wk_)
            new_v.append(wv_)
            if int8_kv:
                new_ks.append(wks_)
                new_vs.append(wvs_)
        new_cache = {"k": tuple(new_k), "v": tuple(new_v)}
        if int8_kv:
            new_cache["ks"] = tuple(new_ks)
            new_cache["vs"] = tuple(new_vs)
    elif cache is not None and "ks" in cache:
        def body(h, xs):
            layer, ck, cv, cks, cvs = xs
            # _block directly: remat never applies to cached inference
            h, k_new, v_new = _block(h, layer, args, cos, sin, cur_pos,
                                     kv_len, ck, cv, False, cks, cvs)
            return h, (k_new, v_new)

        h, (new_k, new_v) = jax.lax.scan(
            body, h, (params["layers"], cache["k"], cache["v"],
                      cache["ks"], cache["vs"]))
        wk_, wv_, wks_, wvs_ = write_kv_t8(
            cache["k"], cache["v"], cache["ks"], cache["vs"],
            new_k, new_v, cur_pos)
        new_cache = {"k": wk_, "v": wv_, "ks": wks_, "vs": wvs_}
    elif cache is not None:
        def body(h, xs):
            layer, ck, cv = xs
            h, k_new, v_new = block(h, layer, args, cos, sin, cur_pos,
                                    kv_len, ck, cv)
            return h, (k_new, v_new)

        h, (new_k, new_v) = jax.lax.scan(
            body, h, (params["layers"], cache["k"], cache["v"]))
        wk_, wv_ = write_kv_t(cache["k"], cache["v"], new_k, new_v,
                              cur_pos)
        new_cache = {"k": wk_, "v": wv_}
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

    h = _norm(h, params["norm"]["weight"], args, params["norm"].get("bias"))
    logits = linear(h, params["output"]["weight"]).astype(jnp.float32)
    return logits, new_cache
