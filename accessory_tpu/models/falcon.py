"""Falcon / Falcon-180B — pure-functional JAX implementation.

Behavioral reference: accessory/model/LLM/falcon.py (ModelArgs :24-44, MQA /
new_decoder_architecture attention :68-190, parallel attention+MLP residual
topology :225-276, "half"-pair RoPE :47-58, GELU 4x MLP :210-222).

Decoder-layer topology (falcon.py FalconDecoderLayer.forward):
  * new_decoder_architecture: two *parallel* layernorms (ln_attn, ln_mlp)
    feed attention and MLP from the same residual; out = residual + attn + mlp.
  * else parallel_attn: single input_layernorm feeds both branches.
  * else: sequential (post_attention_layernorm) — the classic topology.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import functools

import jax
import jax.numpy as jnp

from accessory_tpu.config import FalconArgs
from accessory_tpu.ops.attention import attention
from accessory_tpu.ops.decode_attention import (cached_attention_t,
                                                cached_attention_t8,
                                                decode_attention_update,
                                                decode_attention_update8,
                                                write_kv_layer,
                                                write_kv_layer8, write_kv_t,
                                                write_kv_t8)
from accessory_tpu.ops.linear import linear
from accessory_tpu.ops.norms import layer_norm
from accessory_tpu.ops.rope import apply_rope, precompute_rope
from accessory_tpu.util import remat_policy

Params = Dict[str, Any]

# Generator may unstack layers for the trace-time-unrolled decode loop
SUPPORTS_UNROLLED_DECODE = True
# init_kv_cache(kv_dtype="int8") supported (ops/decode_attention.py)
SUPPORTS_KV_INT8 = True


def init_params(key: jax.Array, args: FalconArgs) -> Params:
    dtype = jnp.dtype(args.dtype)
    d = args.hidden_size
    hd = args.head_dim
    nkv = args.kv_heads
    L = args.num_layers

    def dense(k, shape, scale=None):
        fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
        scale = scale or fan_in ** -0.5
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    def maybe_bias(shape):
        return jnp.zeros(shape, dtype) if args.bias else None

    ks = jax.random.split(key, 10)
    layers: Params = {
        "self_attention": {
            "wq": {"weight": dense(ks[1], (L, d, d))},
            "wk": {"weight": dense(ks[2], (L, d, nkv * hd))},
            "wv": {"weight": dense(ks[3], (L, d, nkv * hd))},
            "dense": {"weight": dense(ks[4], (L, d, d))},
        },
        "mlp": {
            "dense_h_to_4h": {"weight": dense(ks[5], (L, d, 4 * d))},
            "dense_4h_to_h": {"weight": dense(ks[6], (L, 4 * d, d))},
        },
    }
    if args.bias:
        layers["self_attention"]["wq"]["bias"] = jnp.zeros((L, d), dtype)
        layers["self_attention"]["wk"]["bias"] = jnp.zeros((L, nkv * hd), dtype)
        layers["self_attention"]["wv"]["bias"] = jnp.zeros((L, nkv * hd), dtype)
        layers["self_attention"]["dense"]["bias"] = jnp.zeros((L, d), dtype)
        layers["mlp"]["dense_h_to_4h"]["bias"] = jnp.zeros((L, 4 * d), dtype)
        layers["mlp"]["dense_4h_to_h"]["bias"] = jnp.zeros((L, d), dtype)
    if args.new_decoder_architecture:
        layers["ln_attn"] = {"weight": jnp.ones((L, d), dtype),
                             "bias": jnp.zeros((L, d), dtype)}
        layers["ln_mlp"] = {"weight": jnp.ones((L, d), dtype),
                            "bias": jnp.zeros((L, d), dtype)}
    else:
        layers["input_layernorm"] = {"weight": jnp.ones((L, d), dtype),
                                     "bias": jnp.zeros((L, d), dtype)}
        if not args.parallel_attn:
            layers["post_attention_layernorm"] = {
                "weight": jnp.ones((L, d), dtype),
                "bias": jnp.zeros((L, d), dtype)}
    return {
        "word_embeddings": {"weight": dense(ks[0], (args.vocab_size, d), 0.02)},
        "layers": layers,
        "ln_f": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "output": {"weight": dense(ks[7], (d, args.vocab_size))},
    }


def param_axes(args: FalconArgs) -> Params:
    A = lambda *names: tuple(names)  # noqa: E731
    ln = lambda: {"weight": A("layers", None), "bias": A("layers", None)}  # noqa: E731
    layers: Params = {
        "self_attention": {
            "wq": {"weight": A("layers", "embed", "heads")},
            # MQA single KV head: replicate rather than shard
            "wk": {"weight": A("layers", "embed", "kv_heads" if args.kv_heads > 1 else None)},
            "wv": {"weight": A("layers", "embed", "kv_heads" if args.kv_heads > 1 else None)},
            "dense": {"weight": A("layers", "heads", "embed")},
        },
        "mlp": {
            "dense_h_to_4h": {"weight": A("layers", "embed", "ffn")},
            "dense_4h_to_h": {"weight": A("layers", "ffn", "embed")},
        },
    }
    if args.bias:
        layers["self_attention"]["wq"]["bias"] = A("layers", "heads")
        layers["self_attention"]["wk"]["bias"] = A("layers", None)
        layers["self_attention"]["wv"]["bias"] = A("layers", None)
        layers["self_attention"]["dense"]["bias"] = A("layers", None)
        layers["mlp"]["dense_h_to_4h"]["bias"] = A("layers", "ffn")
        layers["mlp"]["dense_4h_to_h"]["bias"] = A("layers", None)
    if args.new_decoder_architecture:
        layers["ln_attn"] = ln()
        layers["ln_mlp"] = ln()
    else:
        layers["input_layernorm"] = ln()
        if not args.parallel_attn:
            layers["post_attention_layernorm"] = ln()
    return {
        "word_embeddings": {"weight": A("vocab", "embed")},
        "layers": layers,
        "ln_f": {"weight": A(None), "bias": A(None)},
        "output": {"weight": A("embed", "vocab")},
    }


def init_kv_cache(args: FalconArgs, batch: int, max_len: Optional[int] = None,
                  dtype=None, stacked: bool = True,
                  kv_dtype: Optional[str] = None) -> Dict[str, jnp.ndarray]:
    from accessory_tpu.util import resolve_kv_dtype

    max_len = max_len or args.max_seq_len
    dtype = dtype or jnp.dtype(args.dtype)
    kv_dtype = resolve_kv_dtype(kv_dtype)  # int8 auto-on on TPU
    int8_kv = kv_dtype in ("int8", "i8")
    if int8_kv:
        dtype = jnp.int8
    # lane-major (L, B, NKV, HD, S) — see ops/decode_attention.py
    shape = (args.num_layers, batch, args.kv_heads, args.head_dim, max_len)
    sshape = (args.num_layers, batch, args.kv_heads, max_len)
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


def _block(h, layer, args: FalconArgs, cos, sin, q_offset, kv_len,
           cache_k=None, cache_v=None, update_cache=False,
           cache_ks=None, cache_vs=None, attn_fn=None):
    b, sq, _ = h.shape
    d, hd = args.hidden_size, args.head_dim
    nh, nkv = args.num_attention_heads, args.kv_heads
    att = layer["self_attention"]
    eps = args.layer_norm_epsilon

    if args.new_decoder_architecture:
        attn_in = layer_norm(h, layer["ln_attn"]["weight"], layer["ln_attn"]["bias"], eps)
        mlp_in = layer_norm(h, layer["ln_mlp"]["weight"], layer["ln_mlp"]["bias"], eps)
    else:
        attn_in = layer_norm(h, layer["input_layernorm"]["weight"],
                             layer["input_layernorm"]["bias"], eps)
        mlp_in = attn_in  # parallel_attn; sequential topology handled below

    q = linear(attn_in, att["wq"]["weight"], att["wq"].get("bias")).reshape(b, sq, nh, hd)
    k = linear(attn_in, att["wk"]["weight"], att["wk"].get("bias")).reshape(b, sq, nkv, hd)
    v = linear(attn_in, att["wv"]["weight"], att["wv"].get("bias")).reshape(b, sq, nkv, hd)
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
    attn_out = linear(out.reshape(b, sq, d), att["dense"]["weight"],
                      att["dense"].get("bias"))

    mlp = layer["mlp"]
    if not args.new_decoder_architecture and not args.parallel_attn:
        h = h + attn_out
        mlp_in = layer_norm(h, layer["post_attention_layernorm"]["weight"],
                            layer["post_attention_layernorm"]["bias"], eps)
        mlp_out = linear(jax.nn.gelu(
            linear(mlp_in, mlp["dense_h_to_4h"]["weight"], mlp["dense_h_to_4h"].get("bias"))),
            mlp["dense_4h_to_h"]["weight"], mlp["dense_4h_to_h"].get("bias"))
        h = h + mlp_out
    else:
        mlp_out = linear(jax.nn.gelu(
            linear(mlp_in, mlp["dense_h_to_4h"]["weight"], mlp["dense_h_to_4h"].get("bias"))),
            mlp["dense_4h_to_h"]["weight"], mlp["dense_4h_to_h"].get("bias"))
        h = h + attn_out + mlp_out
    if update_cache and wk is not None:
        if wks is not None:
            return h, wk, wv, wks, wvs
        return h, wk, wv
    return h, k, v


def forward(
    params: Params,
    args: FalconArgs,
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

    h = layer_norm(h, params["ln_f"]["weight"], params["ln_f"]["bias"],
                   args.layer_norm_epsilon)
    logits = linear(h, params["output"]["weight"]).astype(jnp.float32)
    return logits, new_cache
