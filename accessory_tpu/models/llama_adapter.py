"""LLaMA-Adapter: zero-init attention prefix tuning (+ visual prefix).

Behavioral reference: accessory/model/LLM/llama_adapter.py — learnable
per-layer prefix embeddings for the last ``prefix_layers`` layers
(:48-62); attention output += tanh(per-head gate) · attention(q, wk(prefix),
wv(prefix), non-causal) with ZERO-init gates so training starts at the
frozen base function (:164-207); multimodal stage adds a CLIP→perceiver
projector whose output is added to the prefix (:343-360, v_embed_dim /
v_depth / v_num_heads / v_mlp_ratio args :54-57).

TPU design: prefixes are stacked (L, prefix_len, dim) with zero gates on
non-prefix layers (tanh(0)=0 makes those layers exact no-ops), so the whole
decoder stays one lax.scan.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from accessory_tpu.config import AdapterArgs, LLaMAArgs
from accessory_tpu.models import llama
from accessory_tpu.ops.attention import attention, cached_attention
from accessory_tpu.ops.linear import module_linear
from accessory_tpu.ops.norms import rms_norm
from accessory_tpu.ops.rope import apply_rope, precompute_rope

Params = Dict[str, Any]


def init_params(key: jax.Array, args: AdapterArgs) -> Params:
    params = llama.init_params(key, args)
    L = args.n_layers
    dtype = jnp.dtype(args.dtype)
    k1, k2 = jax.random.split(jax.random.fold_in(key, 23))
    params["adapter"] = {
        # prefix embeddings: random for prefix layers, zeros elsewhere —
        # irrelevant since gates zero those layers out entirely
        "prefix": (jax.random.normal(k1, (L, args.prefix_len, args.dim))
                   * 0.02).astype(dtype),
        # ZERO-init per-head gates (identity at start, reference :176)
        "gate": jnp.zeros((L, args.n_heads), dtype),
    }
    return params


def param_axes(args: AdapterArgs) -> Params:
    axes = llama.param_axes(args)
    axes["adapter"] = {"prefix": (None, None, "embed"),
                       "gate": (None, "heads")}
    return axes


def get_trainable_params_filter(args: AdapterArgs):
    def f(name: str) -> bool:
        return name.startswith("adapter")

    return f


init_kv_cache = llama.init_kv_cache
cache_axes = llama.cache_axes


def _prefix_mask(args: AdapterArgs) -> jnp.ndarray:
    """(L,) 1.0 for layers that carry a prefix (the LAST prefix_layers)."""
    pl = args.prefix_layers if args.prefix_layers is not None else args.n_layers
    idx = jnp.arange(args.n_layers)
    return (idx >= args.n_layers - pl).astype(jnp.float32)


def forward(
    params: Params,
    args: AdapterArgs,
    tokens: jnp.ndarray,
    *,
    cache: Optional[Dict[str, jnp.ndarray]] = None,
    cur_pos=0,
    remat: bool = False,
    embeds: Optional[jnp.ndarray] = None,
):
    b = tokens.shape[0]
    h = embeds if embeds is not None else (
        jnp.take(params["tok_embeddings"]["weight"], tokens, axis=0))
    sq = h.shape[1]
    hd, nq, nkv = args.head_dim, args.n_heads, args.kv_heads

    max_rope = (cache["k"].shape[2] if cache is not None else sq)
    cos_full, sin_full = precompute_rope(
        hd, max_rope, args.rope_theta, args.rope_scaling)
    if cache is not None:
        cos = jax.lax.dynamic_slice_in_dim(cos_full, cur_pos, sq, 0)
        sin = jax.lax.dynamic_slice_in_dim(sin_full, cur_pos, sq, 0)
        kv_len = cur_pos + sq
    else:
        cos, sin = cos_full[:sq], sin_full[:sq]
        kv_len = None

    pmask = _prefix_mask(args)

    def block(h, layer, prefix, gate, pm, ck, cv):
        att = layer["attention"]
        x = rms_norm(h, layer["attention_norm"]["weight"], args.norm_eps)
        q = module_linear(x, att["wq"]).reshape(b, sq, nq, hd)
        k = module_linear(x, att["wk"]).reshape(b, sq, nkv, hd)
        v = module_linear(x, att["wv"]).reshape(b, sq, nkv, hd)
        q = apply_rope(q, cos, sin, args.rope_style)
        k = apply_rope(k, cos, sin, args.rope_style)

        if ck is not None:
            # read-only cache + two-part softmax (ops.attention)
            out = cached_attention(q, k, v, ck, cv, cur_pos)
        else:
            out = attention(q, k, v, causal=True, q_offset=0)

        # zero-init-gated prefix attention (no RoPE on prefix, non-causal)
        pb = jnp.broadcast_to(prefix[None], (b, args.prefix_len, args.dim))
        pk = module_linear(pb, att["wk"]).reshape(b, args.prefix_len, nkv, hd)
        pv = module_linear(pb, att["wv"]).reshape(b, args.prefix_len, nkv, hd)
        delta = attention(q, pk, pv, causal=False, q_offset=0)
        g = (jnp.tanh(gate.astype(jnp.float32)) * pm)[None, None, :, None]
        out = out + (g * delta.astype(jnp.float32)).astype(out.dtype)

        h = h + module_linear(out.reshape(b, sq, nq * hd), att["wo"])
        x = rms_norm(h, layer["ffn_norm"]["weight"], args.norm_eps)
        ff = layer["feed_forward"]
        gatev = jax.nn.silu(module_linear(x, ff["w1"]))
        h = h + module_linear(gatev * module_linear(x, ff["w3"]), ff["w2"])
        return h, k, v

    if remat:
        block = jax.checkpoint(
            block, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    ad = params["adapter"]
    if cache is not None:
        def body(h, xs):
            layer, prefix, gate, pm, ck, cv = xs
            h, k_new, v_new = block(h, layer, prefix, gate, pm, ck, cv)
            return h, (k_new, v_new)

        h, (nk, nv) = jax.lax.scan(
            body, h, (params["layers"], ad["prefix"], ad["gate"], pmask,
                      cache["k"], cache["v"]))
        new_cache = {
            "k": jax.lax.dynamic_update_slice(
                cache["k"], nk.astype(cache["k"].dtype), (0, 0, cur_pos, 0, 0)),
            "v": jax.lax.dynamic_update_slice(
                cache["v"], nv.astype(cache["v"].dtype), (0, 0, cur_pos, 0, 0)),
        }
    else:
        def body(h, xs):
            layer, prefix, gate, pm = xs
            h, _, _ = block(h, layer, prefix, gate, pm, None, None)
            return h, None

        h, _ = jax.lax.scan(
            body, h, (params["layers"], ad["prefix"], ad["gate"], pmask))
        new_cache = None

    h = rms_norm(h, params["norm"]["weight"], args.norm_eps)
    logits = jnp.dot(h, params["output"]["weight"]).astype(jnp.float32)
    return logits, new_cache
