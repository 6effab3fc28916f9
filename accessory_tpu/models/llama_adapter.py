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
from accessory_tpu.ops.attention import attention
from accessory_tpu.ops.decode_attention import cached_attention_t, write_kv_t
from accessory_tpu.ops.linear import module_linear
from accessory_tpu.ops.norms import rms_norm
from accessory_tpu.util import remat_policy
from accessory_tpu.ops.rope import apply_rope, precompute_rope

Params = Dict[str, Any]


def init_params(key: jax.Array, args: AdapterArgs,
                with_visual: bool = False) -> Params:
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
    if with_visual:
        params["visual"] = _init_visual(k2, args)
    return params


def _init_visual(key: jax.Array, args: AdapterArgs) -> Params:
    """Visual-prefix branch (reference llama_adapter.py:343-360): CLIP
    features attended by a zero-init visual query through a small projector
    transformer (v_depth × v_num_heads at v_embed_dim), projected to dim and
    ADDED to the per-layer prefix."""
    from accessory_tpu.models.visual import ViTConfig, init_vit

    ks = jax.random.split(key, 8)
    ve, vd = args.v_embed_dim, args.v_depth
    mlp = int(ve * args.v_mlp_ratio)

    def dense(k, shape):
        return jax.random.normal(k, shape, jnp.float32) * shape[-2] ** -0.5

    clip_cfg = _clip_cfg(args)
    return {
        "clip": init_vit(ks[0], clip_cfg, jnp.float32),
        "clip_proj": {"weight": dense(ks[1], (clip_cfg.width, ve)),
                      "bias": jnp.zeros((ve,), jnp.float32)},
        "query": jnp.zeros((args.prefix_len, ve), jnp.float32),  # zero-init
        "blocks": {
            "ln1": {"weight": jnp.ones((vd, ve)), "bias": jnp.zeros((vd, ve))},
            "ln2": {"weight": jnp.ones((vd, ve)), "bias": jnp.zeros((vd, ve))},
            "qkv": {"weight": dense(ks[2], (vd, ve, 3 * ve)),
                    "bias": jnp.zeros((vd, 3 * ve))},
            "proj": {"weight": dense(ks[3], (vd, ve, ve)),
                     "bias": jnp.zeros((vd, ve))},
            "fc1": {"weight": dense(ks[4], (vd, ve, mlp)),
                    "bias": jnp.zeros((vd, mlp))},
            "fc2": {"weight": dense(ks[5], (vd, mlp, ve)),
                    "bias": jnp.zeros((vd, ve))},
        },
        "out_proj": {"weight": dense(ks[6], (ve, args.dim)),
                     "bias": jnp.zeros((args.dim,), jnp.float32)},
        "out_norm": {"weight": jnp.ones((args.dim,)),
                     "bias": jnp.zeros((args.dim,))},
    }


def _clip_cfg(args: AdapterArgs):
    from accessory_tpu.models.visual import ViTConfig

    # CLIP ViT-L/14 by default; shrunk in tests via v_* fields
    width = max(args.v_embed_dim, 32)
    return ViTConfig(image_size=224, patch_size=14 if width >= 256 else 56,
                     width=width if width >= 256 else args.v_embed_dim,
                     layers=24 if width >= 1024 else 2,
                     heads=16 if width >= 1024 else args.v_num_heads)


def encode_visual_prefix(params: Params, args: AdapterArgs,
                         images: jnp.ndarray) -> jnp.ndarray:
    """images (b, 3, 224, 224) → (b, prefix_len, dim) visual prefix delta."""
    from accessory_tpu.models.visual import vit_forward
    from accessory_tpu.ops.norms import layer_norm

    vis = params["visual"]
    cfg = _clip_cfg(args)
    feats = vit_forward(vis["clip"], cfg, images.astype(jnp.float32))
    feats = jnp.dot(feats, vis["clip_proj"]["weight"]) + vis["clip_proj"]["bias"]
    b = feats.shape[0]
    pl_ = args.prefix_len
    ve = args.v_embed_dim
    heads = args.v_num_heads
    hd = ve // heads

    # [query; feats] through the projector blocks; queries self+cross attend
    x = jnp.concatenate(
        [jnp.broadcast_to(vis["query"][None], (b, pl_, ve)), feats], axis=1)

    def body(x, blk):
        h = layer_norm(x, blk["ln1"]["weight"], blk["ln1"]["bias"])
        qkv = (jnp.dot(h, blk["qkv"]["weight"]) + blk["qkv"]["bias"]).reshape(
            b, -1, 3, heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * hd ** -0.5
        p = jax.nn.softmax(s, -1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, -1, ve)
        x = x + jnp.dot(o, blk["proj"]["weight"]) + blk["proj"]["bias"]
        h = layer_norm(x, blk["ln2"]["weight"], blk["ln2"]["bias"])
        h = jax.nn.gelu(jnp.dot(h, blk["fc1"]["weight"]) + blk["fc1"]["bias"])
        x = x + jnp.dot(h, blk["fc2"]["weight"]) + blk["fc2"]["bias"]
        return x, None

    x, _ = jax.lax.scan(body, x, vis["blocks"])
    q_out = x[:, :pl_]
    delta = jnp.dot(q_out, vis["out_proj"]["weight"]) + vis["out_proj"]["bias"]
    delta = layer_norm(delta, vis["out_norm"]["weight"], vis["out_norm"]["bias"])
    return delta.astype(jnp.dtype(args.dtype))


def param_axes(args: AdapterArgs) -> Params:
    axes = llama.param_axes(args)
    axes["adapter"] = {"prefix": (None, None, "embed"),
                       "gate": (None, "heads")}
    return axes


def get_trainable_params_filter(args: AdapterArgs):
    def f(name: str) -> bool:
        return name.startswith("adapter")

    return f


def init_kv_cache(args, batch, max_len=None, dtype=None, stacked=True,
                  kv_dtype=None):
    # the adapter's prefix-attention path has no int8-scale plumbing;
    # force fp pools even when ACCESSORY_KV_DTYPE=int8 is set globally
    return llama.init_kv_cache(args, batch, max_len, dtype, stacked,
                               kv_dtype="fp")
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
    images: Optional[jnp.ndarray] = None,
):
    b = tokens.shape[0]
    visual_delta = None
    if images is not None:
        # visual prefix: the projected image features ADD to every prefix
        # layer's prompt (reference llama_adapter multimodal stage)
        visual_delta = encode_visual_prefix(params, args, images)
    h = embeds if embeds is not None else (
        jnp.take(params["tok_embeddings"]["weight"], tokens, axis=0))
    sq = h.shape[1]
    hd, nq, nkv = args.head_dim, args.n_heads, args.kv_heads

    max_rope = (cache["k"].shape[4] if cache is not None else sq)
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
            out = cached_attention_t(q, k, v, ck, cv, cur_pos)
        else:
            out = attention(q, k, v, causal=True, q_offset=0)

        # zero-init-gated prefix attention (no RoPE on prefix, non-causal)
        pb = jnp.broadcast_to(prefix[None], (b, args.prefix_len, args.dim))
        if visual_delta is not None:
            pb = pb + visual_delta
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
            block, policy=remat_policy(remat))

    ad = params["adapter"]
    if cache is not None:
        def body(h, xs):
            layer, prefix, gate, pm, ck, cv = xs
            h, k_new, v_new = block(h, layer, prefix, gate, pm, ck, cv)
            return h, (k_new, v_new)

        h, (nk, nv) = jax.lax.scan(
            body, h, (params["layers"], ad["prefix"], ad["gate"], pmask,
                      cache["k"], cache["v"]))
        wk_, wv_ = write_kv_t(cache["k"], cache["v"], nk, nv, cur_pos)
        new_cache = {"k": wk_, "v": wv_}
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
