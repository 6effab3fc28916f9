"""Mixtral-8x7B sparse MoE — pure-functional JAX implementation.

Behavioral reference: accessory/model/LLM/mixtral.py (whole-expert EP layout,
MoE :220-295) and mixtral_sparse.py (expert-sharded TP layout via megablocks,
:238-488; fp32 gate softmax :417-421; load-balancing loss :282-297). One
implementation serves both reference variants: the *layout* difference
(whole experts per device vs. 1/tp of each expert's hidden dim per device)
is purely a sharding-rule choice here — ``param_axes`` marks the expert
weights with ("experts", ...) and ("expert_ffn") logical axes, and the rule
table maps them to the ``ep`` or ``tp`` mesh axis.

Attention is LLaMA-style GQA (n_kv_heads=8) with rope_theta=1e6
(mixtral_sparse.py:57); reuses the llama block machinery.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import functools

import jax
import jax.numpy as jnp

from accessory_tpu.config import MixtralArgs
from accessory_tpu.ops.attention import attention
from accessory_tpu.ops.decode_attention import (cached_attention_t,
                                                cached_attention_t8,
                                                decode_attention_update,
                                                decode_attention_update8,
                                                write_kv_layer,
                                                write_kv_layer8, write_kv_t,
                                                write_kv_t8)
from accessory_tpu.ops.linear import linear, module_linear
from accessory_tpu.ops.moe import moe_ffn
from accessory_tpu.ops.norms import rms_norm
from accessory_tpu.util import remat_policy
from accessory_tpu.ops.rope import apply_rope, precompute_rope

Params = Dict[str, Any]

# Generator may unstack layers for the trace-time-unrolled decode loop
SUPPORTS_UNROLLED_DECODE = True
SUPPORTS_UNROLLED_PAGED = True
# init_kv_cache(kv_dtype="int8") supported (see models.llama)
SUPPORTS_KV_INT8 = True
# forward_paged(continuation=True) supported (chunked prefill /
# speculative verify at per-slot offsets)
SUPPORTS_CHUNKED_PREFILL = True


def init_params(key: jax.Array, args: MixtralArgs) -> Params:
    dtype = jnp.dtype(args.dtype)
    hd, nq, nkv = args.head_dim, args.n_heads, args.kv_heads
    L, E, H = args.n_layers, args.num_experts, args.hidden_dim

    def dense(k, shape, scale=None):
        fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
        scale = scale or fan_in ** -0.5
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    ks = jax.random.split(key, 12)
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
                # router gate kept fp32 (softmax numerics, quant-blocklisted)
                "gate": {"weight": dense(ks[5], (L, args.dim, E)).astype(jnp.float32)},
                "w1": {"weight": dense(ks[6], (L, E, args.dim, H))},
                "w2": {"weight": dense(ks[7], (L, E, H, args.dim))},
                "w3": {"weight": dense(ks[8], (L, E, args.dim, H))},
            },
        },
        "norm": {"weight": jnp.ones((args.dim,), dtype)},
        "output": {"weight": dense(ks[9], (args.dim, args.vocab_size))},
    }
    # PEFT on attention projections (reference mixtral_peft.py)
    if args.lora_rank > 0:
        r = args.lora_rank
        att = params["layers"]["attention"]
        dims = {"wq": (args.dim, nq * hd), "wk": (args.dim, nkv * hd),
                "wv": (args.dim, nkv * hd), "wo": (nq * hd, args.dim)}
        for i, (name, (din, dout)) in enumerate(dims.items()):
            att[name]["lora_a"] = dense(jax.random.fold_in(ks[10], i),
                                        (L, din, r))
            att[name]["lora_b"] = jnp.zeros((L, r, dout), dtype)
    if args.bias_tuning:
        att = params["layers"]["attention"]
        for name, dout in (("wq", nq * hd), ("wk", nkv * hd),
                           ("wv", nkv * hd), ("wo", args.dim)):
            att[name]["bias"] = jnp.zeros((L, dout), dtype)
    return params


def get_trainable_params_filter(args: MixtralArgs):
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


def get_quant_blocklist(args: MixtralArgs):
    return ["gate"]  # router stays fp32 (fp32 softmax numerics)


def param_axes(args: MixtralArgs) -> Params:
    """Logical sharding axes. expert_layout "ep": experts axis → ep mesh axis
    (whole experts per shard, reference mixtral.py:230-240); "sparse": expert
    hidden dim → tp (every shard holds 1/tp of each expert,
    mixtral_sparse.py:238-263)."""
    A = lambda *names: tuple(names)  # noqa: E731
    if args.expert_layout == "ep":
        e_ax, h_ax = "experts", None
    else:  # "sparse"
        e_ax, h_ax = None, "expert_ffn"
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
                "gate": {"weight": A("layers", None, None)},
                "w1": {"weight": A("layers", e_ax, "embed", h_ax)},
                "w2": {"weight": A("layers", e_ax, h_ax, "embed")},
                "w3": {"weight": A("layers", e_ax, "embed", h_ax)},
            },
        },
        "norm": {"weight": A(None)},
        "output": {"weight": A("embed", "vocab")},
    }
    att = axes["layers"]["attention"]
    if args.lora_rank > 0:
        for name in ("wq", "wk", "wv"):
            att[name]["lora_a"] = A("layers", "embed", None)
            att[name]["lora_b"] = A("layers", None, "heads")
        att["wo"]["lora_a"] = A("layers", "heads", None)
        att["wo"]["lora_b"] = A("layers", None, "embed")
    if args.bias_tuning:
        for name in ("wq", "wk", "wv"):
            att[name]["bias"] = A("layers", "heads")
        att["wo"]["bias"] = A("layers", None)
    return axes


def init_kv_cache(args: MixtralArgs, batch: int, max_len: Optional[int] = None,
                  dtype=None, stacked: bool = True,
                  kv_dtype: Optional[str] = None) -> Dict[str, jnp.ndarray]:
    # identical contract to models.llama.init_kv_cache (incl. int8 pools);
    # only generic arch fields (n_layers/kv_heads/head_dim/dtype) are used
    from accessory_tpu.models import llama as _llama

    return _llama.init_kv_cache(args, batch, max_len, dtype, stacked,
                                kv_dtype)


def cache_axes() -> Dict[str, Tuple]:
    return {"k": ("layers", "batch", "heads", None, None),
            "v": ("layers", "batch", "heads", None, None)}


def _block(h, layer, args: MixtralArgs, cos, sin, q_offset, kv_len,
           cache_k=None, cache_v=None, moe_impl="ragged", balance=False,
           update_cache=False, cache_ks=None, cache_vs=None, attn_fn=None):
    b, sq, _ = h.shape
    hd, nq, nkv = args.head_dim, args.n_heads, args.kv_heads
    att = layer["attention"]

    x = rms_norm(h, layer["attention_norm"]["weight"], args.norm_eps)
    q = module_linear(x, att["wq"]).reshape(b, sq, nq, hd)
    k = module_linear(x, att["wk"]).reshape(b, sq, nkv, hd)
    v = module_linear(x, att["wv"]).reshape(b, sq, nkv, hd)
    q = apply_rope(q, cos, sin, args.rope_style)
    k = apply_rope(k, cos, sin, args.rope_style)

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
        # read-only cache + two-part softmax (see ops.attention.cached_attention)
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

    h = h + module_linear(out.reshape(b, sq, nq * hd), att["wo"])

    x = rms_norm(h, layer["ffn_norm"]["weight"], args.norm_eps)
    ff = layer["feed_forward"]
    y, aux = moe_ffn(
        x.reshape(b * sq, args.dim),
        ff["gate"]["weight"], ff["w1"]["weight"], ff["w3"]["weight"],
        ff["w2"]["weight"], k=args.num_experts_per_tok,
        balance_weight=args.load_balancing_weight if balance else None,
        impl=moe_impl,
    )
    h = h + y.reshape(b, sq, args.dim)
    if update_cache and wk is not None:
        if wks is not None:
            return h, (wk, wv, wks, wvs), None, aux
        return h, wk, wv, aux
    return h, k, v, aux


def forward(
    params: Params,
    args: MixtralArgs,
    tokens: jnp.ndarray,
    *,
    cache: Optional[Dict[str, jnp.ndarray]] = None,
    cur_pos=0,
    remat: bool = False,
    attn_fn=None,
    embeds: Optional[jnp.ndarray] = None,
    moe_impl: str = "ragged",
    with_aux_loss: bool = False,
):
    """Unified forward, same contract as models.llama.forward.

    Training with ``with_aux_loss=True`` additionally returns the summed MoE
    load-balancing loss (reference drains MoE.LOAD_BALANCING_LOSSES in
    Transformer.forward, mixtral_sparse.py:607-631) as third output.
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

    block = _block if attn_fn is None else functools.partial(
        _block, attn_fn=attn_fn)
    if remat:
        block = jax.checkpoint(
            block, policy=remat_policy(remat),
            static_argnums=(2, 9, 10))

    balance = with_aux_loss and cache is None

    if cache is not None and isinstance(params["layers"], (list, tuple)):
        # unrolled decode loop over unstacked layers — scan-sliced Pallas
        # operands materialize a copy per layer (see models.llama.forward)
        fused = sq == 1  # fused attention+cache-update kernel at decode
        int8_kv = "ks" in cache
        new_k, new_v, new_ks, new_vs = [], [], [], []
        for i, (layer, ck, cv) in enumerate(
                zip(params["layers"], cache["k"], cache["v"])):
            cks = cache["ks"][i] if int8_kv else None
            cvs = cache["vs"][i] if int8_kv else None
            if fused and int8_kv:
                h, pools, _, _ = _block(h, layer, args, cos, sin, cur_pos,
                                        kv_len, ck, cv, moe_impl, False,
                                        True, cks, cvs)
                wk, wv, wks, wvs = pools
            else:
                h, k_new, v_new, _ = _block(h, layer, args, cos, sin,
                                            cur_pos, kv_len, ck, cv,
                                            moe_impl, False, fused, cks, cvs)
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
        aux_total = None
    elif cache is not None and "ks" in cache:
        def body(h, xs):
            layer, ck, cv, cks, cvs = xs
            # _block directly: remat never applies to cached inference
            h, k_new, v_new, _ = _block(h, layer, args, cos, sin, cur_pos,
                                        kv_len, ck, cv, moe_impl, False,
                                        False, cks, cvs)
            return h, (k_new, v_new)

        h, (new_k, new_v) = jax.lax.scan(
            body, h, (params["layers"], cache["k"], cache["v"],
                      cache["ks"], cache["vs"]))
        wk, wv, wks, wvs = write_kv_t8(cache["k"], cache["v"], cache["ks"],
                                       cache["vs"], new_k, new_v, cur_pos)
        new_cache = {"k": wk, "v": wv, "ks": wks, "vs": wvs}
        aux_total = None
    elif cache is not None:
        def body(h, xs):
            layer, ck, cv = xs
            h, k_new, v_new, _ = block(h, layer, args, cos, sin, cur_pos,
                                       kv_len, ck, cv, moe_impl, False)
            return h, (k_new, v_new)

        h, (new_k, new_v) = jax.lax.scan(
            body, h, (params["layers"], cache["k"], cache["v"]))
        wk, wv = write_kv_t(cache["k"], cache["v"], new_k, new_v, cur_pos)
        new_cache = {"k": wk, "v": wv}
        aux_total = None
    elif isinstance(params["layers"], (list, tuple)):
        # cache-free scoring on unstacked params (compute_logits path)
        aux_total = jnp.zeros((), jnp.float32)
        for layer in params["layers"]:
            h, _, _, aux = block(h, layer, args, cos, sin, 0, None,
                                 None, None, moe_impl, balance)
            if aux is not None:
                aux_total = aux_total + aux
        new_cache = None
    else:
        def body(carry, layer):
            h, aux_acc = carry
            h, _, _, aux = block(h, layer, args, cos, sin, 0, None,
                                 None, None, moe_impl, balance)
            if aux is not None:
                aux_acc = aux_acc + aux
            return (h, aux_acc), None

        (h, aux_total), _ = jax.lax.scan(
            body, (h, jnp.zeros((), jnp.float32)), params["layers"])
        new_cache = None

    h = rms_norm(h, params["norm"]["weight"], args.norm_eps)
    logits = linear(h, params["output"]["weight"]).astype(jnp.float32)
    if with_aux_loss:
        return logits, new_cache, aux_total
    return logits, new_cache


# ---------------------------------------------------------------------------
# paged decode path (BASELINE config 3: Mixtral W4 top-2 MoE decode)
# ---------------------------------------------------------------------------

def init_paged_cache(args: MixtralArgs, slots: int, total_pages: int,
                     page_size: int = 64, pages_per_seq: Optional[int] = None,
                     dtype=None, kv_dtype: Optional[str] = None):
    from accessory_tpu.engine.kvcache import init_paged_cache as _init

    # kv_dtype=None resolves inside engine.kvcache.init_paged_cache
    pages_per_seq = pages_per_seq or (args.max_seq_len // page_size)
    return _init(args.n_layers, args.kv_heads, args.head_dim, total_pages,
                 page_size, slots, pages_per_seq,
                 dtype=dtype or jnp.dtype(args.dtype), kv_dtype=kv_dtype)


def forward_paged(params: Params, args: MixtralArgs, tokens: jnp.ndarray,
                  pcache, moe_impl: str = "ragged",
                  active_pages: Optional[int] = None,
                  continuation: bool = False):
    """Paged-cache forward, same contract as llama.forward_paged
    (incl. ``continuation=True`` chunked prefill at per-slot offsets)."""
    import dataclasses

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
        pos = pcache.lengths
        cos = jnp.take(cos_full, pos, axis=0)[:, None, :]
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
    int8_kv = pcache.ks_pages is not None

    def paged_block(h, layer, kp, vp, kps=None, vps=None, li=None):
        att = layer["attention"]
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

        h = h + module_linear(out.reshape(b, sq, nq * hd), att["wo"])
        x = rms_norm(h, layer["ffn_norm"]["weight"], args.norm_eps)
        ff = layer["feed_forward"]
        y, _ = moe_ffn(
            x.reshape(b * sq, args.dim), ff["gate"]["weight"],
            ff["w1"]["weight"], ff["w3"]["weight"], ff["w2"]["weight"],
            k=args.num_experts_per_tok, impl=moe_impl)
        h = h + y.reshape(b, sq, args.dim)
        return h, k, v

    if isinstance(params["layers"], (list, tuple)):
        # unrolled paged decode (serving layout — see llama.forward_paged):
        # pools pass WHOLE with the static layer index so the Pallas paged
        # kernel DMAs from the right layer directly; scan-sliced pools
        # feeding the kernel materialize full-layer copies per step
        nk, nv = [], []
        for i, layer in enumerate(params["layers"]):
            h, k, v = paged_block(
                h, layer, pcache.k_pages, pcache.v_pages,
                pcache.ks_pages if int8_kv else None,
                pcache.vs_pages if int8_kv else None, li=i)
            nk.append(k)
            nv.append(v)
        new_k, new_v = jnp.stack(nk), jnp.stack(nv)
    else:
        def body(h, xs):
            layer, kp, vp = xs[:3]
            kps, vps = (xs[3], xs[4]) if int8_kv else (None, None)
            h, k, v = paged_block(h, layer, kp, vp, kps, vps)
            return h, (k, v)

        xs = (params["layers"], pcache.k_pages, pcache.v_pages)
        if int8_kv:
            xs = xs + (pcache.ks_pages, pcache.vs_pages)
        h, (new_k, new_v) = jax.lax.scan(body, h, xs)

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

    h = rms_norm(h, params["norm"]["weight"], args.norm_eps)
    logits = linear(h, params["output"]["weight"]).astype(jnp.float32)
    return logits, new_cache
