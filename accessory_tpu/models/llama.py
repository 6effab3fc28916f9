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
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from accessory_tpu.config import LLaMAArgs
from accessory_tpu.ops.attention import attention
from accessory_tpu.ops.linear import linear
from accessory_tpu.ops.norms import rms_norm
from accessory_tpu.ops.rope import apply_rope, precompute_rope

Params = Dict[str, Any]


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

    ks = jax.random.split(key, 10)
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
    return params


def param_axes(args: LLaMAArgs) -> Params:
    """Logical sharding axes, same tree structure as params.

    Names resolve through accessory_tpu.parallel.sharding rules; the defaults
    put "heads"/"ffn" on the tp mesh axis and "embed" on fsdp — exactly where
    FairScale shards (column = out dim, row = in dim, embed = vocab dim 0 in
    our (vocab, dim) layout → shard "vocab" on tp).
    """
    A = lambda *names: tuple(names)  # noqa: E731
    return {
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


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

def init_kv_cache(args: LLaMAArgs, batch: int, max_len: Optional[int] = None,
                  dtype=None) -> Dict[str, jnp.ndarray]:
    """Static per-layer KV cache, stacked on the layer axis.

    TPU version of the reference's lazily-allocated (max_bsz, max_seq, n_kv,
    hd) tensors (llama.py:210-215, 429-435) — here allocation is explicit and
    the buffers are donated through decode steps so XLA updates in place.
    """
    max_len = max_len or args.max_seq_len
    dtype = dtype or jnp.dtype(args.dtype)
    shape = (args.n_layers, batch, max_len, args.kv_heads, args.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def cache_axes() -> Dict[str, Tuple]:
    return {"k": ("layers", "batch", None, "heads", None),
            "v": ("layers", "batch", None, "heads", None)}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _block(h, layer, args: LLaMAArgs, cos, sin, q_offset, kv_len,
           cache_k=None, cache_v=None):
    """One transformer block; returns (h, new_cache_k, new_cache_v)."""
    b, sq, _ = h.shape
    hd, nq, nkv = args.head_dim, args.n_heads, args.kv_heads
    att = layer["attention"]

    x = rms_norm(h, layer["attention_norm"]["weight"], args.norm_eps)
    q = linear(x, att["wq"]["weight"]).reshape(b, sq, nq, hd)
    k = linear(x, att["wk"]["weight"]).reshape(b, sq, nkv, hd)
    v = linear(x, att["wv"]["weight"]).reshape(b, sq, nkv, hd)
    q = apply_rope(q, cos, sin, args.rope_style)
    k = apply_rope(k, cos, sin, args.rope_style)

    if cache_k is not None:
        # write new kv at [q_offset, q_offset+sq), attend over whole cache
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k.astype(cache_k.dtype), (0, q_offset, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v.astype(cache_v.dtype), (0, q_offset, 0, 0))
        out = attention(q, cache_k, cache_v, causal=True,
                        q_offset=q_offset, kv_len=kv_len)
    else:
        out = attention(q, k, v, causal=True, q_offset=0)

    h = h + linear(out.reshape(b, sq, nq * hd), att["wo"]["weight"])

    x = rms_norm(h, layer["ffn_norm"]["weight"], args.norm_eps)
    ff = layer["feed_forward"]
    gate = jax.nn.silu(linear(x, ff["w1"]["weight"]))
    h = h + linear(gate * linear(x, ff["w3"]["weight"]), ff["w2"]["weight"])
    return h, cache_k, cache_v


def forward(
    params: Params,
    args: LLaMAArgs,
    tokens: jnp.ndarray,
    *,
    cache: Optional[Dict[str, jnp.ndarray]] = None,
    cur_pos=0,
    remat: bool = False,
    embeds: Optional[jnp.ndarray] = None,
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
    b, sq = tokens.shape
    h = embeds if embeds is not None else (
        jnp.take(params["tok_embeddings"]["weight"], tokens, axis=0))

    max_rope = (cache["k"].shape[2] if cache is not None else sq)
    cos_full, sin_full = precompute_rope(
        args.head_dim, max_rope, args.rope_theta, args.rope_scaling)
    if cache is not None:
        cos = jax.lax.dynamic_slice_in_dim(cos_full, cur_pos, sq, 0)
        sin = jax.lax.dynamic_slice_in_dim(sin_full, cur_pos, sq, 0)
        kv_len = cur_pos + sq
    else:
        cos, sin = cos_full[:sq], sin_full[:sq]
        kv_len = None

    block = _block
    if remat:
        block = jax.checkpoint(
            _block, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            static_argnums=(2,))

    if cache is not None:
        def body(h, xs):
            layer, ck, cv = xs
            h, ck, cv = block(h, layer, args, cos, sin, cur_pos, kv_len, ck, cv)
            return h, (ck, cv)

        h, (new_k, new_v) = jax.lax.scan(
            body, h, (params["layers"], cache["k"], cache["v"]))
        new_cache = {"k": new_k, "v": new_v}
    else:
        def body(h, layer):
            h, _, _ = block(h, layer, args, cos, sin, 0, None)
            return h, None

        h, _ = jax.lax.scan(body, h, params["layers"])
        new_cache = None

    h = rms_norm(h, params["norm"]["weight"], args.norm_eps)
    logits = linear(h, params["output"]["weight"]).astype(jnp.float32)
    return logits, new_cache
