"""LLaMA + BLIP-2 Q-Former visual branch (llama_qformerv2 family).

Behavioral reference: accessory/model/LLM/llama_qformerv2.py:265-310 —
frozen BLIP-2 (vision tower + Q-Former) produces 32 image tokens (768-d) →
qformer_proj (Linear + LayerNorm → dim), learned start_img/end_img tags, the
qformer is excluded from trainable params and quantization.

The decoder and generation plumbing are llama's; this module only swaps the
visual branch (vs SPHINX's four-tower ensemble).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from accessory_tpu.config import SphinxArgs
from accessory_tpu.models import llama
from accessory_tpu.models.visual import (
    QFormerConfig,
    ViTConfig,
    init_qformer,
    init_vit,
    qformer_forward,
    vit_forward,
)
from accessory_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


def _cfgs(args: SphinxArgs):
    vit = ViTConfig(image_size=224, patch_size=args.vit_patch,
                    width=args.clip_width, layers=args.clip_layers,
                    heads=args.clip_heads)
    qf = QFormerConfig(n_queries=32, width=args.qformer_width,
                       layers=args.qformer_layers, heads=args.qformer_heads,
                       kv_dim=args.clip_width)
    return vit, qf


def image_words(args: SphinxArgs) -> int:
    return 32 + 2  # queries + start/end tags


def init_params(key: jax.Array, args: SphinxArgs) -> Params:
    params = llama.init_params(key, args)
    vit, qf = _cfgs(args)
    ks = jax.random.split(jax.random.fold_in(key, 29), 5)
    d = args.dim
    params["visual"] = {
        "vision_tower": init_vit(ks[0], vit, jnp.float32),
        "qformer": init_qformer(ks[1], qf, jnp.float32),
        "qformer_proj": {
            "linear": {"weight": jax.random.normal(ks[2], (qf.width, d)) * qf.width ** -0.5,
                       "bias": jnp.zeros((d,), jnp.float32)},
            "norm": {"weight": jnp.ones((d,), jnp.float32),
                     "bias": jnp.zeros((d,), jnp.float32)},
        },
        "start_img": jax.random.uniform(ks[3], (1, 1, d), jnp.float32),
        "end_img": jax.random.uniform(ks[4], (1, 1, d), jnp.float32),
    }
    return params


def param_axes(args: SphinxArgs) -> Params:
    axes = llama.param_axes(args)
    vis_shape = jax.eval_shape(
        lambda: init_params(jax.random.PRNGKey(0), args))["visual"]
    axes["visual"] = jax.tree.map(lambda _: None, vis_shape)
    return axes


def get_quant_blocklist(args: SphinxArgs):
    return ["visual", "qformer", "vision_tower"]


def get_trainable_params_filter(args: SphinxArgs):
    base = llama.get_trainable_params_filter(args)

    def f(name: str) -> bool:
        # qformer stays frozen; the projection + tags train (reference
        # get_trainable_params excludes "qformer." prefixed params)
        if name.startswith("visual/qformer/") or name.startswith("visual/vision_tower/"):
            return False
        return base(name) or name.startswith("visual/")

    return f


def encode_image(params: Params, args: SphinxArgs, images: jnp.ndarray) -> jnp.ndarray:
    """(b, 3, 224, 224) → (b, 34, dim): [start_img] + 32 queries + [end_img]."""
    vit, qf = _cfgs(args)
    vis = params["visual"]
    feats = vit_forward(vis["vision_tower"], vit, images.astype(jnp.float32))
    qtok = qformer_forward(vis["qformer"], qf, feats)  # (b, 32, 768)
    proj = vis["qformer_proj"]
    qtok = jnp.dot(qtok, proj["linear"]["weight"]) + proj["linear"]["bias"]
    qtok = layer_norm(qtok, proj["norm"]["weight"], proj["norm"]["bias"])
    b = qtok.shape[0]
    start = jnp.broadcast_to(vis["start_img"], (b, 1, args.dim))
    end = jnp.broadcast_to(vis["end_img"], (b, 1, args.dim))
    return jnp.concatenate([start, qtok, end], axis=1).astype(jnp.dtype(args.dtype))


init_kv_cache = llama.init_kv_cache
# decoder delegates to the base model forward, which supports the
# trace-time-unrolled decode loop on unstacked layers
SUPPORTS_UNROLLED_DECODE = True
# cache creation + forward delegate to the base model — int8 KV works
SUPPORTS_KV_INT8 = True
# the delegated llama._block consumes fused wqkv/w13 (quant/fuse.py)
SUPPORTS_FUSED_QKV = True

cache_axes = llama.cache_axes


def forward(params, args, tokens, *, cache=None, cur_pos=0, remat=False,
            embeds=None, images=None):
    if images is not None:
        img = encode_image(params, args, images)
        tok_emb = jnp.take(params["tok_embeddings"]["weight"], tokens, axis=0)
        embeds = jnp.concatenate([tok_emb[:, :1], img, tok_emb[:, 1:]], axis=1)
        logits, new_cache = llama.forward(
            params, args, tokens, cache=cache, cur_pos=cur_pos, remat=remat,
            embeds=embeds)
        if cache is None:
            logits = logits[:, image_words(args):]
        return logits, new_cache
    return llama.forward(params, args, tokens, cache=cache, cur_pos=cur_pos,
                         remat=remat, embeds=embeds)
