"""SPHINX multimodal LLaMA (llama_ens family) — JAX implementation.

Behavioral reference: accessory/model/LLM/llama_ens.py (visual ensemble
:278-339, MP-sharded encode_image :377-449, token splice :473-503) and
llama_ens5.py (448px 5-crop decomposition :377-385), llama_ens_light.py
(ConvNeXt+DINOv2 only).

Ensemble per image (matching reference token-count math exactly):
  * Q-Former: 32 tokens (768-d) → qformer_proj → dim
  * CLIP ViT-L/14 @224: 257 tokens (1024-d)
  * ConvNeXt-XXL @256 (resized): 8×8 → 2× nearest-upsample → 256 (+mean cls)
    = 257 tokens (3072-d)
  * DINOv2 ViT-g/14 (renormalized from CLIP stats): 257 tokens (1536-d)
  * concat last three per-token (5632-d) → visual_proj → dim
  * sequence: [start_img] + 32 + 257 + [end_img] → image_words = 32+257+2

TPU differences: the reference shards the image batch over the MP group with
all_gather (llama_ens.py:386-398); under GSPMD the encoders are part of the
same jitted program and the mesh handles placement — we annotate the image
batch with the dp axis and let XLA distribute.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from accessory_tpu.config import SphinxArgs
from accessory_tpu.models import llama
from accessory_tpu.models.visual import (
    ConvNeXtConfig,
    QFormerConfig,
    ViTConfig,
    convnext_forward,
    init_convnext,
    init_qformer,
    init_vit,
    qformer_forward,
    vit_forward,
)
from accessory_tpu.ops.norms import layer_norm

Params = Dict[str, Any]

CLIP_MEAN = jnp.array([0.48145466, 0.4578275, 0.40821073])
CLIP_STD = jnp.array([0.26862954, 0.26130258, 0.27577711])
DINO_MEAN = jnp.array([0.485, 0.456, 0.406])
DINO_STD = jnp.array([0.229, 0.224, 0.225])


def _tower_cfgs(args: SphinxArgs):
    vit = ViTConfig(image_size=224, patch_size=args.vit_patch,
                    width=args.clip_width, layers=args.clip_layers,
                    heads=args.clip_heads, act="quick_gelu")
    # DINOv2 block style (facebook/dinov2-giant): LayerScale + SwiGLU FFN,
    # no pre-LN, eps 1e-6 — required for real-weight import
    # (checkpoint/visual_import.convert_hf_dinov2)
    dino = ViTConfig(image_size=224, patch_size=args.vit_patch,
                     width=args.dino_width, layers=args.dino_layers,
                     heads=args.dino_heads, act="gelu", ln_pre=False,
                     layerscale=True, ffn="swiglu", norm_eps=1e-6,
                     patch_bias=True)
    conv = ConvNeXtConfig(depths=tuple(args.convnext_depths),
                          dims=tuple(args.convnext_dims))
    qf = QFormerConfig(n_queries=32, width=args.qformer_width,
                       layers=args.qformer_layers, heads=args.qformer_heads,
                       kv_dim=args.clip_width)
    return vit, dino, conv, qf


def words_per_crop(args: SphinxArgs) -> int:
    vit, *_ = _tower_cfgs(args)
    n_vis = vit.n_tokens  # 257 at production size
    if args.visual == "ens_light":
        return n_vis + 2  # reference llama_ens_light: no qformer
    return 32 + n_vis + 2


def n_crops(args: SphinxArgs) -> int:
    """1 for single-view variants; g²+1 for multi-crop (1 global resize + a
    g×g tile grid): ens5 = 448px → 2x2+1 = 5 (llama_ens5.py:381-385),
    ens10-style = 672px → 3x3+1 = 10 (llama_ens10.py)."""
    if not ("5" in args.visual or args.image_size > 224):
        return 1
    g = max(args.image_size // 224, 1)
    return 1 if g == 1 else g * g + 1


def image_words(args: SphinxArgs) -> int:
    if args.visual == "ens5p2":
        # reference llama_ens5p2.py:335: 32+257+2 main view + per sub-crop
        # 32 qformer + 1 cls + (patches/4) pooled + 2 tags
        vit, *_ = _tower_cfgs(args)
        main = 32 + vit.n_tokens + 2
        part = 32 + 1 + vit.n_patches // 4 + 2
        return main + part * (n_crops(args) - 1)
    return words_per_crop(args) * n_crops(args)


def init_params(key: jax.Array, args: SphinxArgs) -> Params:
    params = llama.init_params(key, args)
    kv = jax.random.split(jax.random.fold_in(key, 17), 8)
    vit, dino, conv, qf = _tower_cfgs(args)
    d = args.dim
    vdtype = jnp.float32  # visual towers stay fp32 (reference :280-281)
    light = args.visual.startswith("ens_light") or args.visual.startswith("ens5_light")

    ens_dim = conv.dims[-1] + dino.width + (0 if light else vit.width)
    visual: Params = {
        "convnext": init_convnext(kv[2], conv, vdtype),
        "dinov2": init_vit(kv[3], dino, vdtype),
        "visual_proj": {
            "linear": {"weight": _dense(kv[4], (ens_dim, d)),
                       "bias": jnp.zeros((d,), vdtype)},
            "norm": {"weight": jnp.ones((d,), vdtype),
                     "bias": jnp.zeros((d,), vdtype)},
        },
        "start_img": jax.random.uniform(kv[5], (1, 1, d), jnp.float32),
        "end_img": jax.random.uniform(kv[6], (1, 1, d), jnp.float32),
    }
    if not light:
        visual["clip"] = init_vit(kv[0], vit, vdtype)
        visual["qformer"] = init_qformer(kv[1], qf, vdtype)
        visual["qformer_proj"] = {
            "linear": {"weight": _dense(kv[7], (qf.width, d)),
                       "bias": jnp.zeros((d,), vdtype)},
            "norm": {"weight": jnp.ones((d,), vdtype),
                     "bias": jnp.zeros((d,), vdtype)},
        }
    params["visual"] = visual
    return params


def _dense(k, shape):
    return jax.random.normal(k, shape, jnp.float32) * shape[-2] ** -0.5


def param_axes(args: SphinxArgs) -> Params:
    axes = llama.param_axes(args)
    # visual towers replicate (frozen, small relative to the LLM)
    axes["visual"] = jax.tree.map(lambda _: None, _VisualShape(args).tree)
    return axes


class _VisualShape:
    """Helper producing a tree shaped like params['visual'] for axes maps."""

    def __init__(self, args: SphinxArgs):
        self.tree = jax.eval_shape(
            lambda: init_params(jax.random.PRNGKey(0), args))["visual"]


def get_quant_blocklist(args: SphinxArgs):
    """Visual modules are never quantized (reference llama_ens.py:523-532)."""
    return ["visual", "qformer", "clip", "convnext", "dinov2"]


def get_trainable_params_filter(args: SphinxArgs):
    base = llama.get_trainable_params_filter(args)
    return lambda name: base(name) and not name.startswith("visual/")


def _split_crops(args: SphinxArgs, images: jnp.ndarray) -> jnp.ndarray:
    """(b, 3, S, S) → (b·n_crops, 3, 224, 224): 1 resized global view + a
    g×g grid of 224px tiles (reference llama_ens5.py:381-385 for g=2;
    llama_ens10's wide grid for g=3)."""
    n = n_crops(args)
    if n == 1:
        return images
    b = images.shape[0]
    g = max(args.image_size // 224, 1)
    views = [jax.image.resize(images, (b, 3, 224, 224), "linear")]
    for i in range(g):
        for j in range(g):
            views.append(images[:, :, i * 224:(i + 1) * 224,
                                j * 224:(j + 1) * 224])
    return jnp.stack(views, axis=1).reshape(b * n, 3, 224, 224)


def encode_image(params: Params, args: SphinxArgs,
                 images: jnp.ndarray) -> jnp.ndarray:
    """images (b, 3, S, S) CLIP-normalized → (b, image_words, dim) fp tokens.

    Mirrors llama_ens.encode_image + the forward-side start/end splice
    (llama_ens.py:392-445, :483-492).
    """
    vis = params["visual"]
    vit, dino, conv, qf = _tower_cfgs(args)
    light = "clip" not in vis
    crops = _split_crops(args, images).astype(jnp.float32)
    bc = crops.shape[0]

    feats = []
    if not light:
        clip_feats = vit_forward(vis["clip"], vit, crops)  # (bc, 257, w)
        feats.append(clip_feats)

    # convnext on 256px (reference F.interpolate to 256), 8x8 → 16x16 upsample
    conv_in = jax.image.resize(crops, (bc, 3, 256, 256), "linear")
    cf = convnext_forward(vis["convnext"], conv, conv_in)  # (bc, 64, C)
    g = int(round(cf.shape[1] ** 0.5))
    cf2 = cf.reshape(bc, g, g, -1)
    cf2 = jnp.repeat(jnp.repeat(cf2, 2, axis=1), 2, axis=2).reshape(bc, 4 * g * g, -1)
    cf2 = jnp.concatenate([jnp.mean(cf2, axis=1, keepdims=True), cf2], axis=1)
    # pad/crop token count to match the ViT grid (256 + cls at production)
    n_tok = vit.n_tokens
    if cf2.shape[1] != n_tok:
        cf2 = cf2[:, :n_tok] if cf2.shape[1] > n_tok else jnp.pad(
            cf2, ((0, 0), (0, n_tok - cf2.shape[1]), (0, 0)))
    feats.append(cf2)

    # dinov2 with renormalization from CLIP stats (reference :421-427)
    mean_c = CLIP_MEAN.reshape(1, 3, 1, 1)
    std_c = CLIP_STD.reshape(1, 3, 1, 1)
    mean_d = DINO_MEAN.reshape(1, 3, 1, 1)
    std_d = DINO_STD.reshape(1, 3, 1, 1)
    dino_in = (crops * std_c + mean_c - mean_d) / std_d
    feats.append(vit_forward(vis["dinov2"], dino, dino_in))

    ens = jnp.concatenate(feats, axis=2)  # (bc, 257, ens_dim)
    vp = vis["visual_proj"]
    ens = jnp.dot(ens, vp["linear"]["weight"]) + vp["linear"]["bias"]
    ens = layer_norm(ens, vp["norm"]["weight"], vp["norm"]["bias"])

    if not light:
        qfeat = qformer_forward(vis["qformer"], qf, clip_feats)  # (bc, 32, 768)
        qp = vis["qformer_proj"]
        qfeat = jnp.dot(qfeat, qp["linear"]["weight"]) + qp["linear"]["bias"]
        qfeat = layer_norm(qfeat, qp["norm"]["weight"], qp["norm"]["bias"])
        tokens = jnp.concatenate([qfeat, ens], axis=1)
    else:
        tokens = ens

    k = n_crops(args)
    b = bc // k

    if args.visual == "ens5p2" and k > 1:
        # exact ens5p2 word layout (llama_ens5p2.py:377-460): the main view
        # keeps all patch tokens; each sub-crop's 16x16 patch grid is
        # bilinearly pooled 2x to 8x8 (cls kept). We pool AFTER visual_proj
        # — bilinear resize and the linear projection commute exactly, the
        # reference pools the 5632-d pre-proj features.
        d = args.dim
        n_tok = ens.shape[1]
        qf_ = qfeat.reshape(b, k, qfeat.shape[1], d)
        ens_ = ens.reshape(b, k, n_tok, d)
        views = [jnp.concatenate([qf_[:, 0], ens_[:, 0]], axis=1)]
        gg = int(round((n_tok - 1) ** 0.5))
        for v in range(1, k):
            pv = ens_[:, v]
            cls, patch = pv[:, :1], pv[:, 1:1 + gg * gg]
            patch = patch.reshape(b, gg, gg, d)
            patch = jax.image.resize(patch, (b, gg // 2, gg // 2, d),
                                     "linear")
            patch = patch.reshape(b, (gg // 2) ** 2, d)
            views.append(jnp.concatenate([qf_[:, v], cls, patch], axis=1))
        out = []
        for vtok in views:
            s = jnp.broadcast_to(vis["start_img"], (b, 1, d))
            e = jnp.broadcast_to(vis["end_img"], (b, 1, d))
            out.append(jnp.concatenate([s, vtok, e], axis=1))
        tokens = jnp.concatenate(out, axis=1)
        return tokens.astype(jnp.dtype(args.dtype))

    start = jnp.broadcast_to(vis["start_img"], (bc, 1, args.dim))
    end = jnp.broadcast_to(vis["end_img"], (bc, 1, args.dim))
    tokens = jnp.concatenate([start, tokens, end], axis=1)  # (bc, wpc, dim)

    tokens = tokens.reshape(b, k * tokens.shape[1], args.dim)
    return tokens.astype(jnp.dtype(args.dtype))


# LLM passthroughs: SPHINX's decoder IS llama's (same params subtree)
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
    """llama forward with an optional image prefix: when ``images`` given at
    prefill, embeds = [bos, image tokens, rest of text] (reference
    llama_ens.py:483-492 places the image after the leading BOS)."""
    if images is not None:
        img_tokens = encode_image(params, args, images)
        tok_emb = jnp.take(params["tok_embeddings"]["weight"], tokens, axis=0)
        embeds = jnp.concatenate(
            [tok_emb[:, :1], img_tokens, tok_emb[:, 1:]], axis=1)
        logits, new_cache = llama.forward(
            params, args, tokens, cache=cache, cur_pos=cur_pos, remat=remat,
            embeds=embeds)
        if cache is None:
            # training: drop image positions (reference llama_ens forward
            # returns output(h[:, image_words:]))
            logits = logits[:, image_words(args):]
        return logits, new_cache
    return llama.forward(params, args, tokens, cache=cache, cur_pos=cur_pos,
                         remat=remat, embeds=embeds)
