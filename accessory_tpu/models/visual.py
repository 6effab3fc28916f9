"""Visual encoders for SPHINX: ViT (CLIP-L / DINOv2-g), ConvNeXt, Q-Former.

Behavioral reference: accessory/model/LLM/llama_ens.py:278-333 — SPHINX's
mixed visual ensemble is (a) BLIP-2 Q-Former (32 tokens, 768-d), (b)
CLIP ViT-L/14 with projection removed (257 tokens, 1024-d), (c) OpenCLIP
ConvNeXt-XXL features (3072-d), (d) DINOv2 ViT-g/14 (1536-d). The reference
imports these from open_clip/transformers; here each architecture is
implemented natively in JAX (patch/conv stems, pre-norm transformer blocks,
depthwise ConvNeXt stages, cross-attention Q-Former) so the whole prefill is
one XLA program — no torch dependency on the image path.

All encoders are frozen at finetune time (reference get_trainable_params
excludes them) and quant-blocklisted (llama_ens.py:523-532).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from accessory_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# ViT (CLIP-style: cls token + learned pos emb + pre-norm blocks)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_ratio: float = 4.0
    act: str = "quick_gelu"  # CLIP uses QuickGELU; DINOv2 exact GELU
    ln_pre: bool = True      # CLIP has a pre-transformer LN; DINOv2 none
    norm_eps: float = 1e-5   # CLIP 1e-5; DINOv2 1e-6
    layerscale: bool = False  # DINOv2: per-block residual scaling (ls1/ls2)
    ffn: str = "mlp"         # "mlp" | "swiglu" (DINOv2-giant)
    patch_bias: bool = False  # DINOv2 patch conv has a bias; CLIP none

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def n_tokens(self) -> int:
        return self.n_patches + 1  # + cls

    @property
    def ffn_hidden(self) -> int:
        if self.ffn == "swiglu":
            # HF Dinov2SwiGLUFFN: 2/3 of mlp hidden, rounded up to 8
            h = int(self.width * self.mlp_ratio)
            return (int(h * 2 / 3) + 7) // 8 * 8
        return int(self.width * self.mlp_ratio)


CLIP_VIT_L14 = ViTConfig()
# facebook/dinov2-giant: LayerScale + SwiGLU FFN, exact GELU-free (swiglu),
# no pre-transformer LN (HF Dinov2Model layout)
DINOV2_VIT_G14 = ViTConfig(image_size=224, patch_size=14, width=1536,
                           layers=40, heads=24, act="gelu", ln_pre=False,
                           layerscale=True, ffn="swiglu", norm_eps=1e-6,
                           patch_bias=True)


def init_vit(key: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 8)
    w = cfg.width
    L = cfg.layers
    mlp = cfg.ffn_hidden
    scale = w ** -0.5

    def dense(k, shape, s=None):
        return (jax.random.normal(k, shape, jnp.float32)
                * (s or shape[-2] ** -0.5)).astype(dtype)

    if cfg.ffn == "swiglu":
        ffn = {
            # weights_in packs [gate; up] along out (HF Dinov2SwiGLUFFN)
            "fc1": {"weight": dense(ks[5], (L, w, 2 * mlp)),
                    "bias": jnp.zeros((L, 2 * mlp), dtype)},
            "fc2": {"weight": dense(ks[6], (L, mlp, w)),
                    "bias": jnp.zeros((L, w), dtype)},
        }
    else:
        ffn = {
            "fc1": {"weight": dense(ks[5], (L, w, mlp)),
                    "bias": jnp.zeros((L, mlp), dtype)},
            "fc2": {"weight": dense(ks[6], (L, mlp, w)),
                    "bias": jnp.zeros((L, w), dtype)},
        }
    blocks = {
        "ln1": {"weight": jnp.ones((L, w), dtype), "bias": jnp.zeros((L, w), dtype)},
        "ln2": {"weight": jnp.ones((L, w), dtype), "bias": jnp.zeros((L, w), dtype)},
        "qkv": {"weight": dense(ks[3], (L, w, 3 * w)),
                "bias": jnp.zeros((L, 3 * w), dtype)},
        "proj": {"weight": dense(ks[4], (L, w, w)),
                 "bias": jnp.zeros((L, w), dtype)},
        **ffn,
    }
    if cfg.layerscale:
        blocks["ls1"] = jnp.ones((L, w), dtype)
        blocks["ls2"] = jnp.ones((L, w), dtype)
    patch = {"weight": dense(
        ks[0], (cfg.patch_size * cfg.patch_size * 3, w), 0.02)}
    if cfg.patch_bias:
        patch["bias"] = jnp.zeros((w,), dtype)
    out = {
        "patch_embed": patch,
        "cls_token": (jax.random.normal(ks[1], (1, 1, w)) * scale).astype(dtype),
        "pos_embed": (jax.random.normal(ks[2], (cfg.n_tokens, w)) * scale).astype(dtype),
        "blocks": blocks,
        "ln_post": {"weight": jnp.ones((w,), dtype), "bias": jnp.zeros((w,), dtype)},
    }
    if cfg.ln_pre:
        out["ln_pre"] = {"weight": jnp.ones((w,), dtype),
                         "bias": jnp.zeros((w,), dtype)}
    return out


def _attn(x, qkv_w, qkv_b, proj_w, proj_b, heads):
    b, t, w = x.shape
    hd = w // heads
    qkv = (jnp.dot(x, qkv_w) + qkv_b).reshape(b, t, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * hd ** -0.5
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, w)
    return jnp.dot(out, proj_w) + proj_b


def vit_forward(params: Params, cfg: ViTConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images: (b, 3, H, W) normalized → (b, n_tokens, width)."""
    b = images.shape[0]
    p = cfg.patch_size
    g = cfg.image_size // p
    # patchify: (b, 3, g, p, g, p) → (b, g*g, p*p*3)
    x = images.reshape(b, 3, g, p, g, p).transpose(0, 2, 4, 3, 5, 1)
    x = x.reshape(b, g * g, p * p * 3).astype(params["patch_embed"]["weight"].dtype)
    x = jnp.dot(x, params["patch_embed"]["weight"])
    if cfg.patch_bias:
        x = x + params["patch_embed"]["bias"]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"][None]
    if cfg.ln_pre:
        x = layer_norm(x, params["ln_pre"]["weight"], params["ln_pre"]["bias"],
                       eps=cfg.norm_eps)

    act = (lambda v: v * jax.nn.sigmoid(1.702 * v)) if cfg.act == "quick_gelu" \
        else (lambda v: jax.nn.gelu(v, approximate=False))

    def body(x, blk):
        h = layer_norm(x, blk["ln1"]["weight"], blk["ln1"]["bias"],
                       eps=cfg.norm_eps)
        h = _attn(h, blk["qkv"]["weight"], blk["qkv"]["bias"],
                  blk["proj"]["weight"], blk["proj"]["bias"], cfg.heads)
        if cfg.layerscale:
            h = h * blk["ls1"]
        x = x + h
        h = layer_norm(x, blk["ln2"]["weight"], blk["ln2"]["bias"],
                       eps=cfg.norm_eps)
        if cfg.ffn == "swiglu":
            gate_up = jnp.dot(h, blk["fc1"]["weight"]) + blk["fc1"]["bias"]
            g, u = jnp.split(gate_up, 2, axis=-1)
            h = jax.nn.silu(g) * u
        else:
            h = act(jnp.dot(h, blk["fc1"]["weight"]) + blk["fc1"]["bias"])
        h = jnp.dot(h, blk["fc2"]["weight"]) + blk["fc2"]["bias"]
        if cfg.layerscale:
            h = h * blk["ls2"]
        x = x + h
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return layer_norm(x, params["ln_post"]["weight"], params["ln_post"]["bias"],
                      eps=cfg.norm_eps)


# ---------------------------------------------------------------------------
# ConvNeXt (depthwise 7x7 + pointwise MLP stages)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    depths: Tuple[int, ...] = (3, 4, 30, 3)
    dims: Tuple[int, ...] = (384, 768, 1536, 3072)  # XXL
    norm_eps: float = 1e-6  # ConvNeXt LayerNorms are eps 1e-6 everywhere


CONVNEXT_XXL = ConvNeXtConfig()


def init_convnext(key: jax.Array, cfg: ConvNeXtConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 4 + sum(cfg.depths) * 4))

    def dense(shape, s=None):
        return (jax.random.normal(next(ks), shape, jnp.float32)
                * (s or shape[-2] ** -0.5 if len(shape) > 1 else 0.02)).astype(dtype)

    stages = []
    for si, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        if si == 0:
            down = {"conv": dense((4 * 4 * 3, dim), 0.02),
                    "conv_bias": jnp.zeros((dim,), dtype),
                    "norm": {"weight": jnp.ones((dim,), dtype),
                             "bias": jnp.zeros((dim,), dtype)}}
        else:
            prev = cfg.dims[si - 1]
            down = {"conv": dense((2 * 2 * prev, dim), 0.02),
                    "conv_bias": jnp.zeros((dim,), dtype),
                    "norm": {"weight": jnp.ones((prev,), dtype),
                             "bias": jnp.zeros((prev,), dtype)}}
        blocks = {
            "dw": dense((depth, 7 * 7, dim), 0.02),
            "dw_bias": jnp.zeros((depth, dim), dtype),
            "norm": {"weight": jnp.ones((depth, dim), dtype),
                     "bias": jnp.zeros((depth, dim), dtype)},
            "pw1": {"weight": dense((depth, dim, 4 * dim)),
                    "bias": jnp.zeros((depth, 4 * dim), dtype)},
            "pw2": {"weight": dense((depth, 4 * dim, dim)),
                    "bias": jnp.zeros((depth, dim), dtype)},
            "gamma": jnp.full((depth, dim), 1e-6, dtype),
        }
        stages.append({"down": down, "blocks": blocks})
    return {"stages": stages}


def _depthwise7(x, dw):
    """x: (b, h, w, c); dw: (49, c) depthwise 7x7 kernel."""
    b, h, w, c = x.shape
    k = dw.reshape(7, 7, 1, c)
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def convnext_forward(params: Params, cfg: ConvNeXtConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images (b, 3, H, W) → (b, (H/32)*(W/32), dims[-1]) feature tokens."""
    b, _, H, W = images.shape
    x = images.transpose(0, 2, 3, 1)  # NHWC

    for si, stage in enumerate(params["stages"]):
        if si == 0:
            bb, hh, ww, cc = x.shape
            x = x.reshape(bb, hh // 4, 4, ww // 4, 4, cc).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(bb, hh // 4, ww // 4, 4 * 4 * cc)
            x = jnp.dot(x, stage["down"]["conv"]) + stage["down"]["conv_bias"]
            x = layer_norm(x, stage["down"]["norm"]["weight"],
                           stage["down"]["norm"]["bias"], eps=cfg.norm_eps)
        else:
            x = layer_norm(x, stage["down"]["norm"]["weight"],
                           stage["down"]["norm"]["bias"], eps=cfg.norm_eps)
            bb, hh, ww, cc = x.shape
            x = x.reshape(bb, hh // 2, 2, ww // 2, 2, cc).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(bb, hh // 2, ww // 2, 2 * 2 * cc)
            x = jnp.dot(x, stage["down"]["conv"]) + stage["down"]["conv_bias"]

        def body(x, blk):
            h = _depthwise7(x, blk["dw"]) + blk["dw_bias"]
            h = layer_norm(h, blk["norm"]["weight"], blk["norm"]["bias"],
                           eps=cfg.norm_eps)
            h = jax.nn.gelu(jnp.dot(h, blk["pw1"]["weight"])
                            + blk["pw1"]["bias"], approximate=False)
            h = jnp.dot(h, blk["pw2"]["weight"]) + blk["pw2"]["bias"]
            return x + blk["gamma"] * h, None

        x, _ = jax.lax.scan(body, x, stage["blocks"])

    bb, hh, ww, cc = x.shape
    return x.reshape(bb, hh * ww, cc)


# ---------------------------------------------------------------------------
# Q-Former (BLIP-2: learnable queries cross-attending to image features)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    n_queries: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    kv_dim: int = 1024  # visual feature dim attended to
    norm_eps: float = 1e-12  # BERT-style LayerNorm eps (HF Blip2QFormer)


QFORMER_BASE = QFormerConfig()


def init_qformer(key: jax.Array, cfg: QFormerConfig, dtype=jnp.float32) -> Params:
    """BERT post-LN Q-Former, HF ``Blip2QFormerModel`` layout with
    cross-attention on every layer (SPHINX sets cross_attention_frequency=1)
    so real BLIP-2 weights import directly
    (checkpoint/visual_import.convert_hf_blip2_qformer). Cross K/V project
    straight from the raw visual features (kv_dim), as in HF."""
    ks = jax.random.split(key, 10)
    w, L = cfg.width, cfg.layers
    mlp = 4 * w

    def dense(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * shape[-2] ** -0.5).astype(dtype)

    def ln(shape=(L, w)):
        return {"weight": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    return {
        "queries": (jax.random.normal(ks[0], (cfg.n_queries, w)) * 0.02).astype(dtype),
        "ln_q_in": ln((w,)),
        "blocks": {
            "self_qkv": {"weight": dense(ks[4], (L, w, 3 * w)),
                         "bias": jnp.zeros((L, 3 * w), dtype)},
            "proj": {"weight": dense(ks[5], (L, w, w)), "bias": jnp.zeros((L, w), dtype)},
            "ln_self": ln(),
            "q": {"weight": dense(ks[2], (L, w, w)), "bias": jnp.zeros((L, w), dtype)},
            "kv": {"weight": dense(ks[3], (L, cfg.kv_dim, 2 * w)),
                   "bias": jnp.zeros((L, 2 * w), dtype)},
            "cproj": {"weight": dense(ks[6], (L, w, w)), "bias": jnp.zeros((L, w), dtype)},
            "ln_cross": ln(),
            "fc1": {"weight": dense(ks[7], (L, w, mlp)), "bias": jnp.zeros((L, mlp), dtype)},
            "fc2": {"weight": dense(ks[8], (L, mlp, w)), "bias": jnp.zeros((L, w), dtype)},
            "ln_mlp": ln(),
        },
    }


def qformer_forward(params: Params, cfg: QFormerConfig,
                    visual_feats: jnp.ndarray) -> jnp.ndarray:
    """visual_feats (b, t, kv_dim) -> (b, n_queries, width).

    HF Blip2QFormerLayer order: self-attn -> post-LN -> cross-attn ->
    post-LN -> MLP (intermediate_query/output_query) -> post-LN; the query
    embeddings are layer-normed once on entry (Blip2QFormerModel.forward)."""
    b = visual_feats.shape[0]
    kv = visual_feats.astype(params["queries"].dtype)
    x = jnp.broadcast_to(params["queries"][None], (b, cfg.n_queries, cfg.width))
    x = layer_norm(x, params["ln_q_in"]["weight"], params["ln_q_in"]["bias"],
                   eps=cfg.norm_eps)
    heads = cfg.heads
    hd = cfg.width // heads

    def mha(q, k, v):
        bq, tq, _ = q.shape
        tk = k.shape[1]
        qh = q.reshape(bq, tq, heads, hd)
        kh = k.reshape(bq, tk, heads, hd)
        vh = v.reshape(bq, tk, heads, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32) * hd ** -0.5
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(bq, tq, cfg.width)

    def body(x, blk):
        # self-attention over queries, post-LN
        qkv = jnp.dot(x, blk["self_qkv"]["weight"]) + blk["self_qkv"]["bias"]
        q_, k_, v_ = jnp.split(qkv, 3, axis=-1)
        h = jnp.dot(mha(q_, k_, v_), blk["proj"]["weight"]) + blk["proj"]["bias"]
        x = layer_norm(x + h, blk["ln_self"]["weight"], blk["ln_self"]["bias"],
                       eps=cfg.norm_eps)
        # cross-attention to raw visual features, post-LN
        q_ = jnp.dot(x, blk["q"]["weight"]) + blk["q"]["bias"]
        k_, v_ = jnp.split(jnp.dot(kv, blk["kv"]["weight"]) + blk["kv"]["bias"], 2, axis=-1)
        h = jnp.dot(mha(q_, k_, v_), blk["cproj"]["weight"]) + blk["cproj"]["bias"]
        x = layer_norm(x + h, blk["ln_cross"]["weight"], blk["ln_cross"]["bias"],
                       eps=cfg.norm_eps)
        # MLP, post-LN (exact GELU, BERT intermediate)
        h = jax.nn.gelu(jnp.dot(x, blk["fc1"]["weight"]) + blk["fc1"]["bias"],
                        approximate=False)
        h = jnp.dot(h, blk["fc2"]["weight"]) + blk["fc2"]["bias"]
        x = layer_norm(x + h, blk["ln_mlp"]["weight"], blk["ln_mlp"]["bias"],
                       eps=cfg.norm_eps)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return x
