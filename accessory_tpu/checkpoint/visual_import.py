"""Import HF CLIP vision-tower weights into our ViT pytree.

The reference builds its SPHINX towers from open_clip / transformers
pretrained models (llama_ens.py:278-323). This converter maps transformers
``CLIPVisionModel`` state dicts (the `openai/clip-vit-large-patch14` layout)
onto models.visual's ViT tree so pretrained towers load without torch at
inference time. Verified feature-level against transformers on a random
model (tests/test_visual_import.py).

Mapping notes:
  * patch conv (w, 3, p, p) → our patchify linear (p·p·3, w) with
    (row, col, channel) flattening order matching vit_forward's reshape
  * separate q/k/v projections → fused qkv (w, 3w), out-dim order q;k;v
  * CLIP's activation is QuickGELU (ViTConfig.act handles it)
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from accessory_tpu.models.visual import ViTConfig


def convert_hf_clip_vision(sd: Dict[str, np.ndarray], cfg: ViTConfig):
    """sd: transformers CLIPVisionModel state_dict (numpy) → our ViT params."""
    import jax.numpy as jnp

    P = "vision_model."
    L = cfg.layers

    def a(name):
        return np.asarray(sd[name], np.float32)

    conv = a(P + "embeddings.patch_embedding.weight")  # (w, 3, p, p)
    patch = conv.transpose(2, 3, 1, 0).reshape(-1, cfg.width)  # (p·p·3, w)

    def stack(fmt, transform=None):
        outs = []
        for i in range(L):
            v = a(fmt.format(i))
            outs.append(transform(v) if transform else v)
        return jnp.asarray(np.stack(outs))

    T = lambda w: np.ascontiguousarray(w.T)  # noqa: E731
    B = P + "encoder.layers.{}."

    def qkv_w(i):
        q = a(B.format(i) + "self_attn.q_proj.weight")
        k = a(B.format(i) + "self_attn.k_proj.weight")
        v = a(B.format(i) + "self_attn.v_proj.weight")
        return np.concatenate([T(q), T(k), T(v)], axis=1)  # (w, 3w)

    def qkv_b(i):
        return np.concatenate([
            a(B.format(i) + "self_attn.q_proj.bias"),
            a(B.format(i) + "self_attn.k_proj.bias"),
            a(B.format(i) + "self_attn.v_proj.bias")])

    return {
        "patch_embed": {"weight": jnp.asarray(patch)},
        "cls_token": jnp.asarray(
            a(P + "embeddings.class_embedding").reshape(1, 1, cfg.width)),
        "pos_embed": jnp.asarray(a(P + "embeddings.position_embedding.weight")),
        "ln_pre": {"weight": jnp.asarray(a(P + "pre_layrnorm.weight")),
                   "bias": jnp.asarray(a(P + "pre_layrnorm.bias"))},
        "blocks": {
            "ln1": {"weight": stack(B + "layer_norm1.weight"),
                    "bias": stack(B + "layer_norm1.bias")},
            "ln2": {"weight": stack(B + "layer_norm2.weight"),
                    "bias": stack(B + "layer_norm2.bias")},
            "qkv": {"weight": jnp.asarray(np.stack([qkv_w(i) for i in range(L)])),
                    "bias": jnp.asarray(np.stack([qkv_b(i) for i in range(L)]))},
            "proj": {"weight": stack(B + "self_attn.out_proj.weight", T),
                     "bias": stack(B + "self_attn.out_proj.bias")},
            "fc1": {"weight": stack(B + "mlp.fc1.weight", T),
                    "bias": stack(B + "mlp.fc1.bias")},
            "fc2": {"weight": stack(B + "mlp.fc2.weight", T),
                    "bias": stack(B + "mlp.fc2.bias")},
        },
        "ln_post": {"weight": jnp.asarray(a(P + "post_layernorm.weight")),
                    "bias": jnp.asarray(a(P + "post_layernorm.bias"))},
    }


def convert_hf_dinov2(sd: Dict[str, np.ndarray], cfg: ViTConfig):
    """transformers ``Dinov2Model`` state dict (facebook/dinov2-giant layout:
    LayerScale + SwiGLU weights_in/weights_out, patch conv WITH bias, no
    pre-LN, eps 1e-6) → our ViT params. Feature-parity-tested against
    transformers on a random model (tests/test_visual_import.py).

    Reference role: the SPHINX DINOv2 tower, llama_ens.py:300-312."""
    import jax.numpy as jnp

    L = cfg.layers
    assert cfg.layerscale and cfg.ffn == "swiglu" and not cfg.ln_pre, (
        "target ViTConfig must be DINOv2-style (see DINOV2_VIT_G14)")

    def a(name):
        return np.asarray(sd[name], np.float32)

    conv = a("embeddings.patch_embeddings.projection.weight")  # (w, 3, p, p)
    patch = conv.transpose(2, 3, 1, 0).reshape(-1, cfg.width)

    T = lambda w: np.ascontiguousarray(w.T)  # noqa: E731
    B = "encoder.layer.{}."

    def stack(fmt, transform=None):
        outs = []
        for i in range(L):
            v = a(fmt.format(i))
            outs.append(transform(v) if transform else v)
        return jnp.asarray(np.stack(outs))

    def qkv_w(i):
        q = a(B.format(i) + "attention.attention.query.weight")
        k = a(B.format(i) + "attention.attention.key.weight")
        v = a(B.format(i) + "attention.attention.value.weight")
        return np.concatenate([T(q), T(k), T(v)], axis=1)

    def qkv_b(i):
        return np.concatenate([
            a(B.format(i) + "attention.attention.query.bias"),
            a(B.format(i) + "attention.attention.key.bias"),
            a(B.format(i) + "attention.attention.value.bias")])

    return {
        "patch_embed": {
            "weight": jnp.asarray(patch),
            "bias": jnp.asarray(
                a("embeddings.patch_embeddings.projection.bias"))},
        "cls_token": jnp.asarray(a("embeddings.cls_token")),
        "pos_embed": jnp.asarray(a("embeddings.position_embeddings")[0]),
        "blocks": {
            "ln1": {"weight": stack(B + "norm1.weight"),
                    "bias": stack(B + "norm1.bias")},
            "ln2": {"weight": stack(B + "norm2.weight"),
                    "bias": stack(B + "norm2.bias")},
            "qkv": {"weight": jnp.asarray(np.stack([qkv_w(i) for i in range(L)])),
                    "bias": jnp.asarray(np.stack([qkv_b(i) for i in range(L)]))},
            "proj": {"weight": stack(B + "attention.output.dense.weight", T),
                     "bias": stack(B + "attention.output.dense.bias")},
            "ls1": stack(B + "layer_scale1.lambda1"),
            "ls2": stack(B + "layer_scale2.lambda1"),
            # SwiGLU: weights_in packs [gate; up] rows — transpose to (w, 2h)
            "fc1": {"weight": stack(B + "mlp.weights_in.weight", T),
                    "bias": stack(B + "mlp.weights_in.bias")},
            "fc2": {"weight": stack(B + "mlp.weights_out.weight", T),
                    "bias": stack(B + "mlp.weights_out.bias")},
        },
        "ln_post": {"weight": jnp.asarray(a("layernorm.weight")),
                    "bias": jnp.asarray(a("layernorm.bias"))},
    }


def load_hf_dinov2(model_name_or_dir: str, cfg: ViTConfig):
    """Load a transformers Dinov2Model (local dir or hub id) and convert."""
    from transformers import Dinov2Model

    model = Dinov2Model.from_pretrained(model_name_or_dir)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return convert_hf_dinov2(sd, cfg)


def _timm_to_hf_convnext(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Translate timm / open_clip ConvNeXt names (the reference's
    ``open_clip convnext_xxlarge`` trunk, llama_ens.py:286-299) to the HF
    ConvNextModel names ``convert_convnext`` consumes. Accepts an open_clip
    checkpoint's ``visual.trunk.``-prefixed keys too."""
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("visual.trunk.").removeprefix("trunk.")
        nk = None
        if k.startswith("stem.0."):
            nk = "embeddings.patch_embeddings." + k[len("stem.0."):]
        elif k.startswith("stem.1."):
            nk = "embeddings.layernorm." + k[len("stem.1."):]
        elif k.startswith("stages."):
            parts = k.split(".")
            si = parts[1]
            rest = ".".join(parts[2:])
            if rest.startswith("downsample.0."):
                nk = f"encoder.stages.{si}.downsampling_layer.0." + \
                    rest[len("downsample.0."):]
            elif rest.startswith("downsample.1."):
                nk = f"encoder.stages.{si}.downsampling_layer.1." + \
                    rest[len("downsample.1."):]
            elif rest.startswith("blocks."):
                bp = rest.split(".")
                bi = bp[1]
                tail = ".".join(bp[2:])
                m = {"conv_dw.weight": "dwconv.weight",
                     "conv_dw.bias": "dwconv.bias",
                     "norm.weight": "layernorm.weight",
                     "norm.bias": "layernorm.bias",
                     "mlp.fc1.weight": "pwconv1.weight",
                     "mlp.fc1.bias": "pwconv1.bias",
                     "mlp.fc2.weight": "pwconv2.weight",
                     "mlp.fc2.bias": "pwconv2.bias",
                     "gamma": "layer_scale_parameter"}
                if tail in m:
                    nk = f"encoder.stages.{si}.layers.{bi}." + m[tail]
        if nk is not None:
            out[nk] = v
    return out


def convert_convnext(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """HF ``ConvNextModel`` state dict (or timm/open_clip via
    ``_timm_to_hf_convnext``) → our ConvNeXt params (models/visual.py).

    Reference role: the SPHINX ConvNeXt-XXL tower, llama_ens.py:286-299.
    Mapping: convs become flattened matmuls with (kh, kw, cin) flatten
    order; depthwise (c, 1, 7, 7) → (49, c)."""
    import jax.numpy as jnp

    if not any(k.startswith("embeddings.") for k in sd):
        sd = _timm_to_hf_convnext(sd)

    def a(name):
        return np.asarray(sd[name], np.float32)

    T = lambda w: np.ascontiguousarray(w.T)  # noqa: E731
    stages = []
    for si, depth in enumerate(cfg.depths):
        if si == 0:
            conv = a("embeddings.patch_embeddings.weight")  # (d, 3, 4, 4)
            down = {
                "conv": jnp.asarray(conv.transpose(2, 3, 1, 0).reshape(
                    -1, cfg.dims[0])),
                "conv_bias": jnp.asarray(a("embeddings.patch_embeddings.bias")),
                "norm": {"weight": jnp.asarray(a("embeddings.layernorm.weight")),
                         "bias": jnp.asarray(a("embeddings.layernorm.bias"))}}
        else:
            D = f"encoder.stages.{si}.downsampling_layer."
            conv = a(D + "1.weight")  # (d, prev, 2, 2)
            down = {
                "conv": jnp.asarray(conv.transpose(2, 3, 1, 0).reshape(
                    -1, cfg.dims[si])),
                "conv_bias": jnp.asarray(a(D + "1.bias")),
                "norm": {"weight": jnp.asarray(a(D + "0.weight")),
                         "bias": jnp.asarray(a(D + "0.bias"))}}

        def bstack(fmt, transform=None):
            outs = []
            for j in range(depth):
                v = a(fmt.format(si, j))
                outs.append(transform(v) if transform else v)
            return jnp.asarray(np.stack(outs))

        B = "encoder.stages.{}.layers.{}."
        blocks = {
            "dw": bstack(B + "dwconv.weight",
                         lambda w: w.transpose(2, 3, 1, 0).reshape(49, -1)),
            "dw_bias": bstack(B + "dwconv.bias"),
            "norm": {"weight": bstack(B + "layernorm.weight"),
                     "bias": bstack(B + "layernorm.bias")},
            "pw1": {"weight": bstack(B + "pwconv1.weight", T),
                    "bias": bstack(B + "pwconv1.bias")},
            "pw2": {"weight": bstack(B + "pwconv2.weight", T),
                    "bias": bstack(B + "pwconv2.bias")},
            "gamma": bstack(B + "layer_scale_parameter"),
        }
        stages.append({"down": down, "blocks": blocks})
    return {"stages": stages}


def convert_hf_blip2_qformer(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """transformers ``Blip2QFormerModel`` state dict → our Q-Former params
    (models/visual.py qformer_forward). BERT-style post-LN blocks with
    cross-attention on every layer (SPHINX configures
    cross_attention_frequency=1; layers without cross-attention are not
    supported by the fused tree).

    Reference role: the SPHINX/llama_qformerv2 Q-Former,
    llama_ens.py:278-284 / llama_qformerv2.py."""
    import jax.numpy as jnp

    L = cfg.layers

    def a(name):
        return np.asarray(sd[name], np.float32)

    T = lambda w: np.ascontiguousarray(w.T)  # noqa: E731
    B = "encoder.layer.{}."

    def stack(fmt, transform=None):
        outs = []
        for i in range(L):
            v = a(fmt.format(i))
            outs.append(transform(v) if transform else v)
        return jnp.asarray(np.stack(outs))

    def fused(i, *names):
        return np.concatenate([T(a(B.format(i) + n)) for n in names], axis=1)

    def fusedb(i, *names):
        return np.concatenate([a(B.format(i) + n) for n in names])

    return {
        "queries": jnp.asarray(a("query_tokens")[0] if "query_tokens" in sd
                               else a("queries")),
        "ln_q_in": {"weight": jnp.asarray(a("layernorm.weight")),
                    "bias": jnp.asarray(a("layernorm.bias"))},
        "blocks": {
            "self_qkv": {
                "weight": jnp.asarray(np.stack([
                    fused(i, "attention.attention.query.weight",
                          "attention.attention.key.weight",
                          "attention.attention.value.weight")
                    for i in range(L)])),
                "bias": jnp.asarray(np.stack([
                    fusedb(i, "attention.attention.query.bias",
                           "attention.attention.key.bias",
                           "attention.attention.value.bias")
                    for i in range(L)]))},
            "proj": {"weight": stack(B + "attention.output.dense.weight", T),
                     "bias": stack(B + "attention.output.dense.bias")},
            "ln_self": {"weight": stack(B + "attention.output.LayerNorm.weight"),
                        "bias": stack(B + "attention.output.LayerNorm.bias")},
            "q": {"weight": stack(B + "crossattention.attention.query.weight", T),
                  "bias": stack(B + "crossattention.attention.query.bias")},
            "kv": {
                "weight": jnp.asarray(np.stack([
                    fused(i, "crossattention.attention.key.weight",
                          "crossattention.attention.value.weight")
                    for i in range(L)])),
                "bias": jnp.asarray(np.stack([
                    fusedb(i, "crossattention.attention.key.bias",
                           "crossattention.attention.value.bias")
                    for i in range(L)]))},
            "cproj": {"weight": stack(B + "crossattention.output.dense.weight", T),
                      "bias": stack(B + "crossattention.output.dense.bias")},
            "ln_cross": {"weight": stack(B + "crossattention.output.LayerNorm.weight"),
                         "bias": stack(B + "crossattention.output.LayerNorm.bias")},
            "fc1": {"weight": stack(B + "intermediate_query.dense.weight", T),
                    "bias": stack(B + "intermediate_query.dense.bias")},
            "fc2": {"weight": stack(B + "output_query.dense.weight", T),
                    "bias": stack(B + "output_query.dense.bias")},
            "ln_mlp": {"weight": stack(B + "output_query.LayerNorm.weight"),
                       "bias": stack(B + "output_query.LayerNorm.bias")},
        },
    }


def load_hf_clip_vision(model_name_or_dir: str, cfg: ViTConfig):
    """Load a transformers CLIPVisionModel (local dir or hub id with network)
    and convert."""
    from transformers import CLIPVisionModel

    model = CLIPVisionModel.from_pretrained(model_name_or_dir)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    # transformers prefixes differ by class; normalize to vision_model.*
    sd = { (k if k.startswith("vision_model.") else "vision_model." + k): v
           for k, v in sd.items() }
    return convert_hf_clip_vision(sd, cfg)
