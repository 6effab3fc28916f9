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
