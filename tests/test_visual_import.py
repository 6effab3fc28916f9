"""Golden parity: our ViT with HF CLIP weights must reproduce transformers'
CLIPVisionModel hidden states (validates patchify order, fused qkv, QuickGELU,
pre/post norms)."""

import numpy as np
import pytest


def test_clip_vision_feature_parity():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModel

    import jax.numpy as jnp

    from accessory_tpu.checkpoint.visual_import import convert_hf_clip_vision
    from accessory_tpu.models.visual import ViTConfig, vit_forward

    hf_cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14)
    torch.manual_seed(0)
    model = CLIPVisionModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    sd = {(k if k.startswith("vision_model.") else "vision_model." + k): v
          for k, v in sd.items()}

    cfg = ViTConfig(image_size=56, patch_size=14, width=64, layers=2, heads=4,
                    act="quick_gelu")
    params = convert_hf_clip_vision(sd, cfg)

    rng = np.random.RandomState(0)
    imgs = rng.randn(2, 3, 56, 56).astype(np.float32)
    ours = vit_forward(params, cfg, jnp.asarray(imgs))

    with torch.no_grad():
        theirs = model(torch.tensor(imgs)).last_hidden_state
    # transformers applies post_layernorm only to the pooled output; apply
    # it to their hidden states so both sides compare post-norm
    theirs_post = model.vision_model.post_layernorm(theirs)
    np.testing.assert_allclose(np.asarray(ours), theirs_post.detach().numpy(),
                               rtol=2e-4, atol=2e-4)


def test_dinov2_feature_parity():
    """Our DINOv2-style ViT (LayerScale + SwiGLU + patch bias, eps 1e-6)
    with imported HF weights must reproduce transformers Dinov2Model."""
    torch = pytest.importorskip("torch")
    from transformers import Dinov2Config, Dinov2Model

    import jax.numpy as jnp

    from accessory_tpu.checkpoint.visual_import import convert_hf_dinov2
    from accessory_tpu.models.visual import ViTConfig, vit_forward

    hf_cfg = Dinov2Config(hidden_size=64, num_hidden_layers=2,
                          num_attention_heads=4, image_size=56, patch_size=14,
                          use_swiglu_ffn=True, mlp_ratio=4)
    torch.manual_seed(0)
    model = Dinov2Model(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = ViTConfig(image_size=56, patch_size=14, width=64, layers=2, heads=4,
                    act="gelu", ln_pre=False, layerscale=True, ffn="swiglu",
                    norm_eps=1e-6, patch_bias=True)
    # HF hidden = int(64*4 * 2/3 + pad8) — must match our ffn_hidden
    assert cfg.ffn_hidden * 2 == model.state_dict()[
        "encoder.layer.0.mlp.weights_in.weight"].shape[0]
    params = convert_hf_dinov2(sd, cfg)

    rng = np.random.RandomState(0)
    imgs = rng.randn(2, 3, 56, 56).astype(np.float32)
    ours = vit_forward(params, cfg, jnp.asarray(imgs))

    with torch.no_grad():
        theirs = model(torch.tensor(imgs)).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               rtol=2e-4, atol=2e-4)


def test_blip2_qformer_feature_parity():
    """Our post-LN Q-Former with imported HF BLIP-2 weights must reproduce
    transformers Blip2QFormerModel query outputs."""
    torch = pytest.importorskip("torch")
    from transformers import Blip2QFormerConfig, Blip2QFormerModel

    import jax.numpy as jnp

    from accessory_tpu.checkpoint.visual_import import convert_hf_blip2_qformer
    from accessory_tpu.models.visual import QFormerConfig, qformer_forward

    hf_cfg = Blip2QFormerConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        encoder_hidden_size=48, cross_attention_frequency=1,
        intermediate_size=128)
    torch.manual_seed(0)
    model = Blip2QFormerModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    rng = np.random.RandomState(0)
    queries = rng.randn(1, 8, 32).astype(np.float32) * 0.2
    sd["query_tokens"] = queries

    cfg = QFormerConfig(n_queries=8, width=32, layers=2, heads=4, kv_dim=48)
    params = convert_hf_blip2_qformer(sd, cfg)

    feats = rng.randn(2, 5, 48).astype(np.float32)
    ours = qformer_forward(params, cfg, jnp.asarray(feats))

    with torch.no_grad():
        theirs = model(
            query_embeds=torch.tensor(queries).expand(2, -1, -1),
            encoder_hidden_states=torch.tensor(feats)).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               rtol=2e-4, atol=2e-4)


def test_convnext_feature_parity():
    """Our ConvNeXt with imported HF weights must reproduce transformers
    ConvNextModel hidden states (stem/downsample flatten order, depthwise
    conv mapping, LayerScale, exact GELU)."""
    torch = pytest.importorskip("torch")
    from transformers import ConvNextConfig, ConvNextModel

    import jax.numpy as jnp

    from accessory_tpu.checkpoint.visual_import import convert_convnext
    from accessory_tpu.models.visual import ConvNeXtConfig, convnext_forward

    hf_cfg = ConvNextConfig(depths=[2, 2], hidden_sizes=[16, 32],
                            num_stages=2, image_size=32)
    torch.manual_seed(0)
    model = ConvNextModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = ConvNeXtConfig(depths=(2, 2), dims=(16, 32))
    params = convert_convnext(sd, cfg)

    rng = np.random.RandomState(0)
    imgs = rng.randn(2, 3, 32, 32).astype(np.float32)
    ours = convnext_forward(params, cfg, jnp.asarray(imgs))  # (b, hw, c)

    with torch.no_grad():
        theirs = model(torch.tensor(imgs)).last_hidden_state  # (b, c, h, w)
    t = theirs.permute(0, 2, 3, 1).reshape(2, -1, 32).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), t, rtol=3e-4, atol=3e-4)


def test_convnext_timm_naming():
    """The open_clip/timm trunk naming translates to the same params."""
    torch = pytest.importorskip("torch")
    from transformers import ConvNextConfig, ConvNextModel

    from accessory_tpu.checkpoint.visual_import import (
        _timm_to_hf_convnext, convert_convnext)
    from accessory_tpu.models.visual import ConvNeXtConfig

    hf_cfg = ConvNextConfig(depths=[2, 2], hidden_sizes=[16, 32],
                            num_stages=2, image_size=32)
    model = ConvNextModel(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    # build a timm-style dict from the HF one and roundtrip it
    inv = {}
    for k, v in sd.items():
        if k.startswith("embeddings.patch_embeddings."):
            inv["visual.trunk.stem.0." + k.rsplit(".", 1)[1]] = v
        elif k.startswith("embeddings.layernorm."):
            inv["visual.trunk.stem.1." + k.rsplit(".", 1)[1]] = v
        elif ".downsampling_layer." in k:
            pre, post = k.split(".downsampling_layer.")
            si = pre.split(".")[-1]
            idx, leaf = post.split(".", 1)
            inv[f"visual.trunk.stages.{si}.downsample.{idx}.{leaf}"] = v
        elif ".layers." in k and k.startswith("encoder.stages."):
            si = k.split(".")[2]
            bi = k.split(".")[4]
            leaf = ".".join(k.split(".")[5:])
            m = {"dwconv.weight": "conv_dw.weight", "dwconv.bias": "conv_dw.bias",
                 "layernorm.weight": "norm.weight", "layernorm.bias": "norm.bias",
                 "pwconv1.weight": "mlp.fc1.weight", "pwconv1.bias": "mlp.fc1.bias",
                 "pwconv2.weight": "mlp.fc2.weight", "pwconv2.bias": "mlp.fc2.bias",
                 "layer_scale_parameter": "gamma"}
            inv[f"visual.trunk.stages.{si}.blocks.{bi}." + m[leaf]] = v
    cfg = ConvNeXtConfig(depths=(2, 2), dims=(16, 32))
    a = convert_convnext(sd, cfg)
    b = convert_convnext(inv, cfg)
    import jax

    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
