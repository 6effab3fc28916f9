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
