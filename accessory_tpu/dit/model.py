"""DiT model: LLaMA-style blocks + adaLN-zero conditioning.

Reference: Large-DiT-T2I/models/model.py:36-513 — patch embedding of VAE
latents, sinusoidal timestep embedding → MLP, label embedding with CFG
dropout, transformer blocks whose LayerNorms are modulated by
(shift, scale, gate) computed per-block from the conditioning vector
(adaLN-zero: the gate projection is zero-init so blocks start as identity),
final adaLN + linear head predicting 2×channels (eps + learned sigma).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from accessory_tpu.ops.attention import attention
from accessory_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass
class DiTArgs:
    input_size: int = 32       # latent spatial size
    patch_size: int = 2
    in_channels: int = 4       # VAE latent channels
    dim: int = 1152
    n_layers: int = 28
    n_heads: int = 16
    num_classes: int = 1000
    class_dropout_prob: float = 0.1
    learn_sigma: bool = True
    multiple_of: int = 256
    dtype: str = "float32"
    # T2I conditioning (Large-DiT-T2I): caption features (e.g. T5/CLIP text
    # encoder outputs) projected into the adaLN conditioning vector
    cap_feat_dim: int = 0  # 0 = class-conditional only

    @property
    def n_patches(self) -> int:
        return (self.input_size // self.patch_size) ** 2

    @property
    def out_channels(self) -> int:
        return self.in_channels * (2 if self.learn_sigma else 1)

    @property
    def ffn_hidden(self) -> int:
        hidden = int(2 * (4 * self.dim) / 3)
        return self.multiple_of * ((hidden + self.multiple_of - 1) // self.multiple_of)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal embedding (reference models/model.py TimestepEmbedder)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def init_dit(key: jax.Array, args: DiTArgs) -> Params:
    dtype = jnp.dtype(args.dtype)
    d, L = args.dim, args.n_layers
    hd = d // args.n_heads
    ffn = args.ffn_hidden
    pd = args.patch_size * args.patch_size * args.in_channels
    ks = jax.random.split(key, 16)

    def dense(k, shape, s=None):
        return (jax.random.normal(k, shape, jnp.float32)
                * (s or shape[-2] ** -0.5)).astype(dtype)

    return {
        "patch_embed": {"weight": dense(ks[0], (pd, d), 0.02),
                        "bias": jnp.zeros((d,), dtype)},
        "pos_embed": (jax.random.normal(ks[1], (args.n_patches, d)) * 0.02).astype(dtype),
        "t_embed": {
            "fc1": {"weight": dense(ks[2], (256, d)), "bias": jnp.zeros((d,), dtype)},
            "fc2": {"weight": dense(ks[3], (d, d)), "bias": jnp.zeros((d,), dtype)},
        },
        # +1 class slot = CFG null label (reference LabelEmbedder)
        "y_embed": {"weight": dense(ks[4], (args.num_classes + 1, d), 0.02)},
        **({"cap_embed": {
            "fc1": {"weight": dense(ks[10], (args.cap_feat_dim, d)),
                    "bias": jnp.zeros((d,), dtype)},
            "fc2": {"weight": dense(ks[11], (d, d)),
                    "bias": jnp.zeros((d,), dtype)},
        }} if args.cap_feat_dim else {}),
        "layers": {
            "attn_norm": {"weight": jnp.ones((L, d), dtype)},
            "ffn_norm": {"weight": jnp.ones((L, d), dtype)},
            "wqkv": {"weight": dense(ks[5], (L, d, 3 * d))},
            "wo": {"weight": dense(ks[6], (L, d, d))},
            "w1": {"weight": dense(ks[7], (L, d, ffn))},
            "w2": {"weight": dense(ks[8], (L, ffn, d))},
            "w3": {"weight": dense(ks[9], (L, d, ffn))},
            # adaLN-zero: 6 modulation vectors per block, zero-init
            "ada": {"weight": jnp.zeros((L, d, 6 * d), dtype),
                    "bias": jnp.zeros((L, 6 * d), dtype)},
        },
        "final": {
            "norm": {"weight": jnp.ones((d,), dtype)},
            "ada": {"weight": jnp.zeros((d, 2 * d), dtype),
                    "bias": jnp.zeros((2 * d,), dtype)},
            "linear": {"weight": jnp.zeros((d, pd * (2 if args.learn_sigma else 1)), dtype),
                       "bias": jnp.zeros((pd * (2 if args.learn_sigma else 1),), dtype)},
        },
    }


def dit_param_axes(args: DiTArgs) -> Params:
    A = lambda *n: tuple(n)  # noqa: E731
    return {
        "patch_embed": {"weight": A("embed", None), "bias": A(None)},
        "pos_embed": A(None, "embed"),
        "t_embed": {
            "fc1": {"weight": A(None, "embed"), "bias": A(None)},
            "fc2": {"weight": A("embed", None), "bias": A(None)},
        },
        "y_embed": {"weight": A("vocab", "embed")},
        "layers": {
            "attn_norm": {"weight": A("layers", None)},
            "ffn_norm": {"weight": A("layers", None)},
            "wqkv": {"weight": A("layers", "embed", "heads")},
            "wo": {"weight": A("layers", "heads", "embed")},
            "w1": {"weight": A("layers", "embed", "ffn")},
            "w2": {"weight": A("layers", "ffn", "embed")},
            "w3": {"weight": A("layers", "embed", "ffn")},
            "ada": {"weight": A("layers", "embed", None), "bias": A("layers", None)},
        },
        "final": {
            "norm": {"weight": A(None)},
            "ada": {"weight": A("embed", None), "bias": A(None)},
            "linear": {"weight": A("embed", None), "bias": A(None)},
        },
    }


def _modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


def dit_forward(
    params: Params,
    args: DiTArgs,
    x: jnp.ndarray,           # (b, C, H, W) noisy latents
    t: jnp.ndarray,           # (b,) diffusion timesteps
    y: jnp.ndarray,           # (b,) class labels (num_classes = CFG null)
    cap_feats: Optional[jnp.ndarray] = None,  # (b, T, cap_dim) T2I captions
    remat: bool = False,
) -> jnp.ndarray:
    """Returns (b, out_channels, H, W). ``remat`` checkpoints each block
    (training: scan otherwise stores every block's intermediates — ~8
    tensors x L layers; with remat only the residual stream is carried,
    the reference's activation-checkpoint role, Large-DiT train.py)."""
    b = x.shape[0]
    p, g = args.patch_size, args.input_size // args.patch_size
    d = args.dim
    nh = args.n_heads
    hd = d // nh

    # patchify
    xp = x.reshape(b, args.in_channels, g, p, g, p).transpose(0, 2, 4, 3, 5, 1)
    xp = xp.reshape(b, g * g, p * p * args.in_channels)
    h = jnp.dot(xp.astype(params["pos_embed"].dtype),
                params["patch_embed"]["weight"]) + params["patch_embed"]["bias"]
    h = h + params["pos_embed"][None]

    # conditioning vector c = t_emb + y_emb
    te = timestep_embedding(t, 256).astype(h.dtype)
    te = jax.nn.silu(jnp.dot(te, params["t_embed"]["fc1"]["weight"])
                     + params["t_embed"]["fc1"]["bias"])
    te = jnp.dot(te, params["t_embed"]["fc2"]["weight"]) + params["t_embed"]["fc2"]["bias"]
    ye = jnp.take(params["y_embed"]["weight"], y, axis=0)
    cond = te + ye
    if cap_feats is not None and "cap_embed" in params:
        # T2I: project caption features and mean-pool into the global
        # conditioning vector (Large-DiT-T2I CaptionEmbedder role)
        ce = params["cap_embed"]
        cf = jax.nn.silu(jnp.dot(cap_feats.astype(cond.dtype),
                                 ce["fc1"]["weight"]) + ce["fc1"]["bias"])
        cf = jnp.dot(cf, ce["fc2"]["weight"]) + ce["fc2"]["bias"]
        cond = cond + jnp.mean(cf, axis=1)
    c = jax.nn.silu(cond)

    def body(h, layer):
        mod = jnp.dot(c, layer["ada"]["weight"]) + layer["ada"]["bias"]
        (s1, sc1, g1, s2, sc2, g2) = jnp.split(mod, 6, axis=-1)
        xn = layer_norm(h, layer["attn_norm"]["weight"])
        xn = _modulate(xn, s1, sc1)
        qkv = jnp.dot(xn, layer["wqkv"]["weight"]).reshape(b, -1, 3, nh, hd)
        out = attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], causal=False)
        h = h + g1[:, None, :] * jnp.dot(out.reshape(b, -1, d), layer["wo"]["weight"])
        xn = layer_norm(h, layer["ffn_norm"]["weight"])
        xn = _modulate(xn, s2, sc2)
        ff = jax.nn.silu(jnp.dot(xn, layer["w1"]["weight"])) * jnp.dot(xn, layer["w3"]["weight"])
        h = h + g2[:, None, :] * jnp.dot(ff, layer["w2"]["weight"])
        return h, None

    if remat:
        from accessory_tpu.util import remat_policy
        body = jax.checkpoint(body, policy=remat_policy(remat))
    h, _ = jax.lax.scan(body, h, params["layers"])

    fin = params["final"]
    mod = jnp.dot(c, fin["ada"]["weight"]) + fin["ada"]["bias"]
    shift, scale = jnp.split(mod, 2, axis=-1)
    h = _modulate(layer_norm(h, fin["norm"]["weight"]), shift, scale)
    h = jnp.dot(h, fin["linear"]["weight"]) + fin["linear"]["bias"]

    # unpatchify
    oc = args.out_channels
    h = h.reshape(b, g, g, p, p, oc).transpose(0, 5, 1, 3, 2, 4)
    return h.reshape(b, oc, g * p, g * p)
