"""SPHINX-MoE: Mixtral sparse-MoE decoder + SPHINX visual ensemble.

Behavioral reference: accessory/model/LLM/mixtral_sparse_ens.py (sparse MoE
+ 4-tower visual ensemble, 512px :611-612) and mixtral_sparse_ens5.py
(5-crop, 1024px :613-614). Composition of models.mixtral (decoder) and
models.sphinx (encoders + token splice) — the reference duplicates ~800 LoC
per variant; here the pieces compose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from accessory_tpu.config import SphinxMoEArgs
from accessory_tpu.models import mixtral, sphinx

# tower machinery is host-model agnostic (reads only tower fields + dim)
encode_image = sphinx.encode_image
words_per_crop = sphinx.words_per_crop
n_crops = sphinx.n_crops
image_words = sphinx.image_words

init_kv_cache = mixtral.init_kv_cache
# decoder delegates to the base model forward, which supports the
# trace-time-unrolled decode loop on unstacked layers
SUPPORTS_UNROLLED_DECODE = True
# cache creation + forward delegate to the base model — int8 KV works
SUPPORTS_KV_INT8 = True

cache_axes = mixtral.cache_axes
init_paged_cache = mixtral.init_paged_cache
forward_paged = mixtral.forward_paged
SUPPORTS_CHUNKED_PREFILL = True  # delegated (continuation offsets)


def init_params(key: jax.Array, args: SphinxMoEArgs):
    params = mixtral.init_params(key, args)
    params["visual"] = _sphinx_visual_init(key, args)
    return params


def _sphinx_visual_init(key, args):
    from accessory_tpu.models.visual import (
        init_convnext, init_qformer, init_vit)
    from accessory_tpu.models.sphinx import _dense, _tower_cfgs

    kv = jax.random.split(jax.random.fold_in(key, 17), 8)
    vit, dino, conv, qf = _tower_cfgs(args)
    d = args.dim
    vdtype = jnp.float32
    light = args.visual.startswith("ens_light") or args.visual.startswith("ens5_light")
    ens_dim = conv.dims[-1] + dino.width + (0 if light else vit.width)
    visual = {
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
    return visual


def param_axes(args: SphinxMoEArgs):
    axes = mixtral.param_axes(args)
    vis_shape = jax.eval_shape(
        lambda: _sphinx_visual_init(jax.random.PRNGKey(0), args))
    axes["visual"] = jax.tree.map(lambda _: None, vis_shape)
    return axes


def get_quant_blocklist(args: SphinxMoEArgs):
    return list(mixtral.get_quant_blocklist(args)) + \
        ["visual", "qformer", "clip", "convnext", "dinov2"]


def get_trainable_params_filter(args: SphinxMoEArgs):
    base = mixtral.get_trainable_params_filter(args)
    return lambda name: base(name) and not name.startswith("visual/")


def forward(params, args, tokens, *, cache=None, cur_pos=0, remat=False,
            embeds=None, images=None, moe_impl="ragged",
            with_aux_loss=False):
    if images is not None:
        img_tokens = encode_image(params, args, images)
        tok_emb = jnp.take(params["tok_embeddings"]["weight"], tokens, axis=0)
        embeds = jnp.concatenate(
            [tok_emb[:, :1], img_tokens, tok_emb[:, 1:]], axis=1)
        out = mixtral.forward(params, args, tokens, cache=cache,
                              cur_pos=cur_pos, remat=remat, embeds=embeds,
                              moe_impl=moe_impl, with_aux_loss=with_aux_loss)
        if cache is None:
            if with_aux_loss:
                logits, nc, aux = out
                return logits[:, image_words(args):], nc, aux
            logits, nc = out
            return logits[:, image_words(args):], nc
        return out
    return mixtral.forward(params, args, tokens, cache=cache, cur_pos=cur_pos,
                           remat=remat, embeds=embeds, moe_impl=moe_impl,
                           with_aux_loss=with_aux_loss)
