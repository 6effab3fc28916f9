"""SPHINX multimodal tests (tiny towers): encode_image token math, forward
with image prefix, decode consistency with cache_image_words offset, quant
blocklist, generation integration. Reference: accessory/model/LLM/llama_ens*."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.config import SphinxArgs
from accessory_tpu.models import get_model_module, sphinx

TINY = dict(
    dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=96,
    multiple_of=32, max_seq_len=640, dtype="float32",
    vit_patch=56, clip_width=32, clip_layers=2, clip_heads=2,
    dino_width=48, dino_layers=2, dino_heads=2,
    convnext_depths=(1, 1, 1, 1), convnext_dims=(8, 16, 32, 64),
    qformer_width=32, qformer_layers=2, qformer_heads=2,
)
# vit 224/56 → 4x4 grid → 17 tokens per tower


def test_encode_image_shapes():
    args = SphinxArgs(**TINY, visual="ens")
    params = sphinx.init_params(jax.random.PRNGKey(0), args)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 224, 224))
    toks = sphinx.encode_image(params, args, imgs)
    wpc = sphinx.words_per_crop(args)
    assert wpc == 32 + 17 + 2
    assert toks.shape == (2, wpc, args.dim)
    assert np.isfinite(np.asarray(toks)).all()


def test_encode_image_light():
    args = SphinxArgs(**TINY, visual="ens_light")
    params = sphinx.init_params(jax.random.PRNGKey(0), args)
    assert "clip" not in params["visual"] and "qformer" not in params["visual"]
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 224, 224))
    toks = sphinx.encode_image(params, args, imgs)
    assert toks.shape == (2, 17 + 2, args.dim)


def test_encode_image_5crop():
    args = SphinxArgs(**TINY, visual="ens5", image_size=448)
    params = sphinx.init_params(jax.random.PRNGKey(0), args)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 448, 448))
    toks = sphinx.encode_image(params, args, imgs)
    assert toks.shape == (2, 5 * sphinx.words_per_crop(args), args.dim)


def test_forward_with_image_and_decode_consistency():
    args = SphinxArgs(**TINY, visual="ens")
    params = sphinx.init_params(jax.random.PRNGKey(0), args)
    b, s = 2, 8
    tokens = jax.random.randint(jax.random.PRNGKey(2), (b, s), 0, 96)
    imgs = jax.random.normal(jax.random.PRNGKey(3), (b, 3, 224, 224))
    n_img = sphinx.image_words(args)

    # training forward drops image positions (reference llama_ens behavior)
    logits, _ = sphinx.forward(params, args, tokens, images=imgs)
    assert logits.shape == (b, s, 96)

    # cached prefill + decode must agree with the full multimodal forward
    cache = sphinx.init_kv_cache(args, b, max_len=s + n_img + 8)
    img_toks = sphinx.encode_image(params, args, imgs)
    tok_emb = jnp.take(params["tok_embeddings"]["weight"], tokens, axis=0)
    emb = jnp.concatenate([tok_emb[:, :1], img_toks, tok_emb[:, 1:]], axis=1)
    lp, cache = sphinx.forward(params, args, tokens, cache=cache, cur_pos=0,
                               embeds=emb)
    assert lp.shape == (b, s + n_img, 96)
    np.testing.assert_allclose(np.asarray(lp[:, n_img:]), np.asarray(logits),
                               rtol=3e-4, atol=3e-4)

    # one decode step at spliced position s + n_img
    nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    ld, cache = sphinx.forward(params, args, nxt, cache=cache,
                               cur_pos=s + n_img)
    full2, _ = sphinx.forward(
        params, args, jnp.concatenate([tokens, nxt], 1), images=imgs)
    np.testing.assert_allclose(np.asarray(ld[:, 0]), np.asarray(full2[:, -1]),
                               rtol=5e-4, atol=5e-4)


def test_quant_blocklist_protects_visual():
    from accessory_tpu.quant import DEFAULT_BLOCKLIST, quantize_params

    args = SphinxArgs(**TINY, visual="ens_light")
    params = sphinx.init_params(jax.random.PRNGKey(0), args)
    block = tuple(DEFAULT_BLOCKLIST) + tuple(sphinx.get_quant_blocklist(args))
    qp = quantize_params(params, bits=4, group_size=16, blocklist=block)
    flat = jax.tree.leaves(qp["visual"])
    assert not any(hasattr(x, "bits") for x in flat)
    assert hasattr(qp["layers"]["attention"]["wq"]["weight"], "bits")


def test_metamodel_generate_with_image(tmp_path):
    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers

    from accessory_tpu.meta import MetaModel

    tk = HFTok(models.BPE(unk_token=None))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    tk.decoder = decoders.ByteLevel()
    tr = trainers.BpeTrainer(vocab_size=300, special_tokens=["<s>", "</s>"],
                             initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tk.train_from_iterator(["the quick brown fox"] * 40, tr)
    tk.save(str(tmp_path / "tokenizer.json"))

    m = MetaModel("llama_ens_light", dict(TINY, visual="ens_light"),
                  tokenizer_path=str(tmp_path / "tokenizer.json"),
                  max_seq_len=640)
    assert m.with_visual
    imgs = np.random.RandomState(0).randn(2, 3, 224, 224).astype(np.float32)
    outs = m.generate(["the quick", "brown fox"], images=imgs, max_gen_len=4)
    assert len(outs) == 2 and all(isinstance(o, str) for o in outs)
    # same prompts without image take a different path and still work
    outs2 = m.generate(["the quick", "brown fox"], max_gen_len=4)
    assert len(outs2) == 2


def test_sphinx_moe_forward():
    from accessory_tpu.config import SphinxMoEArgs
    from accessory_tpu.models import sphinx_moe

    args = SphinxMoEArgs(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=96,
        vocab_size=96, num_experts=4, max_seq_len=640, dtype="float32",
        visual="ens_light", vit_patch=56, clip_width=32, clip_layers=2,
        clip_heads=2, dino_width=48, dino_layers=2, dino_heads=2,
        convnext_depths=(1, 1, 1, 1), convnext_dims=(8, 16, 32, 64),
        qformer_width=32, qformer_layers=2, qformer_heads=2)
    params = sphinx_moe.init_params(jax.random.PRNGKey(0), args)
    assert "visual" in params and "gate" in params["layers"]["feed_forward"]

    b, s = 2, 6
    toks = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, 96)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (b, 3, 224, 224))
    logits, _ = sphinx_moe.forward(params, args, toks, images=imgs)
    assert logits.shape == (b, s, 96)
    assert np.isfinite(np.asarray(logits)).all()

    # cached multimodal prefill + decode step agree with the full forward
    n_img = sphinx_moe.image_words(args)
    cache = sphinx_moe.init_kv_cache(args, b, max_len=s + n_img + 4)
    img_toks = sphinx_moe.encode_image(params, args, imgs)
    tok_emb = jnp.take(params["tok_embeddings"]["weight"], toks, axis=0)
    emb = jnp.concatenate([tok_emb[:, :1], img_toks, tok_emb[:, 1:]], axis=1)
    lp, cache = sphinx_moe.forward(params, args, toks, cache=cache,
                                   cur_pos=0, embeds=emb)
    np.testing.assert_allclose(np.asarray(lp[:, n_img:]), np.asarray(logits),
                               rtol=4e-4, atol=4e-4)

    block = sphinx_moe.get_quant_blocklist(args)
    assert "visual" in block and "gate" in block


def test_sphinx_multimodal_train_step():
    from accessory_tpu.train import TrainState, make_optimizer, make_train_step

    args = SphinxArgs(**{**TINY, "max_seq_len": 64}, visual="ens_light")
    params = sphinx.init_params(jax.random.PRNGKey(0), args)
    trainable = sphinx.get_trainable_params_filter(args)
    tx = make_optimizer(params, 1e-3, trainable=trainable)
    step = jax.jit(make_train_step(sphinx, args, tx, remat=False))
    state = TrainState.create(params, tx)
    n_img = sphinx.image_words(args)
    s = 8
    batch = {
        "examples": jnp.ones((2, s), jnp.int32) * 3,
        "labels": jnp.ones((2, s), jnp.int32) * 5,
        "images": jax.random.normal(jax.random.PRNGKey(1), (2, 3, 224, 224)),
    }
    state, m = step(state, batch)
    assert np.isfinite(float(m["c_loss"]))
    # frozen visual towers unchanged
    np.testing.assert_array_equal(
        np.asarray(state.params["visual"]["dinov2"]["pos_embed"]),
        np.asarray(params["visual"]["dinov2"]["pos_embed"]))


def test_ens10_crop_grid():
    args = SphinxArgs(**{**TINY, "max_seq_len": 3000}, visual="ens5",
                      image_size=672)
    assert sphinx.n_crops(args) == 10  # 3x3 grid + global view
    params = sphinx.init_params(jax.random.PRNGKey(0), args)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 672, 672))
    toks = sphinx.encode_image(params, args, imgs)
    assert toks.shape == (1, 10 * sphinx.words_per_crop(args), args.dim)


def test_ens5p2_exact_word_layout():
    """llama_ens5p2.py:335 layout: main view keeps all patch tokens; each
    sub-crop pools its patch grid 2x (32 qformer + 1 cls + patches/4 + 2
    tags). image_words and encode_image must agree exactly."""
    args = SphinxArgs(**TINY, visual="ens5p2", image_size=448)
    vit, *_ = sphinx._tower_cfgs(args)
    expect = (32 + vit.n_tokens + 2) + (32 + 1 + vit.n_patches // 4 + 2) * 4
    assert sphinx.image_words(args) == expect
    params = sphinx.init_params(jax.random.PRNGKey(0), args)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 448, 448))
    toks = sphinx.encode_image(params, args, imgs)
    assert toks.shape == (2, expect, args.dim)
    assert np.isfinite(np.asarray(toks)).all()
    # production numbers: 257-token towers -> 32+257+2 + (32+1+64+2)*4 = 687
    prod = SphinxArgs(visual="ens5p2", image_size=448)
    assert sphinx.image_words(prod) == 32 + 257 + 2 + (32 + 1 + 64 + 2) * 4


def test_ens5p2_forward_with_image():
    args = SphinxArgs(**{**TINY, "max_seq_len": 640}, visual="ens5p2",
                      image_size=448)
    params = sphinx.init_params(jax.random.PRNGKey(0), args)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 448, 448))
    toks = jnp.ones((1, 8), jnp.int32)
    logits, _ = sphinx.forward(params, args, toks, images=imgs)
    assert logits.shape == (1, 8, args.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
