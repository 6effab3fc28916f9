"""llama_adapter (zero-init prefix) + llama_qformerv2 tests."""

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.config import AdapterArgs, SphinxArgs
from accessory_tpu.models import get_model_module, llama

TINY = dict(dim=64, n_layers=4, n_heads=4, n_kv_heads=2, vocab_size=96,
            multiple_of=32, max_seq_len=64, dtype="float32")


def test_adapter_identity_at_init_and_decode():
    mod = get_model_module("llama_adapter")
    args = AdapterArgs(**TINY, prefix_layers=2, prefix_len=4)
    params = mod.init_params(jax.random.PRNGKey(0), args)

    # zero gates → identical to plain llama (the adapter-free function)
    base_args = llama.__dict__["init_params"].__defaults__  # noqa: F841
    from accessory_tpu.config import LLaMAArgs

    plain = LLaMAArgs(**TINY)
    pl = {k: v for k, v in params.items() if k != "adapter"}
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 96)
    a, _ = mod.forward(params, args, toks)
    b, _ = llama.forward(pl, plain, toks)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    # with nonzero gates the prefix changes the output on prefix layers only
    params["adapter"]["gate"] = jnp.ones_like(params["adapter"]["gate"])
    c, _ = mod.forward(params, args, toks)
    assert not np.allclose(np.asarray(c), np.asarray(a))

    # decode consistency with nonzero gates
    full, _ = mod.forward(params, args, toks)
    cache = mod.init_kv_cache(args, 2, max_len=32)
    lp, cache = mod.forward(params, args, toks[:, :6], cache=cache, cur_pos=0)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(full[:, :6]),
                               rtol=2e-4, atol=2e-4)
    for i in range(6, 10):
        li, cache = mod.forward(params, args, toks[:, i:i + 1], cache=cache,
                                cur_pos=i)
        np.testing.assert_allclose(np.asarray(li[:, 0]), np.asarray(full[:, i]),
                                   rtol=2e-4, atol=2e-4)


def test_adapter_trainable_filter():
    mod = get_model_module("llama_adapter")
    args = AdapterArgs(**TINY, prefix_len=4)
    f = mod.get_trainable_params_filter(args)
    assert f("adapter/prefix") and f("adapter/gate")
    assert not f("layers/attention/wq/weight")


def test_qformerv2_image_path():
    mod = get_model_module("llama_qformerv2")
    args = SphinxArgs(**TINY, vit_patch=56, clip_width=32, clip_layers=2,
                      clip_heads=2, qformer_width=32, qformer_layers=2,
                      qformer_heads=2)
    params = mod.init_params(jax.random.PRNGKey(0), args)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 224, 224))
    toks = mod.encode_image(params, args, imgs)
    assert toks.shape == (2, 34, args.dim)  # 32 queries + start/end

    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 0, 96)
    logits, _ = mod.forward(params, args, tokens, images=imgs)
    assert logits.shape == (2, 6, 96)

    f = mod.get_trainable_params_filter(args)
    assert not f("visual/qformer/queries")
    assert f("visual/qformer_proj/linear/weight")
    assert f("layers/attention/wq/weight")


def test_adapter_visual_prefix():
    mod = get_model_module("llama_adapter")
    args = AdapterArgs(**TINY, prefix_layers=2, prefix_len=4,
                       v_embed_dim=32, v_depth=2, v_num_heads=2)
    params = mod.init_params(jax.random.PRNGKey(0), args, with_visual=True)
    assert "visual" in params

    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 96)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 224, 224))

    # gates zero → image cannot change the output (zero-init property holds
    # through the visual stage too)
    a, _ = mod.forward(params, args, toks, images=imgs)
    b, _ = mod.forward(params, args, toks)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    # with open gates the image changes the output
    params["adapter"]["gate"] = jnp.ones_like(params["adapter"]["gate"])
    a2, _ = mod.forward(params, args, toks, images=imgs)
    b2, _ = mod.forward(params, args, toks)
    assert not np.allclose(np.asarray(a2), np.asarray(b2))


def test_qformerv2_through_metamodel(tmp_path):
    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers

    from accessory_tpu.meta import MetaModel

    tk = HFTok(models.BPE(unk_token=None))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    tk.decoder = decoders.ByteLevel()
    tr = trainers.BpeTrainer(vocab_size=300, special_tokens=["<s>", "</s>"],
                             initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tk.train_from_iterator(["the quick brown fox"] * 30, tr)
    tk.save(str(tmp_path / "tok.json"))

    m = MetaModel("llama_qformerv2",
                  {"dim": 64, "n_layers": 2, "n_heads": 4, "n_kv_heads": 2,
                   "multiple_of": 32, "dtype": "float32", "vit_patch": 56,
                   "clip_width": 32, "clip_layers": 2, "clip_heads": 2,
                   "qformer_width": 32, "qformer_layers": 2,
                   "qformer_heads": 2},
                  tokenizer_path=str(tmp_path / "tok.json"), max_seq_len=256)
    assert m.with_visual
    imgs = np.random.RandomState(0).randn(1, 3, 224, 224).astype(np.float32)
    out = m.generate(["the quick"], images=imgs, max_gen_len=3)
    assert len(out) == 1 and isinstance(out[0], str)
