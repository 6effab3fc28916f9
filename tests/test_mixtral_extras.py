"""Mixtral extras: PEFT adapters, paged decode parity, and a LLaMA2-70B
sharded-lowering check (GSPMD partitioning of the production config compiles
without materializing 70B of weights)."""

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.config import LLaMAArgs, MixtralArgs
from accessory_tpu.models import llama, mixtral

TINY = dict(dim=64, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=96,
            vocab_size=96, num_experts=4, max_seq_len=64, dtype="float32")


def test_mixtral_peft_identity_and_filter():
    args = MixtralArgs(**TINY, lora_rank=4, bias_tuning=True)
    plain = MixtralArgs(**TINY)
    p = mixtral.init_params(jax.random.PRNGKey(0), args)
    p0 = mixtral.init_params(jax.random.PRNGKey(0), plain)
    toks = jnp.arange(8)[None] % 96
    a, _ = mixtral.forward(p, args, toks)
    b, _ = mixtral.forward(p0, plain, toks)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    f = mixtral.get_trainable_params_filter(args)
    assert f("layers/attention/wq/lora_b") and f("layers/attention/wq/bias")
    assert not f("layers/feed_forward/w1/weight")


def test_mixtral_paged_decode_matches_dense():
    args = MixtralArgs(**TINY)
    params = mixtral.init_params(jax.random.PRNGKey(0), args)
    b, prefill, steps = 2, 8, 3
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, prefill + steps), 0, 96)

    dense = mixtral.init_kv_cache(args, b, max_len=32)
    ld, dense = mixtral.forward(params, args, tokens[:, :prefill],
                                cache=dense, cur_pos=0)
    pc = mixtral.init_paged_cache(args, slots=b, total_pages=2 * 4, page_size=8,
                                  pages_per_seq=4)
    lp, pc = mixtral.forward_paged(params, args, tokens[:, :prefill], pc)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ld), rtol=3e-4, atol=3e-4)
    for i in range(prefill, prefill + steps):
        ldd, dense = mixtral.forward(params, args, tokens[:, i:i + 1],
                                     cache=dense, cur_pos=i)
        lpp, pc = mixtral.forward_paged(params, args, tokens[:, i:i + 1], pc)
        np.testing.assert_allclose(np.asarray(lpp), np.asarray(ldd),
                                   rtol=4e-4, atol=4e-4)


def test_llama70b_sharded_lowering():
    """Lower (not run) the full LLaMA2-70B W4-shape forward over an 8-device
    mesh — validates the production config's sharding specs end-to-end
    without 35GB of weights (BASELINE config 4's single-host slice)."""
    from accessory_tpu.parallel import INFERENCE_RULES, make_mesh
    from accessory_tpu.parallel.mesh import named_sharding_tree

    args = LLaMAArgs(dim=8192, n_layers=80, n_heads=64, n_kv_heads=8,
                     vocab_size=32000, multiple_of=4096,
                     ffn_dim_multiplier=1.3, max_seq_len=128, dtype="bfloat16")
    assert args.ffn_hidden_dim == 28672

    shapes = jax.eval_shape(lambda: llama.init_params(jax.random.PRNGKey(0), args))
    mesh = make_mesh({"dp": 1, "fsdp": 1, "ep": 1, "tp": 8})
    shardings = named_sharding_tree(llama.param_axes(args), mesh,
                                    INFERENCE_RULES)
    cache_shape = jax.eval_shape(
        lambda: llama.init_kv_cache(args, 2, max_len=128))

    def fwd(params, tokens, cache):
        return llama.forward(params, args, tokens, cache=cache, cur_pos=0)

    lowered = jax.jit(fwd, in_shardings=(shardings, None, None)).lower(
        shapes, jax.ShapeDtypeStruct((2, 16), jnp.int32), cache_shape)
    hlo = lowered.as_text()
    assert "sharding" in hlo  # GSPMD annotations survived


def test_mixtral_quantized_experts_forward():
    from accessory_tpu.quant import DEFAULT_BLOCKLIST, quantize_params

    args = MixtralArgs(**TINY, dtype="float32") if "dtype" not in TINY else \
        MixtralArgs(**TINY)
    params = mixtral.init_params(jax.random.PRNGKey(0), args)
    qp = quantize_params(params, bits=4, group_size=16)
    # expert weights got the 4-D path
    assert hasattr(qp["layers"]["feed_forward"]["w1"]["weight"], "packed")
    assert qp["layers"]["feed_forward"]["w1"]["weight"].packed.ndim == 4

    toks = jnp.arange(8)[None] % 96
    ref, _ = mixtral.forward(params, args, toks)
    out, _ = mixtral.forward(qp, args, toks)
    # quantization error only: correlation of logits stays high
    r = np.corrcoef(np.asarray(ref).ravel(), np.asarray(out).ravel())[0, 1]
    assert r > 0.98, r


def test_mixtral_forward_paged_chunked_continuation():
    """Chunked (continuation=True) paged prefill == one-shot, MoE decoder."""
    import numpy as np

    from accessory_tpu.models import mixtral

    args = MixtralArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                       hidden_dim=128, vocab_size=97, num_experts=4,
                       num_experts_per_tok=2, max_seq_len=32,
                       dtype="float32")
    params = mixtral.init_params(jax.random.PRNGKey(0), args)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 97)

    pc1 = mixtral.init_paged_cache(args, slots=2, total_pages=8, page_size=8)
    l1, pc1 = mixtral.forward_paged(params, args, toks, pc1)

    pc2 = mixtral.init_paged_cache(args, slots=2, total_pages=8, page_size=8)
    for c in range(2):
        lc, pc2 = mixtral.forward_paged(params, args, toks[:, c * 4:(c + 1) * 4],
                                        pc2, continuation=True)
    np.testing.assert_allclose(np.asarray(lc), np.asarray(l1[:, -4:]),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_array_equal(np.asarray(pc1.lengths),
                                  np.asarray(pc2.lengths))


def test_mixtral_forward_paged_int8_kv():
    """int8 page pools through the MoE paged path stay close to bf16."""
    import numpy as np

    from accessory_tpu.models import mixtral

    args = MixtralArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                       hidden_dim=128, vocab_size=97, num_experts=4,
                       num_experts_per_tok=2, max_seq_len=32,
                       dtype="float32")
    params = mixtral.init_params(jax.random.PRNGKey(0), args)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 97)

    pc = mixtral.init_paged_cache(args, slots=2, total_pages=8, page_size=8)
    l0, pc = mixtral.forward_paged(params, args, toks, pc)
    d0, pc = mixtral.forward_paged(params, args, toks[:, :1], pc)

    pc8 = mixtral.init_paged_cache(args, slots=2, total_pages=8, page_size=8,
                                   kv_dtype="int8")
    l8, pc8 = mixtral.forward_paged(params, args, toks, pc8)
    assert pc8.ks_pages is not None
    d8, pc8 = mixtral.forward_paged(params, args, toks[:, :1], pc8)
    np.testing.assert_allclose(np.asarray(d8), np.asarray(d0), atol=0.35)


def test_mixtral_forward_paged_unrolled_matches_scan():
    """Unrolled (serving-layout, per-layer params + static layer index into
    the whole pools) paged decode == the stacked scan path."""
    import numpy as np

    from accessory_tpu.models import llama, mixtral

    args = MixtralArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                       hidden_dim=128, vocab_size=97, num_experts=4,
                       num_experts_per_tok=2, max_seq_len=32,
                       dtype="float32")
    params = mixtral.init_params(jax.random.PRNGKey(0), args)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 97)

    pc1 = mixtral.init_paged_cache(args, slots=2, total_pages=8, page_size=8)
    l1, pc1 = mixtral.forward_paged(params, args, toks, pc1)
    d1, pc1 = mixtral.forward_paged(params, args, toks[:, :1], pc1)

    up = llama.unstack_layers(params)
    pc2 = mixtral.init_paged_cache(args, slots=2, total_pages=8, page_size=8)
    l2, pc2 = mixtral.forward_paged(up, args, toks, pc2)
    d2, pc2 = mixtral.forward_paged(up, args, toks[:, :1], pc2)

    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=2e-5, atol=2e-5)
    # scan and unrolled lower to differently-fused f32 graphs — cached
    # values agree to roundoff, not bit-exactly
    np.testing.assert_allclose(np.asarray(pc1.k_pages),
                               np.asarray(pc2.k_pages), rtol=2e-5, atol=2e-5)
