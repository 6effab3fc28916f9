"""Model-zoo tests: InternLM, Falcon, Mixtral forward + decode consistency.

Strategy per SURVEY.md §4: the reference has no tests; ours assert (a) shape
contracts, (b) *decode consistency* — prefill+incremental decode must
reproduce the full-sequence forward logits (the property the reference's
static KV cache implements, llama.py:160-218), (c) MoE routing exactness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.config import FalconArgs, InternLMArgs, MixtralArgs
from accessory_tpu.models import get_model_module

BATCH, SEQ, VOCAB = 2, 12, 97


def tiny_args(family):
    if family == "internlm":
        return InternLMArgs(num_layers=2, hidden_size=64, num_attention_heads=4,
                            vocab_size=VOCAB, multiple_of=32, max_seq_len=32,
                            dtype="float32")
    if family == "internlm_ln":
        return InternLMArgs(num_layers=2, hidden_size=64, num_attention_heads=4,
                            vocab_size=VOCAB, multiple_of=32, max_seq_len=32,
                            dtype="float32", norm_type="layernorm", use_swiglu=False)
    if family == "falcon":
        return FalconArgs(num_layers=2, hidden_size=64, num_attention_heads=4,
                          num_kv_heads=2, vocab_size=VOCAB, max_seq_len=32,
                          dtype="float32", bias=True)
    if family == "falcon_mqa":
        return FalconArgs(num_layers=2, hidden_size=64, num_attention_heads=4,
                          vocab_size=VOCAB, max_seq_len=32, dtype="float32",
                          new_decoder_architecture=False, multi_query=True,
                          parallel_attn=True, bias=False)
    if family == "mixtral":
        return MixtralArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                           hidden_dim=96, vocab_size=VOCAB, num_experts=4,
                           num_experts_per_tok=2, max_seq_len=32, dtype="float32")
    raise ValueError(family)


def module_for(family):
    return get_model_module(family.split("_")[0] if family != "internlm_ln" else "internlm")


@pytest.mark.parametrize(
    "family", ["internlm", "internlm_ln", "falcon", "falcon_mqa", "mixtral"])
def test_forward_shape_and_decode_consistency(family):
    args = tiny_args(family)
    mod = module_for(family)
    params = mod.init_params(jax.random.PRNGKey(0), args)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (BATCH, SEQ), 0, VOCAB)

    logits_full, _ = mod.forward(params, args, tokens)
    assert logits_full.shape == (BATCH, SEQ, VOCAB)
    assert logits_full.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits_full)).all()

    # prefill first 8, then decode one token at a time; logits must agree
    cache = mod.init_kv_cache(args, BATCH, max_len=32)
    lp, cache = mod.forward(params, args, tokens[:, :8], cache=cache, cur_pos=0)
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(logits_full[:, :8]), rtol=2e-4, atol=2e-4)
    for i in range(8, SEQ):
        li, cache = mod.forward(params, args, tokens[:, i:i + 1], cache=cache, cur_pos=i)
        np.testing.assert_allclose(
            np.asarray(li[:, 0]), np.asarray(logits_full[:, i]), rtol=2e-4, atol=2e-4)


def test_mixtral_aux_loss():
    args = tiny_args("mixtral")
    mod = get_model_module("mixtral")
    params = mod.init_params(jax.random.PRNGKey(0), args)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (BATCH, SEQ), 0, VOCAB)
    logits, _, aux = mod.forward(params, args, tokens, with_aux_loss=True)
    assert aux.shape == ()
    # perfectly balanced loss would equal load_balancing_weight; any routing
    # gives something in (0, E * weight]
    assert 0.0 < float(aux) <= args.load_balancing_weight * args.num_experts


def test_unstacked_decode_parity_zoo():
    """Unrolled decode (+fused attention/cache-update) matches the stacked
    scan path for mixtral, falcon, and internlm."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from accessory_tpu.config import FalconArgs, InternLMArgs, MixtralArgs
    from accessory_tpu.models import falcon, internlm, mixtral
    from accessory_tpu.models.llama import unstack_layers

    cases = [
        (mixtral, MixtralArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                              hidden_dim=96, vocab_size=128, num_experts=4,
                              max_seq_len=64, dtype="float32")),
        (falcon, FalconArgs(hidden_size=64, num_layers=2,
                            num_attention_heads=4, vocab_size=128,
                            max_seq_len=64, dtype="float32")),
        (internlm, InternLMArgs(hidden_size=64, num_layers=2,
                                num_attention_heads=4, vocab_size=128,
                                max_seq_len=64, dtype="float32")),
    ]
    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, 128, (2, 5)), jnp.int32)
    tol = dict(atol=3e-5, rtol=3e-5)
    for mod, args in cases:
        params = mod.init_params(jax.random.PRNGKey(0), args)
        un = unstack_layers(params)
        cs = mod.init_kv_cache(args, 2)
        cu = mod.init_kv_cache(args, 2, stacked=False)
        ls, cs = mod.forward(params, args, toks, cache=cs, cur_pos=0)
        lu, cu = mod.forward(un, args, toks, cache=cu, cur_pos=0)
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lu), **tol)
        ls2, cs = mod.forward(params, args, toks[:, :1], cache=cs, cur_pos=5)
        lu2, cu = mod.forward(un, args, toks[:, :1], cache=cu, cur_pos=5)
        np.testing.assert_allclose(np.asarray(ls2), np.asarray(lu2), **tol)
        np.testing.assert_allclose(
            np.asarray(cs["k"]),
            np.stack([np.asarray(c) for c in cu["k"]]), **tol)
