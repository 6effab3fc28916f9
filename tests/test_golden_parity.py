"""Golden-logit parity against HF transformers on real checkpoint FORMATS.

The image has no network egress (documented in BENCHMARKS.md), so real
TinyLlama/LLaMA2 weights cannot be downloaded; instead these tests exercise
the exact real-checkpoint path with locally generated checkpoints: a random
HF ``LlamaForCausalLM`` is saved with ``save_pretrained`` (true safetensors
naming + HF rotary layout), imported through our converter, and our forward
must reproduce transformers' logits. With network, the same code path loads
actual TinyLlama-1.1B (reference from_pretrained role, meta.py:80-214).
"""

import json

import numpy as np
import pytest


def _hf_llama(tmp_path, n_kv_heads):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=176,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=n_kv_heads, max_position_embeddings=64,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    return model, cfg, str(d)


@pytest.mark.parametrize("n_kv", [4, 2])
def test_hf_llama_golden_logit_parity(tmp_path, n_kv):
    """save_pretrained dir -> convert_hf_to_ours -> our forward == HF."""
    torch = pytest.importorskip("torch")

    import jax.numpy as jnp

    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama
    from accessory_tpu.tools.convert_weights_to_hf import convert_hf_to_ours

    model, hf_cfg, d = _hf_llama(tmp_path, n_kv)
    flat = convert_hf_to_ours(d, n_heads=4, n_kv_heads=n_kv)

    args = LLaMAArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=n_kv,
                     vocab_size=128, multiple_of=16,
                     ffn_dim_multiplier=None, max_seq_len=64,
                     dtype="float32", rope_style="interleaved")
    # build nested params from the flat '/'-keyed dict
    params = llama.init_params(__import__("jax").random.PRNGKey(0), args)

    def set_path(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node[p]
        assert node[path[-1]].shape == val.shape, (path, node[path[-1]].shape,
                                                   val.shape)
        node[path[-1]] = jnp.asarray(val, jnp.float32)

    for k, v in flat.items():
        set_path(params, k.split("/"), v)

    toks = np.array([[1, 5, 9, 23, 44, 17, 99, 3]], np.int32)
    ours, _ = llama.forward(params, args, jnp.asarray(toks))

    with torch.no_grad():
        theirs = model(torch.tensor(toks.astype(np.int64))).logits
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), theirs.detach().numpy(),
        rtol=2e-4, atol=2e-4)


def test_metamodel_from_hf_dir(tmp_path):
    """The MetaModel-level path: import an HF save_pretrained dir and match
    HF logits (what a user does with a downloaded TinyLlama)."""
    torch = pytest.importorskip("torch")

    import jax
    import jax.numpy as jnp

    from accessory_tpu.checkpoint.native import save_checkpoint
    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama
    from accessory_tpu.tools.convert_weights_to_hf import convert_hf_to_ours

    model, hf_cfg, d = _hf_llama(tmp_path, 2)
    flat = convert_hf_to_ours(d, n_heads=4, n_kv_heads=2)

    args = LLaMAArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     vocab_size=128, multiple_of=16, max_seq_len=64,
                     dtype="float32")
    params = llama.init_params(jax.random.PRNGKey(0), args)

    def ins(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = jnp.asarray(val, jnp.float32)

    for k, v in flat.items():
        ins(params, k.split("/"), v)

    # native checkpoint round-trip preserves golden logits
    ck = tmp_path / "native"
    save_checkpoint(str(ck), params)
    from accessory_tpu.checkpoint.native import load_checkpoint

    params2 = load_checkpoint(str(ck))
    toks = np.array([[1, 7, 3, 22]], np.int32)
    l1, _ = llama.forward(params, args, jnp.asarray(toks))
    l2, _ = llama.forward(params2, args, jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-6, atol=1e-6)

    with torch.no_grad():
        theirs = model(torch.tensor(toks.astype(np.int64))).logits
    np.testing.assert_allclose(np.asarray(l2, np.float32),
                               theirs.detach().numpy(), rtol=2e-4, atol=2e-4)


def test_w4_quantization_logit_fidelity(tmp_path):
    """W4A16 group-quantized logits stay close to FP on a real-format
    checkpoint (the OmniQuant ppl-delta role, scaled to a fixture):
    argmax agreement on most positions and bounded logit error."""
    torch = pytest.importorskip("torch")

    import jax
    import jax.numpy as jnp

    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama
    from accessory_tpu.quant import quantize_params
    from accessory_tpu.tools.convert_weights_to_hf import convert_hf_to_ours

    model, hf_cfg, d = _hf_llama(tmp_path, 2)
    flat = convert_hf_to_ours(d, n_heads=4, n_kv_heads=2)
    args = LLaMAArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     vocab_size=128, multiple_of=16, max_seq_len=64,
                     dtype="float32")
    params = llama.init_params(jax.random.PRNGKey(0), args)

    def ins(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = jnp.asarray(val, jnp.float32)

    for k, v in flat.items():
        ins(params, k.split("/"), v)

    qparams = quantize_params(params, bits=4, group_size=16, layout="std")
    toks = np.array([[1, 5, 9, 23, 44, 17, 99, 3]], np.int32)
    fp, _ = llama.forward(params, args, jnp.asarray(toks))
    q, _ = llama.forward(qparams, args, jnp.asarray(toks))
    fp, q = np.asarray(fp[0]), np.asarray(q[0])
    agree = np.mean(np.argmax(fp, -1) == np.argmax(q, -1))
    assert agree >= 0.75, agree
    # logit deviation bounded relative to the logit scale
    assert np.abs(fp - q).max() <= 0.35 * np.abs(fp).max()

    # W4 output head (decode-throughput option): argmax must stay stable
    # relative to the body-only quantization — the head is the single
    # largest bf16 leaf at decode time (BENCHMARKS.md round-2 budget)
    qh = quantize_params(params, bits=4, group_size=16, layout="std",
                         quantize_output=True)
    qh_logits, _ = llama.forward(qh, args, jnp.asarray(toks))
    qh_logits = np.asarray(qh_logits[0])
    agree_h = np.mean(np.argmax(fp, -1) == np.argmax(qh_logits, -1))
    assert agree_h >= 0.75, agree_h
    assert np.abs(fp - qh_logits).max() <= 0.4 * np.abs(fp).max()
