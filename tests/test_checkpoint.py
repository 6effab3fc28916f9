"""Checkpoint tests: native save/load roundtrip (dense + quantized), multi-
path override + diff semantics, and PyTorch reference-format import with TP
shard merging (reference: accessory/util/tensor_parallel.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from accessory_tpu.checkpoint import (
    import_reference_checkpoint,
    infer_checkpoint_format_and_mp_size,
    load_checkpoint,
    load_checkpoint_list,
    save_checkpoint,
)
from accessory_tpu.config import LLaMAArgs, MixtralArgs
from accessory_tpu.checkpoint.native import flatten_params
from accessory_tpu.models import llama, mixtral


def tiny_llama():
    args = LLaMAArgs(dim=32, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=64,
                     multiple_of=16, max_seq_len=16, dtype="float32")
    return args, llama.init_params(jax.random.PRNGKey(0), args)


def assert_tree_equal(a, b):
    fa, fb = flatten_params(a), flatten_params(b)
    fa = {k: v for k, v in fa.items() if not k.endswith("#meta")}
    fb = {k: v for k, v in fb.items() if not k.endswith("#meta")}
    assert fa.keys() == fb.keys(), (set(fa) ^ set(fb))
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]), err_msg=k)


def test_native_roundtrip(tmp_path):
    _, params = tiny_llama()
    save_checkpoint(str(tmp_path), params)
    loaded = load_checkpoint(str(tmp_path))
    assert_tree_equal(params, loaded)


def test_native_roundtrip_quantized(tmp_path):
    from accessory_tpu.quant import quantize_params

    args, params = tiny_llama()
    qp = quantize_params(params, bits=4, group_size=16)
    save_checkpoint(str(tmp_path), qp)
    loaded = load_checkpoint(str(tmp_path))
    assert_tree_equal(qp, loaded)
    # behavioral equality
    toks = jnp.arange(8)[None, :] % args.vocab_size
    a, _ = llama.forward(qp, args, toks)
    b, _ = llama.forward(loaded, args, toks)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_bf16_roundtrip(tmp_path):
    x = {"w": jnp.arange(8, dtype=jnp.bfloat16) * 0.5}
    save_checkpoint(str(tmp_path), x)
    y = load_checkpoint(str(tmp_path))
    assert y["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(x["w"], np.float32),
                                  np.asarray(y["w"], np.float32))


def test_trainable_only_save_and_override(tmp_path):
    _, params = tiny_llama()
    base_dir, delta_dir = tmp_path / "base", tmp_path / "delta"
    save_checkpoint(str(base_dir), params)

    # simulate PEFT: save only the final norm, modified
    mod = jax.tree.map(lambda x: x, params)
    mod["norm"]["weight"] = params["norm"]["weight"] * 2
    save_checkpoint(str(delta_dir), mod, filter=lambda p: p.startswith("norm/"))

    merged = load_checkpoint_list([str(base_dir), str(delta_dir)], params)
    np.testing.assert_array_equal(np.asarray(merged["norm"]["weight"]),
                                  np.asarray(mod["norm"]["weight"]))
    np.testing.assert_array_equal(np.asarray(merged["output"]["weight"]),
                                  np.asarray(params["output"]["weight"]))


def _torch_llama_sd(args, params, prefix="llma."):
    """Reverse-map our pytree into reference-naming torch tensors."""
    sd = {}
    sd[prefix + "tok_embeddings.weight"] = torch.tensor(
        np.asarray(params["tok_embeddings"]["weight"]))
    sd[prefix + "norm.weight"] = torch.tensor(np.asarray(params["norm"]["weight"]))
    sd[prefix + "output.weight"] = torch.tensor(
        np.asarray(params["output"]["weight"]).T.copy())
    lay = params["layers"]
    for i in range(args.n_layers):
        sd[f"{prefix}layers.{i}.attention_norm.weight"] = torch.tensor(
            np.asarray(lay["attention_norm"]["weight"][i]))
        sd[f"{prefix}layers.{i}.ffn_norm.weight"] = torch.tensor(
            np.asarray(lay["ffn_norm"]["weight"][i]))
        for w in ("wq", "wk", "wv", "wo"):
            sd[f"{prefix}layers.{i}.attention.{w}.weight"] = torch.tensor(
                np.asarray(lay["attention"][w]["weight"][i]).T.copy())
        for w in ("w1", "w2", "w3"):
            sd[f"{prefix}layers.{i}.feed_forward.{w}.weight"] = torch.tensor(
                np.asarray(lay["feed_forward"][w]["weight"][i]).T.copy())
    return sd


def _shard_torch_sd(sd, mp):
    """Split a full reference sd into mp column/row shards (torch layout)."""
    col = (".wq.weight", ".wk.weight", ".wv.weight", ".w1.weight", ".w3.weight",
           "output.weight")
    row = (".wo.weight", ".w2.weight")
    embed = ("tok_embeddings.weight",)
    shards = [dict() for _ in range(mp)]
    for k, v in sd.items():
        for r in range(mp):
            if k.endswith(col):
                shards[r][k] = v.chunk(mp, dim=0)[r].clone()
            elif k.endswith(row) or k.endswith(embed):
                shards[r][k] = v.chunk(mp, dim=1)[r].clone()
            else:
                shards[r][k] = v.clone()
    return shards


def test_torch_import_merges_shards(tmp_path):
    args, params = tiny_llama()
    sd = _torch_llama_sd(args, params)
    shards = _shard_torch_sd(sd, mp=2)
    for r, sh in enumerate(shards):
        torch.save({"model": sh}, tmp_path / f"consolidated.{r:02d}-of-02.model.pth")

    fmt, mp = infer_checkpoint_format_and_mp_size(str(tmp_path))
    assert (fmt, mp) == ("consolidated", 2)

    flat = import_reference_checkpoint(str(tmp_path), "llama")
    ours = flatten_params(params)
    for k, v in flat.items():
        np.testing.assert_allclose(np.asarray(v), np.asarray(ours[k]),
                                   rtol=1e-6, err_msg=k)


def test_torch_import_into_metamodel(tmp_path):
    args, params = tiny_llama()
    sd = _torch_llama_sd(args, params)
    torch.save({"model": sd}, tmp_path / "consolidated.00-of-01.model.pth")

    loaded = load_checkpoint_list([str(tmp_path)], params, dtype="float32")
    assert_tree_equal(params, loaded)


def test_mixtral_ep_import(tmp_path):
    args = MixtralArgs(dim=32, n_layers=1, n_heads=4, n_kv_heads=2, hidden_dim=48,
                       vocab_size=64, num_experts=4, max_seq_len=16, dtype="float32")
    params = mixtral.init_params(jax.random.PRNGKey(0), args)
    ff = params["layers"]["feed_forward"]

    sd = {}
    sd["llma.tok_embeddings.weight"] = torch.tensor(np.asarray(params["tok_embeddings"]["weight"]))
    sd["llma.norm.weight"] = torch.tensor(np.asarray(params["norm"]["weight"]))
    sd["llma.output.weight"] = torch.tensor(np.asarray(params["output"]["weight"]).T.copy())
    i = 0
    sd[f"llma.layers.{i}.attention_norm.weight"] = torch.tensor(
        np.asarray(params["layers"]["attention_norm"]["weight"][i]))
    sd[f"llma.layers.{i}.ffn_norm.weight"] = torch.tensor(
        np.asarray(params["layers"]["ffn_norm"]["weight"][i]))
    for w in ("wq", "wk", "wv", "wo"):
        sd[f"llma.layers.{i}.attention.{w}.weight"] = torch.tensor(
            np.asarray(params["layers"]["attention"][w]["weight"][i]).T.copy())
    sd[f"llma.layers.{i}.feed_forward.gate.weight"] = torch.tensor(
        np.asarray(ff["gate"]["weight"][i]).T.copy())
    for e in range(args.num_experts):
        for w in ("w1", "w2", "w3"):
            sd[f"llma.layers.{i}.feed_forward.experts.{e}.{w}.weight"] = torch.tensor(
                np.asarray(ff[w]["weight"][i, e]).T.copy())
    torch.save({"model": sd}, tmp_path / "consolidated.00-of-01.model.pth")

    loaded = load_checkpoint_list([str(tmp_path)], params, dtype="float32")
    assert_tree_equal(params, loaded)


def test_streaming_loader_matches_eager(tmp_path):
    from accessory_tpu.checkpoint.native import load_checkpoint_streaming

    _, params = tiny_llama()
    save_checkpoint(str(tmp_path), params)
    eager = load_checkpoint(str(tmp_path))
    streamed = load_checkpoint_streaming(str(tmp_path))
    assert_tree_equal(eager, streamed)
