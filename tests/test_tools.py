"""Tools tests: delta extract/apply roundtrip, packed-data generation, and
HF export with a *golden parity* check — our functional forward vs
transformers' LlamaForCausalLM on the exported weights (the strongest
numerics test available without pretrained checkpoints)."""

import json
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.checkpoint import load_checkpoint, save_checkpoint
from accessory_tpu.config import LLaMAArgs
from accessory_tpu.models import llama


def tiny(dtype="float32"):
    args = LLaMAArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=96,
                     multiple_of=32, max_seq_len=64, dtype=dtype)
    return args, llama.init_params(jax.random.PRNGKey(0), args)


def test_delta_extract_apply_roundtrip(tmp_path):
    from accessory_tpu.tools.weight_operate import apply_delta, extract_delta

    args, base = tiny()
    tuned = jax.tree.map(lambda x: x + 0.01, base)
    bdir, tdir, ddir, mdir = [str(tmp_path / n) for n in "btdm"]
    save_checkpoint(bdir, base)
    save_checkpoint(tdir, tuned)

    extract_delta(bdir, tdir, ddir)
    apply_delta(bdir, ddir, mdir)
    merged = load_checkpoint(mdir)
    for a, b in zip(jax.tree.leaves(tuned), jax.tree.leaves(merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_generate_packed_data(tmp_path):
    import pandas as pd

    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers

    from accessory_tpu.tokenizer import Tokenizer
    from accessory_tpu.tools.generate_packed_data import pack_file

    tk = HFTok(models.BPE(unk_token=None))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    tk.decoder = decoders.ByteLevel()
    tr = trainers.BpeTrainer(vocab_size=300, special_tokens=["<s>", "</s>"],
                             initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tk.train_from_iterator(["the quick brown fox"] * 30, tr)
    tk.save(str(tmp_path / "tok.json"))
    tok = Tokenizer(str(tmp_path / "tok.json"))

    pd.DataFrame({"content": ["the quick brown fox jumps " * 10] * 6}
                 ).to_parquet(tmp_path / "c.parquet")
    n = pack_file(str(tmp_path / "c.parquet"), str(tmp_path / "c.pkl"), tok, 16)
    assert n > 0
    with open(tmp_path / "c.pkl", "rb") as f:
        packed = pickle.load(f)
    assert all(len(s) == 16 for s in packed)


def test_hf_export_logit_parity(tmp_path):
    """Export a tiny random llama to HF format and verify transformers
    produces (near-)identical logits — validates layout transposes, RoPE
    permutation, and naming in one shot."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from accessory_tpu.tools.convert_weights_to_hf import convert_to_hf

    args, params = tiny()
    src = str(tmp_path / "src")
    save_checkpoint(src, params)
    (tmp_path / "src" / "config.json").write_text(json.dumps({
        "dim": args.dim, "n_layers": args.n_layers, "n_heads": args.n_heads,
        "n_kv_heads": args.kv_heads, "norm_eps": args.norm_eps,
        "rope_theta": args.rope_theta, "max_seq_len": args.max_seq_len}))
    dst = str(tmp_path / "hf")
    convert_to_hf(src, dst)

    cfg = LlamaConfig(**{k: v for k, v in json.loads(
        (tmp_path / "hf" / "config.json").read_text()).items()
        if k not in ("architectures", "model_type", "torch_dtype")})
    model = LlamaForCausalLM(cfg)
    from safetensors.torch import load_file

    sd = load_file(str(tmp_path / "hf" / "model.safetensors"))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("rotary" in m or "inv_freq" in m for m in missing), missing
    model.eval()

    tokens = np.array([[1, 5, 9, 42, 7, 3]], np.int32)
    ours, _ = llama.forward(params, args, jnp.asarray(tokens))
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_hf_roundtrip_ours_to_hf_to_ours(tmp_path):
    """Export → re-import must be the identity (validates the RoPE
    permutation inverse and every transpose)."""
    from accessory_tpu.checkpoint.native import flatten_params
    from accessory_tpu.tools.convert_weights_to_hf import (
        convert_hf_to_ours, convert_to_hf)

    args, params = tiny()
    src = str(tmp_path / "src")
    save_checkpoint(src, params)
    (tmp_path / "src" / "config.json").write_text(json.dumps({
        "dim": args.dim, "n_layers": args.n_layers, "n_heads": args.n_heads,
        "n_kv_heads": args.kv_heads}))
    dst = str(tmp_path / "hf")
    convert_to_hf(src, dst)
    back = convert_hf_to_ours(dst, n_heads=args.n_heads,
                              n_kv_heads=args.kv_heads)
    ours = flatten_params(params)
    for k, v in back.items():
        np.testing.assert_allclose(np.asarray(v), np.asarray(ours[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
