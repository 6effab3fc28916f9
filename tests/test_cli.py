"""End-to-end CLI smoke tests (tiny shapes, CPU mesh): finetune loop with
save + auto-resume, pretrain loop with val. These are the system tests the
reference lacks (SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def tok_path(tmp_path_factory):
    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers

    tk = HFTok(models.BPE(unk_token=None))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    tk.decoder = decoders.ByteLevel()
    tr = trainers.BpeTrainer(vocab_size=300, special_tokens=["<s>", "</s>"],
                             initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tk.train_from_iterator(["the quick brown fox jumps over the lazy dog"] * 40, tr)
    p = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tk.save(str(p))
    return str(p)


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    d = tmp_path_factory.mktemp("cfg")
    cfg = d / "model.json"
    cfg.write_text(json.dumps({
        "dim": 32, "n_layers": 2, "n_heads": 4, "n_kv_heads": 2,
        "multiple_of": 16}))
    return str(cfg)


def test_main_finetune_end_to_end(tok_path, tiny_cfg, tmp_path):
    from accessory_tpu.main_finetune import get_args_parser, main

    d = tmp_path / "data"
    d.mkdir()
    anns = [{"instruction": f"say {i}", "input": "", "output": f"ok {i}"}
            for i in range(16)]
    (d / "a.json").write_text(json.dumps(anns))
    data_cfg = d / "meta.yaml"
    data_cfg.write_text(yaml.dump({"META": [{"path": str(d / "a.json"),
                                             "type": "qa"}]}))
    out = str(tmp_path / "out")

    args = get_args_parser().parse_args([
        "--llama_type", "llama", "--llama_config", tiny_cfg,
        "--tokenizer_path", tok_path, "--data_config", str(data_cfg),
        "--output_dir", out, "--batch_size", "2", "--epochs", "2",
        "--max_words", "48", "--precision", "fp32", "--lr", "1e-3",
        "--warmup_epochs", "0.5", "--log_every", "2",
    ])
    state = main(args)
    assert int(state.step) > 0
    assert os.path.isdir(os.path.join(out, "epoch1"))
    assert os.path.exists(os.path.join(out, "epoch1", "weights.safetensors"))
    assert os.path.exists(os.path.join(out, "epoch1", "config.json"))
    assert os.path.exists(os.path.join(out, "epoch1", "meta.json"))
    assert os.path.exists(os.path.join(out, "log.txt"))

    # auto-resume from epoch1 and continue to epoch 3
    args2 = get_args_parser().parse_args([
        "--llama_type", "llama", "--llama_config", tiny_cfg,
        "--tokenizer_path", tok_path, "--data_config", str(data_cfg),
        "--output_dir", out, "--batch_size", "2", "--epochs", "3",
        "--max_words", "48", "--precision", "fp32", "--lr", "1e-3",
        "--warmup_epochs", "0.5",
    ])
    state2 = main(args2)
    assert int(state2.step) > int(state.step)
    assert os.path.isdir(os.path.join(out, "epoch2"))


def test_main_pretrain_smoke(tok_path, tiny_cfg, tmp_path):
    import pandas as pd

    from accessory_tpu.main_pretrain import get_args_parser, main

    d = tmp_path / "corpus"
    d.mkdir()
    for i in range(3):
        pd.DataFrame({"content": [f"doc {i}-{j} the quick brown fox" * 3
                                  for j in range(8)]}).to_parquet(
            d / f"s{i}.parquet")
    out = str(tmp_path / "out")

    args = get_args_parser().parse_args([
        "--llama_type", "llama", "--llama_config", tiny_cfg,
        "--tokenizer_path", tok_path, "--data_meta_path", str(d),
        "--output_dir", out, "--batch_size", "2", "--max_words", "32",
        "--precision", "fp32", "--max_iters", "6", "--save_freq", "4",
        "--val_freq", "4", "--val_iters", "2", "--warmup_iters", "2",
        "--lr_decay_iters", "6", "--log_every", "2",
    ])
    state = main(args)
    assert int(state.step) == 6
    assert os.path.isdir(os.path.join(out, "epoch0-iter4"))
    assert os.path.exists(os.path.join(out, "log.txt"))
