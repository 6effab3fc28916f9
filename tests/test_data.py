"""Data-pipeline tests: finetune dataset label masking, grouped sampler
invariants + resume, pretrain iterable sharding/resume, dialog dataset
multi-turn masking, transforms. Reference: accessory/data/*."""

import json
import os
import pickle

import numpy as np
import pytest
import yaml

from accessory_tpu.data import (
    Falcon,
    FalconPacked,
    FinetuneDataset,
    FinetuneDistSampler,
    format_prompt,
)
from accessory_tpu.data.conversation import FinetuneDialogDataset, find_sublist
from accessory_tpu.tokenizer import Tokenizer

CORPUS = [
    "Hi my darling how are you today",
    "the quick brown fox jumps over the lazy dog",
    "hello world this is a test of the data pipeline",
    "write a response that appropriately completes the request",
    "below is an instruction that describes a task",
] * 20


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers

    tk = HFTok(models.BPE(unk_token=None))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    tk.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tk.train_from_iterator(CORPUS, trainer)
    p = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tk.save(str(p))
    return Tokenizer(str(p))


@pytest.fixture(scope="module")
def finetune_config(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    anns = [
        {"instruction": f"add {i} and {i+1}", "input": "", "output": str(2 * i + 1)}
        for i in range(32)
    ]
    (d / "a.json").write_text(json.dumps(anns))
    anns2 = [
        {"instruction": f"question {i}", "input": "ctx", "output": f"answer {i}"}
        for i in range(16)
    ]
    (d / "b.json").write_text(json.dumps(anns2))
    cfg = d / "meta.yaml"
    cfg.write_text(yaml.dump({"META": [
        {"path": str(d / "a.json"), "type": "qa"},
        {"path": str(d / "b.json"), "type": "ctx", "prompt_type": "alpaca"},
    ]}))
    return str(cfg)


def test_format_prompt():
    p = format_prompt({"instruction": "do X", "input": ""}, "alpaca")
    assert "### Instruction:\ndo X" in p and "### Input" not in p
    p2 = format_prompt({"instruction": "do X", "input": "with Y"}, "alpaca")
    assert "### Input:\nwith Y" in p2
    assert format_prompt({"instruction": "z"}, "None") == "z"


def test_finetune_dataset_label_masking(tok, finetune_config):
    ds = FinetuneDataset(finetune_config, max_words=64, tokenizer=tok)
    assert len(ds) == 48
    tokens, labels, mask = ds[0]
    assert tokens.shape == (64,) and labels.shape == (64,)
    # prompt region fully masked (0), answer region matches tokens
    item = json.loads(open(finetune_config.replace("meta.yaml", "a.json")).read())[0]
    nz = np.nonzero(labels)[0]
    assert len(nz) > 0
    np.testing.assert_array_equal(labels[nz], tokens[nz])
    prompt_len = len(tok.encode(
        format_prompt(dict(item, sys_prompt="alpaca"), "alpaca"), bos=True, eos=False))
    assert np.all(labels[:prompt_len] == 0)


def test_sampler_single_type_batches_and_resume(tok, finetune_config):
    ds = FinetuneDataset(finetune_config, max_words=64, tokenizer=tok)
    bs = 4
    samplers = [FinetuneDistSampler(ds, num_replicas=2, rank=r, batch_size=bs,
                                    seed=1) for r in range(2)]
    idx = [list(iter(s)) for s in samplers]
    assert len(idx[0]) == len(idx[1])
    groups = ds.groups()

    def type_of(i):
        return 0 if i in groups[0] else 1

    # every global batch (bs from each rank at the same step) is one type
    for b in range(len(idx[0]) // bs):
        batch = idx[0][b * bs:(b + 1) * bs] + idx[1][b * bs:(b + 1) * bs]
        assert len({type_of(i) for i in batch}) == 1

    # resume: set_epoch(epoch, start_iter) skips exactly start_iter batches
    s0 = FinetuneDistSampler(ds, num_replicas=2, rank=0, batch_size=bs, seed=1)
    s0.set_epoch(0, start_iter=2)
    resumed = list(iter(s0))
    assert resumed == idx[0][2 * bs:]


def test_falcon_iterable_and_resume(tok, tmp_path):
    import pandas as pd

    for i in range(3):
        pd.DataFrame({"content": [f"file{i} doc{j} " + "text " * j
                                  for j in range(5)]}).to_parquet(
            tmp_path / f"shard{i}.parquet")
    ds = Falcon(str(tmp_path), max_words=16, tokenizer=tok, split="train")
    assert len(ds.files) == 2  # last file reserved for val
    it = iter(ds)
    first = [next(it) for _ in range(7)]
    assert all(x.shape == (16,) for x in first)

    state = ds.state_dict()
    ds2 = Falcon(str(tmp_path), max_words=16, tokenizer=tok, split="train")
    ds2.load_state_dict(state)
    nxt = next(iter(ds2))
    np.testing.assert_array_equal(nxt, next(it))

    val = Falcon(str(tmp_path), max_words=16, tokenizer=tok, split="val")
    assert len(val.files) == 1


def test_falcon_packed(tmp_path):
    for i in range(2):
        with open(tmp_path / f"p{i}.pkl", "wb") as f:
            pickle.dump([[i, j, j + 1, 0] for j in range(4)], f)
    ds = FalconPacked(str(tmp_path), split="train")
    item = next(iter(ds))
    assert item.dtype == np.int32 and item.shape == (4,)


def test_dialog_dataset_masks_only_assistant(tok, tmp_path):
    anns = [{
        "conversations": [
            {"from": "human", "value": "the quick brown fox"},
            {"from": "gpt", "value": "jumps over the lazy dog"},
            {"from": "human", "value": "hello world"},
            {"from": "gpt", "value": "this is a test"},
        ],
    } for _ in range(4)]
    (tmp_path / "dlg.json").write_text(json.dumps(anns))
    cfg = tmp_path / "meta.yaml"
    cfg.write_text(yaml.dump({"META": [{"path": str(tmp_path / "dlg.json"),
                                        "type": "dialog"}]}))
    ds = FinetuneDialogDataset(str(cfg), max_words=256, tokenizer=tok)
    tokens, labels, mask = ds[0]
    nz = np.nonzero(labels)[0]
    assert len(nz) > 0
    np.testing.assert_array_equal(labels[nz], tokens[nz])
    # both assistant replies must appear in the labels
    text = tok.decode([int(t) for t in labels[nz]])
    assert "jumps over the lazy dog" in text and "this is a test" in text


def test_find_sublist():
    assert find_sublist([1, 2, 3, 4], [3, 4]) == 2
    assert find_sublist([1, 2], [5]) == -1


def test_transforms(tmp_path):
    from PIL import Image

    from accessory_tpu.data.transform import (
        padded_resize, random_resized_crop, resized_center_crop)

    img = Image.new("RGB", (320, 200), (128, 64, 32))
    for fn in (lambda i: resized_center_crop(i, 224),
               lambda i: random_resized_crop(i, 224),
               lambda i: padded_resize(i, 224)):
        out = fn(img)
        assert out.shape == (3, 224, 224) and out.dtype == np.float32


def test_conversation_templates_registry():
    from accessory_tpu.data.conversation import CONV_TEMPLATES, SeparatorStyle

    assert set(CONV_TEMPLATES) >= {"default", "v1", "simple", "multimodal",
                                   "llava_v1", "bair_v1", "vicuna_v1_1"}
    v = CONV_TEMPLATES["vicuna_v1_1"]()
    v.load_qas([["hi", "hello"], ["bye", None]])
    p = v.process()
    assert p["conv"].endswith("ASSISTANT:")
    assert p["to_predict"] == ["hello</s>"]
    assert v.response_end_signal == "</s>"
    s = CONV_TEMPLATES["v1"]()
    s.load_qas([["hi", None]])
    assert s.get_prompt().endswith("Assistant:")
