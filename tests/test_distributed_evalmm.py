"""Multi-host helpers + eval_mm tests (single-process: init no-ops; mesh
helper exercises the dcn-less path; VQA metric + driver on a tiny model)."""

import json

import jax
import numpy as np
import pytest


def test_init_distributed_single_process():
    from accessory_tpu.parallel.distributed import init_distributed_mode

    info = init_distributed_mode()
    assert info["rank"] == 0 and info["world_size"] == 1
    assert info["local_devices"] == len(jax.devices())


def test_make_global_mesh_single_host():
    from accessory_tpu.parallel.distributed import make_global_mesh

    mesh = make_global_mesh(tp=2, fsdp=2)
    assert dict(mesh.shape) == {"dp": 2, "fsdp": 2, "ep": 1, "tp": 2}


def test_vqa_accuracy_metric():
    from accessory_tpu.eval.eval_mm import normalize_answer, vqa_accuracy

    assert normalize_answer("The Cat.") == "cat"
    assert vqa_accuracy("a cat", ["cat", "cat", "cat", "dog"]) == 1.0
    assert vqa_accuracy("dog", ["cat", "cat", "dog"]) == pytest.approx(1 / 3)
    assert vqa_accuracy("fish", ["cat"]) == 0.0


def test_evaluate_vqa_driver(tmp_path):
    from PIL import Image

    from accessory_tpu.eval.eval_mm import evaluate_vqa
    from accessory_tpu.meta import MetaModel

    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers

    tk = HFTok(models.BPE(unk_token=None))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    tk.decoder = decoders.ByteLevel()
    tr = trainers.BpeTrainer(vocab_size=300, special_tokens=["<s>", "</s>"],
                             initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tk.train_from_iterator(["what is in the image a cat"] * 40, tr)
    tk.save(str(tmp_path / "tokenizer.json"))

    m = MetaModel(
        "llama_ens_light",
        {"dim": 64, "n_layers": 2, "n_heads": 4, "n_kv_heads": 2,
         "multiple_of": 32, "dtype": "float32", "vit_patch": 56,
         "clip_width": 32, "clip_layers": 2, "clip_heads": 2,
         "dino_width": 48, "dino_layers": 2, "dino_heads": 2,
         "convnext_depths": (1, 1, 1, 1), "convnext_dims": (8, 16, 32, 64),
         "qformer_width": 32, "qformer_layers": 2, "qformer_heads": 2},
        tokenizer_path=str(tmp_path / "tokenizer.json"), max_seq_len=640)
    Image.new("RGB", (64, 64), (255, 0, 0)).save(tmp_path / "img.png")
    items = [{"image": str(tmp_path / "img.png"),
              "question": "what is in the image", "answer": "a cat"}]
    res = evaluate_vqa(m, items, max_gen_len=4)
    assert res["total"] == 1 and 0.0 <= res["accuracy"] <= 1.0


def test_refcoco_metrics():
    from accessory_tpu.eval.eval_mm import box_iou, extract_box

    assert extract_box("the box is [10, 20, 30, 40].") == (10, 20, 30, 40)
    assert extract_box("(1.5, 2.5, 3.5, 4.5)") == (1.5, 2.5, 3.5, 4.5)
    assert extract_box("no box here") is None
    assert box_iou((0, 0, 10, 10), (0, 0, 10, 10)) == 1.0
    assert box_iou((0, 0, 10, 10), (5, 5, 15, 15)) == pytest.approx(25 / 175)
    assert box_iou((0, 0, 1, 1), (5, 5, 6, 6)) == 0.0
