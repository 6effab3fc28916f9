"""Smoke tests for the light-eval task drivers (eval/tasks.py,
eval/math_util.py, eval/code_exec.py): each driver runs end-to-end on a
5-item synthetic fixture with the tiny model; extraction/scoring logic is
tested exactly."""

import json
import os

import jax
import numpy as np
import pytest

from accessory_tpu.meta import MetaModel

CORPUS = ["the quick brown fox jumps over the lazy dog",
          "answer is (A) because B seems wrong 42"] * 30


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers

    tk = HFTok(models.BPE(unk_token=None))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    tk.decoder = decoders.ByteLevel()
    tr = trainers.BpeTrainer(vocab_size=300, special_tokens=["<s>", "</s>"],
                             initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tk.train_from_iterator(CORPUS, tr)
    p = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tk.save(str(p))
    return MetaModel(
        "llama", {"dim": 64, "n_layers": 2, "n_heads": 4, "n_kv_heads": 2,
                  "multiple_of": 32, "dtype": "float32"},
        tokenizer_path=str(p), max_seq_len=256)


# ---------------------------------------------------------------------------
# extraction / scoring logic (exact)

def test_bbh_extract():
    from accessory_tpu.eval.tasks import bbh_extract_ans

    assert bbh_extract_ans("reasoning... So the answer is (B).", "multiple_choice") == "B"
    assert bbh_extract_ans("the answer is 42.\nQ: next", "free_form") == "42"
    assert bbh_extract_ans("the answer is valid#junk", "free_form") == "valid"


def test_math_util_equiv():
    from accessory_tpu.eval.math_util import (
        extract_math_answer, is_equiv, last_boxed_only_string, remove_boxed)

    s = "so we get $x=2$ and \\boxed{\\frac{1}{2}} done"
    assert remove_boxed(last_boxed_only_string(s)) == "\\frac{1}{2}"
    assert is_equiv("\\frac{1}{2}", "1/2")
    assert is_equiv("\\tfrac12", "\\frac{1}{2}")
    assert is_equiv("0.5", "\\frac{1}{2}")
    assert is_equiv("\\sqrt3", "\\sqrt{3}")
    assert is_equiv("10\\text{ inches}", "10")
    assert not is_equiv("\\frac{1}{2}", "\\frac{1}{3}")
    # reference protocol: text after "answer is ", cut at the next Problem:
    assert extract_math_answer(
        "... so $x = \\boxed{7}$.\nThe answer is 7\n\nProblem: next") == "7"
    # boxed fallback when the phrase is missing
    assert extract_math_answer("thus \\boxed{42} qed") == "42"


def test_pass_at_k_estimator():
    from accessory_tpu.eval.code_exec import estimate_pass_at_k

    assert estimate_pass_at_k(1, 1, 1) == 1.0
    assert estimate_pass_at_k(1, 0, 1) == 0.0
    np.testing.assert_allclose(estimate_pass_at_k(2, 1, 1), 0.5)
    assert estimate_pass_at_k(10, 10, 5) == 1.0


def test_code_exec_sandbox():
    from accessory_tpu.eval.code_exec import (
        build_test_program, check_program, evaluate_functional_correctness)

    prob = {"prompt": "def add(a, b):\n",
            "test": "def check(f):\n    assert f(1, 2) == 3\n",
            "entry_point": "add"}
    good = "    return a + b\n"
    bad = "    return a - b\n"
    assert check_program(build_test_program(prob["prompt"], good,
                                            prob["test"], prob["entry_point"]))
    assert not check_program(build_test_program(
        prob["prompt"], bad, prob["test"], prob["entry_point"]))
    # timeout containment
    assert not check_program("while True:\n    pass\n", timeout=1.0)
    res = evaluate_functional_correctness(
        [{"task_id": "t0", "completion": good},
         {"task_id": "t0", "completion": bad}],
        {"t0": prob}, ks=[1])
    np.testing.assert_allclose(res["pass@1"], 0.5)


# ---------------------------------------------------------------------------
# driver smoke runs (5-item fixtures, random tiny model — structure only)

def test_bbh_driver_smoke(model, tmp_path):
    d = tmp_path
    (d / "bbh").mkdir()
    (d / "cot-prompts").mkdir()
    exs = [{"input": f"is {i} even?", "target": "(A)"} for i in range(5)]
    (d / "bbh" / "snarks.json").write_text(json.dumps({"examples": exs}))
    (d / "cot-prompts" / "snarks.txt").write_text(
        "header\nheader\nQ: example?\nA: the answer is (A).\n")
    from accessory_tpu.eval.tasks import eval_bbh

    res = eval_bbh(model, str(d), tasks=["snarks"], max_gen_len=8, limit=5)
    assert "snarks" in res["tasks"] and 0.0 <= res["accuracy"] <= 1.0


def test_math_driver_smoke(model, tmp_path):
    f = tmp_path / "test.jsonl"
    with open(f, "w") as fh:
        for i in range(5):
            fh.write(json.dumps({
                "problem": f"What is {i}+1?",
                "solution": f"We compute. $\\boxed{{{i + 1}}}$"}) + "\n")
    from accessory_tpu.eval.tasks import eval_math

    res = eval_math(model, str(f), max_gen_len=8, limit=5)
    assert res["total"] == 5 and 0.0 <= res["accuracy"] <= 1.0


def test_humaneval_driver_smoke(model, tmp_path):
    f = tmp_path / "HumanEval.jsonl"
    with open(f, "w") as fh:
        for i in range(3):
            fh.write(json.dumps({
                "task_id": f"HumanEval/{i}",
                "prompt": "def f():\n",
                "test": "def check(f):\n    assert f() is None\n",
                "entry_point": "f"}) + "\n")
    from accessory_tpu.eval.tasks import eval_humaneval

    res = eval_humaneval(model, str(f), max_gen_len=8, limit=3)
    assert "pass@1" in res and res["total"] == 3


def _write_mc_csv(path, n, header):
    with open(path, "w") as f:
        f.write(header + "\n")
        for i in range(n):
            f.write(f"{i},question {i}?,yes,no,maybe,never,A\n")


def test_ceval_driver_smoke(model, tmp_path):
    (tmp_path / "val").mkdir()
    (tmp_path / "dev").mkdir()
    hdr = "id,question,A,B,C,D,answer"
    _write_mc_csv(tmp_path / "val" / "logic_val.csv", 5, hdr)
    _write_mc_csv(tmp_path / "dev" / "logic_dev.csv", 2, hdr)
    from accessory_tpu.eval.tasks import eval_ceval

    res = eval_ceval(model, str(tmp_path), ntrain=1, limit=5)
    assert "logic" in res["tasks"] and 0.0 <= res["accuracy"] <= 1.0


def test_cmmlu_driver_smoke(model, tmp_path):
    (tmp_path / "test").mkdir()
    (tmp_path / "dev").mkdir()
    hdr = "id,Question,A,B,C,D,Answer"
    _write_mc_csv(tmp_path / "test" / "physics.csv", 5, hdr)
    _write_mc_csv(tmp_path / "dev" / "physics.csv", 2, hdr)
    from accessory_tpu.eval.tasks import eval_cmmlu

    res = eval_cmmlu(model, str(tmp_path), ntrain=1, limit=5)
    assert "physics" in res["tasks"] and 0.0 <= res["accuracy"] <= 1.0
