"""Continuous-batching scheduler tests: greedy outputs must match the static
batched engine; mid-flight admission with more requests than slots; slot
reuse."""

import jax
import numpy as np
import pytest

from accessory_tpu.engine.scheduler import ContinuousBatcher
from accessory_tpu.meta import MetaModel

CORPUS = ["the quick brown fox jumps over the lazy dog",
          "hello world this is a scheduler test"] * 30


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


def greedy_reference(model, prompt, n):
    import jax.numpy as jnp

    toks = model.tokenizer.encode(prompt, bos=True, eos=False)
    out = []
    for _ in range(n):
        logits, _ = model.module.forward(
            model.params, model.args, jnp.asarray([toks + out], jnp.int32))
        nxt = int(jnp.argmax(logits[0, -1]))
        if nxt == model.tokenizer.eos_id:
            break
        out.append(nxt)
    return model.tokenizer.decode(out)


def test_scheduler_matches_teacher_forced(model):
    prompts = ["the quick brown", "hello world this"]
    cb = ContinuousBatcher(model.module, model.args, model.params,
                           model.tokenizer, slots=2, page_size=32)
    outs = cb.run(prompts, max_gen_len=6)
    for p, o in zip(prompts, outs):
        assert o == greedy_reference(model, p, 6), (p, o)


def test_more_requests_than_slots(model):
    prompts = ["the quick", "hello world", "brown fox", "lazy dog", "this is"]
    cb = ContinuousBatcher(model.module, model.args, model.params,
                           model.tokenizer, slots=2, page_size=32)
    outs = cb.run(prompts, max_gen_len=5)
    assert len(outs) == 5
    for p, o in zip(prompts, outs):
        assert o == greedy_reference(model, p, 5), (p, o)


def test_incremental_admission(model):
    cb = ContinuousBatcher(model.module, model.args, model.params,
                           model.tokenizer, slots=2, page_size=32)
    a = cb.add_request("the quick", max_gen_len=4)
    cb.step()
    cb.step()
    b = cb.add_request("hello world", max_gen_len=4)  # admitted mid-flight
    while cb.pending or any(r is not None for r in cb.active.values()):
        cb.step()
    by_uid = {r.uid: r for r in cb.finished}
    assert set(by_uid) == {a, b}
    assert model.tokenizer.decode(by_uid[a].generated) == \
        greedy_reference(model, "the quick", 4)
    assert model.tokenizer.decode(by_uid[b].generated) == \
        greedy_reference(model, "hello world", 4)
