"""Tokenizer tests: backend loading, bos/eos, segment probing, save/reload.

Builds a small byte-level BPE tokenizer in-memory (no network) — stands in
for the reference's LLaMA sentencepiece model.
"""

import pytest

from accessory_tpu.tokenizer import Tokenizer, probe_tokenizer_path_from_pretrained

CORPUS = [
    "Hi my darling how are you today",
    "the quick brown fox jumps over the lazy dog",
    "hello world this is a test of the tokenizer",
    "import jax and jax numpy as jnp",
    "@ = > ` \\ \n prefix characters",
] * 20


@pytest.fixture(scope="module")
def tok_file(tmp_path_factory):
    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers

    tk = HFTok(models.BPE(unk_token=None))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    tk.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tk.train_from_iterator(CORPUS, trainer)
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tk.save(str(path))
    return str(path)


def test_load_and_specials(tok_file):
    t = Tokenizer(tok_file)
    assert t.backend == "tokenizers"
    assert t.bos_id is not None and t.eos_id is not None
    assert t.n_words >= 300


def test_encode_bos_eos(tok_file):
    t = Tokenizer(tok_file)
    ids = t.encode("hello world", bos=True, eos=True)
    assert ids[0] == t.bos_id and ids[-1] == t.eos_id
    inner = t.encode("hello world", bos=False, eos=False)
    assert ids[1:-1] == inner


def test_roundtrip_decode(tok_file):
    t = Tokenizer(tok_file)
    s = "the quick brown fox"
    assert t.decode(t.encode(s, bos=False, eos=False)).strip() == s


def test_segment_probing(tok_file):
    t = Tokenizer(tok_file)
    full = t.encode("Hi my darling", bos=False, eos=False)
    seg = t.encode_segment("my darling")
    assert full[-len(seg):] == seg


def test_save_probe_reload(tok_file, tmp_path):
    t = Tokenizer(tok_file)
    t.save(str(tmp_path))
    found = probe_tokenizer_path_from_pretrained(str(tmp_path))
    assert found is not None
    t2 = Tokenizer(found if found.endswith(".json") else found)
    assert t2.encode("hello", bos=False, eos=False) == t.encode("hello", bos=False, eos=False)
