"""Every text model family through the FULL MetaModel.generate engine —
the integration surface a reference user touches first."""

import jax
import numpy as np
import pytest

from accessory_tpu.meta import MetaModel

CORPUS = ["the quick brown fox jumps over the lazy dog"] * 40


@pytest.fixture(scope="module")
def tok_path(tmp_path_factory):
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
    return str(p)


CONFIGS = {
    "llama": {"dim": 64, "n_layers": 2, "n_heads": 4, "n_kv_heads": 2,
              "multiple_of": 32, "dtype": "float32"},
    "llama_peft": {"dim": 64, "n_layers": 2, "n_heads": 4, "n_kv_heads": 2,
                   "multiple_of": 32, "dtype": "float32", "lora_rank": 4},
    "llama_adapter": {"dim": 64, "n_layers": 2, "n_heads": 4, "n_kv_heads": 2,
                      "multiple_of": 32, "dtype": "float32", "prefix_len": 4},
    "internlm": {"hidden_size": 64, "num_layers": 2, "num_attention_heads": 4,
                 "multiple_of": 32, "dtype": "float32"},
    "falcon": {"hidden_size": 64, "num_layers": 2, "num_attention_heads": 4,
               "num_kv_heads": 2, "dtype": "float32", "bias": True},
    "mixtral": {"dim": 64, "n_layers": 2, "n_heads": 4, "n_kv_heads": 2,
                "hidden_dim": 96, "num_experts": 4, "dtype": "float32"},
}


@pytest.mark.parametrize("llama_type", list(CONFIGS))
def test_generate_through_engine(llama_type, tok_path):
    m = MetaModel(llama_type, CONFIGS[llama_type], tokenizer_path=tok_path,
                  max_seq_len=128)
    outs = m.generate(["the quick brown", "lazy dog"], max_gen_len=5)
    assert len(outs) == 2 and all(isinstance(o, str) for o in outs)
    # deterministic greedy
    assert outs == m.generate(["the quick brown", "lazy dog"], max_gen_len=5)
    res = m.evaluate_examples(["the quick"], [" brown"])
    assert res[0]["ppl"] > 0 and isinstance(res[0]["max_equal"], bool)
