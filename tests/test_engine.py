"""Generation-engine tests: the jitted decode loop must reproduce a
host-driven teacher-forced greedy rollout; stop symbols truncate; scoring
APIs return sane values. Reference semantics: accessory/model/meta.py:371-467.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.meta import MetaModel

CORPUS = [
    "Hi my darling how are you today",
    "the quick brown fox jumps over the lazy dog",
    "hello world this is a test of the engine",
] * 30


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers

    tk = HFTok(models.BPE(unk_token=None))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    tk.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=300, special_tokens=["<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tk.train_from_iterator(CORPUS, trainer)
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tk.save(str(path))

    return MetaModel(
        "llama",
        {"dim": 64, "n_layers": 2, "n_heads": 4, "n_kv_heads": 2,
         "multiple_of": 32, "dtype": "float32"},
        tokenizer_path=str(path), max_seq_len=192)


def greedy_reference(model, prompt, n_steps):
    """Host-side greedy rollout with the training forward (no cache)."""
    toks = model.tokenizer.encode(prompt, bos=True, eos=False)
    for _ in range(n_steps):
        logits, _ = model.module.forward(
            model.params, model.args, jnp.asarray([toks], jnp.int32))
        nxt = int(jnp.argmax(logits[0, -1]))
        toks.append(nxt)
        if nxt == model.tokenizer.eos_id:
            break
    return toks


def _expected_text(model, prompt, total_len, max_gen_len):
    """Reference semantics: the loop runs to the shared total_len
    (= max_prompt + max_gen_len) but each row's output is sliced to its
    own max_gen_len tokens (meta.py:442-447)."""
    plen = len(model.tokenizer.encode(prompt, bos=True, eos=False))
    ref = greedy_reference(model, prompt, total_len - plen)
    gen = ref[plen:plen + max_gen_len]
    if model.tokenizer.eos_id in gen:
        gen = gen[: gen.index(model.tokenizer.eos_id)]
    return model.tokenizer.decode(gen)


def test_generate_matches_teacher_forced_greedy(model):
    prompts = ["the quick brown", "hello world"]
    outs = model.generate(prompts, max_gen_len=8, temperature=0.0)
    assert len(outs) == 2
    max_prompt = max(len(model.tokenizer.encode(p, bos=True, eos=False))
                     for p in prompts)
    total_len = max_prompt + 8
    for prompt, out in zip(prompts, outs):
        assert out == _expected_text(model, prompt, total_len, 8)


def test_generate_deterministic(model):
    a = model.generate(["hello world"], max_gen_len=6)
    b = model.generate(["hello world"], max_gen_len=6)
    assert a == b


def test_generate_ragged_batch(model):
    # different prompt lengths exercise the prompt-mask overwrite path
    prompts = ["the quick brown fox jumps over", "hi"]
    outs = model.generate(prompts, max_gen_len=6)
    max_prompt = max(len(model.tokenizer.encode(p, bos=True, eos=False))
                     for p in prompts)
    total_len = max_prompt + 6
    for out, p in zip(outs, prompts):
        assert out == _expected_text(model, p, total_len, 6)


def test_stop_symbol_truncates(model):
    base = model.generate(["the quick"], max_gen_len=12)[0]
    if len(base.split()) >= 2:
        stop = base.split()[0]
        stopped = model.generate(["the quick"], max_gen_len=12,
                                 additional_stop_symbols=(stop,))[0]
        assert stop not in stopped or len(stopped) <= len(base)


def test_stream_generate_matches_generate(model):
    batch = model.generate(["hello world"], max_gen_len=6)[0]
    chunks = list(model.stream_generate("hello world", max_gen_len=6))
    assert chunks[-1]["end_of_content"] is True
    assert chunks[-1]["text"] == batch


def test_evaluate_examples(model):
    res = model.evaluate_examples(
        ["the quick brown"], [" fox jumps"])
    assert len(res) == 1
    assert res[0]["ppl"] > 0
    assert res[0]["loglikelihood"] < 0


def test_evaluate_examples_batched_matches_single(model):
    """The bucketed/batched scorer must reproduce per-example scoring
    exactly: mixed lengths land in different buckets, a ragged final chunk
    exercises the zero-row padding, and results come back in input order."""
    ctxs = ["the quick brown", "hello world this is", "Hi my",
            "the quick", "hello"]
    conts = [" fox jumps", " a test", " darling how", " brown fox", " world"]
    batched = model.evaluate_examples(ctxs, conts, batch_size=2)
    singles = [model.evaluate_examples([c], [x], batch_size=1)[0]
               for c, x in zip(ctxs, conts)]
    for b, s in zip(batched, singles):
        np.testing.assert_allclose(b["loglikelihood"], s["loglikelihood"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(b["ppl"], s["ppl"], rtol=1e-4)
        assert b["max_equal"] == s["max_equal"]


def test_evaluate_examples_one_compile_per_bucket(model):
    """Mixed raw lengths that share a bucket must share ONE compile: the
    scorer's jit cache is keyed on the padded (batch, bucket) shape."""
    if hasattr(model.generator, "_score_jit"):
        del model.generator._score_jit  # fresh jit: count only this call
    ctxs = ["the quick brown fox", "hello world", "Hi my darling"] * 3
    conts = [" jumps over", " this is a test", " how are you"] * 3
    model.evaluate_examples(ctxs, conts, batch_size=4)
    sizes = model.generator._score_jit._cache_size()
    assert sizes == 1, f"expected 1 compiled shape, got {sizes}"


def test_first_token_choices_batched_matches_single(model):
    """Batched first-token MC scoring == one-at-a-time scoring."""
    from accessory_tpu.eval.tasks import _first_token_choices

    prompts = ["the quick brown fox", "hello world this",
               "Hi my darling how are you", "the quick"]
    batched = _first_token_choices(model, prompts, batch_size=2)
    singles = _first_token_choices(model, prompts, batch_size=1)
    assert batched == singles
    assert all(p in "ABCD" for p in batched)


def test_top_p_sampling_runs(model):
    outs = model.generate(["hello"], max_gen_len=5, temperature=0.8, top_p=0.9)
    assert isinstance(outs[0], str)


def test_generate_unrolled_decode_matches(model):
    """Generator with unroll_decode=True (the TPU default layout) produces
    the same greedy text as the stacked scan path."""
    from accessory_tpu.engine.generate import Generator

    g = Generator(model.module, model.args, model.params, model.tokenizer,
                  unroll_decode=True)
    assert isinstance(g.params["layers"], tuple)
    prompts = ["the quick brown", "hello world"]
    want = model.generate(prompts, max_gen_len=6, temperature=0.0)
    got = g.generate(prompts, max_gen_len=6, temperature=0.0)
    assert got == want
    # streaming path too
    chunks = list(g.stream_generate("hello world", max_gen_len=4,
                                    temperature=0.0))
    assert chunks and chunks[-1]["end_of_content"] in (True, False)


def test_stop_window_does_not_span_prompt_boundary(model):
    """A stop sequence whose first token(s) coincide with the prompt TAIL
    must not fire on the prompt/generation boundary window — the reference
    matches within generated tokens only (meta.py:452-458); the old device
    matcher returned an empty completion here."""
    prompt = "the quick brown"
    ptoks = model.tokenizer.encode(prompt, bos=True, eos=False)
    ref = greedy_reference(model, prompt, 4)
    g0 = ref[len(ptoks)]
    # inject the adversarial stop pair directly (string round-tripping
    # can't target exact token ids)
    from accessory_tpu.engine.generate import Generator

    gobj = Generator(model.module, model.args, model.params,
                     model.tokenizer)
    stop = (ptoks[-1], g0)
    old = gobj._stop_token_seqs
    gobj._stop_token_seqs = lambda extra: ((model.tokenizer.eos_id,), stop)
    try:
        out = gobj.generate([prompt], max_gen_len=4)[0]
    finally:
        gobj._stop_token_seqs = old
    # the completion must START (boundary window suppressed); it may stop
    # later if the pair legitimately recurs inside generated text
    assert out.startswith(model.tokenizer.decode([g0])), out


def test_stream_generate_multimodal_first_token(model):
    """stream_generate with spliced image embeddings must sample the first
    token from the LAST prompt position + n_image_words (it read an
    interior prompt position before)."""
    from accessory_tpu.engine.generate import Generator, _embedding_table

    emb_tokens = model.tokenizer.encode("lazy dog", bos=False, eos=False)[:4]
    table = _embedding_table(model.params)

    def encode_image(params, images):
        e = jnp.take(table, jnp.asarray([emb_tokens]), axis=0)
        return e, e.shape[1]

    g = Generator(model.module, model.args, model.params, model.tokenizer,
                  encode_image=encode_image)
    batch_out = g.generate(["hello world this"], images=np.zeros((1, 1)),
                           max_gen_len=5)[0]
    chunks = list(g.stream_generate("hello world this",
                                    images=np.zeros((1, 1)), max_gen_len=5))
    assert chunks[-1]["text"] == batch_out, (chunks[-1], batch_out)
