"""Standing quantization-accuracy number: fixture ppl FP vs W4 vs W3.

VERDICT r4 item 6: the OmniQuant ppl north star (BASELINE.md — WikiText-2
delta <= ~0.15 at W4A16 g128 on llama2-7b) needs real weights this image
cannot download. This produces the same protocol end-to-end at fixture
scale so the pipeline quantize -> pack -> kernel -> sliding-window ppl
(eval/harness.py:13) is exercised and real weights become a config change
(exps/verify_real_weights.py step [3/4] runs the identical code path).

Method: a deterministic Markov-chain corpus over a 257-word vocabulary; a
small LLaMA (dim 256, 4L, GQA 8/4 — every matmul K divisible by 128 so
W4/W3 g128 quantize the whole decoder) is trained on it until ppl is far
below uniform, then scored FP, W4A16 g128, and W3A16 g128 with the same
harness.perplexity windows. On TPU the quantized scorings run through the
Pallas planes kernel (the serving path); on CPU the XLA fallback.

Prints one JSON line per config + a delta summary line.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    if jax.config.jax_platforms == "cpu":
        from accessory_tpu.util.compile_cache import enable_cpu_cache

        enable_cpu_cache()
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

import jax.numpy as jnp
import numpy as np

VOCAB = 257  # 256 words + bos
SEQ = 256


class WordTok:
    """Deterministic word-id tokenizer for the synthetic corpus."""

    bos_id, eos_id, n_words = 0, 0, VOCAB

    def encode(self, s, bos=True, eos=False):
        ids = [int(w) + 1 for w in s.split()]
        return ([0] + ids if bos else ids) + ([0] if eos else [])

    def decode(self, ids):
        return " ".join(str(i - 1) for i in ids if i > 0)


def markov_corpus(n_tokens: int, seed: int = 0) -> str:
    """Zipf-initialized 256-state Markov chain — learnable but not trivial
    (held-out ppl of the TRUE chain is e^H ≈ 4-6 here; uniform is 256).

    The transition matrix is FIXED (its own rng); ``seed`` only varies the
    rollout, so different seeds are train/held-out splits of one chain.
    """
    k = VOCAB - 1
    # sparse rows: each state transitions to ~8 successors, Zipf weights
    rng_chain = np.random.RandomState(12345)
    trans = np.zeros((k, k))
    for s in range(k):
        succ = rng_chain.choice(k, size=8, replace=False)
        w = 1.0 / np.arange(1, 9) ** 1.2
        trans[s, succ] = rng_chain.permutation(w)
    trans /= trans.sum(1, keepdims=True)
    rng = np.random.RandomState(seed)
    out, s = [], 0
    for _ in range(n_tokens):
        s = rng.choice(k, p=trans[s])
        out.append(str(s))
    return " ".join(out)


def train_fixture(args, corpus_ids: np.ndarray, steps: int, batch: int = 8):
    from accessory_tpu.models import llama
    from accessory_tpu.train import TrainState, make_optimizer, make_train_step

    params = llama.init_params(jax.random.PRNGKey(0), args)
    tx = make_optimizer(params, 3e-3, clip_norm=1.0)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(llama, args, tx, remat=False))
    rng = np.random.RandomState(1)
    n = len(corpus_ids) - SEQ - 1
    loss = float("nan")
    for i in range(steps):
        starts = rng.randint(0, n, size=batch)
        ex = np.stack([corpus_ids[s: s + SEQ] for s in starts])
        # labels are input-ALIGNED: cross_entropy_loss shifts internally
        # (train/loss.py:25-30)
        state, metrics = step(state, {"examples": jnp.asarray(ex),
                                      "labels": jnp.asarray(ex)})
        if i % 50 == 0 or i == steps - 1:
            loss = float(metrics["loss"])
            print(f"  train step {i}: loss {loss:.3f}", file=sys.stderr,
                  flush=True)
    return state.params, loss


class _Shim:
    """Minimal model object for harness.perplexity (the MetaModel surface
    it touches: .tokenizer/.module/.params/.args)."""

    def __init__(self, module, args, params, tokenizer):
        self.module, self.args, self.params, self.tokenizer = (
            module, args, params, tokenizer)


def main():
    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.eval.harness import perplexity
    from accessory_tpu.models import llama
    from accessory_tpu.quant import DEFAULT_BLOCKLIST, quantize_params

    steps = int(os.environ.get("PPL_TRAIN_STEPS",
                               "300" if jax.default_backend() == "tpu"
                               else "150"))
    max_windows = int(os.environ.get("PPL_MAX_WINDOWS", "8"))

    args = LLaMAArgs(dim=256, n_layers=4, n_heads=8, n_kv_heads=4,
                     vocab_size=VOCAB, multiple_of=128, max_seq_len=SEQ,
                     dtype="float32")
    tok = WordTok()
    train_text = markov_corpus(60_000, seed=0)
    held_text = markov_corpus(6_000, seed=7)  # same chain, fresh rollout
    ids = np.asarray(tok.encode(train_text, bos=False), np.int32)

    t0 = time.time()
    params, final_loss = train_fixture(args, ids, steps)
    print(f"  trained {steps} steps in {time.time()-t0:.0f}s "
          f"(final loss {final_loss:.3f})", file=sys.stderr, flush=True)

    block = tuple(DEFAULT_BLOCKLIST) + ("output",)
    results = {}
    for name, qfn in (
            ("fp", lambda p: p),
            ("w4a16-g128", lambda p: quantize_params(
                p, bits=4, group_size=128, blocklist=block)),
            ("w3a16-g128", lambda p: quantize_params(
                p, bits=3, group_size=128, blocklist=block)),
    ):
        m = _Shim(llama, args, qfn(params), tok)
        ppl = perplexity(m, held_text, seq_len=SEQ, max_windows=max_windows)
        results[name] = ppl
        print(json.dumps({
            "metric": f"fixture ppl {name} (Markov-256 held-out, "
                      f"{max_windows} windows x {SEQ})",
            "value": round(ppl, 4), "unit": "ppl",
            "vs_baseline": 0.0}), flush=True)

    d4 = results["w4a16-g128"] - results["fp"]
    d3 = results["w3a16-g128"] - results["fp"]
    print(json.dumps({
        "metric": "fixture ppl delta W4A16-g128 / W3A16-g128 vs fp "
                  "(OmniQuant-protocol pipeline, fixture scale)",
        "value": round(d4, 4), "unit": "ppl-delta",
        "w3_delta": round(d3, 4),
        "fp_ppl": round(results["fp"], 4),
        "uniform_ppl": VOCAB - 1,
        "vs_baseline": 0.0}), flush=True)


if __name__ == "__main__":
    main()
