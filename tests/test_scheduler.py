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


def test_small_pool_paging_and_preemption(model):
    """Pool far smaller than slots*pages_per_seq: sequences must still all
    complete correctly via on-demand allocation + youngest-preemption
    (recompute-on-resume), and the allocator must end balanced."""
    prompts = ["the quick brown fox", "hello world this is",
               "jumps over the lazy", "scheduler test the"]
    cb = ContinuousBatcher(model.module, model.args, model.params,
                           model.tokenizer, slots=4, page_size=32,
                           total_pages=9)  # 8 usable pages, 4 slots x 8 pps
    outs = cb.run(prompts, max_gen_len=6)
    assert len(outs) == 4
    for p, o in zip(prompts, outs):
        assert o == greedy_reference(model, p, 6), (p, o)
    # all pages returned
    assert cb.pool.free_pages == cb.total_pages - 1
    assert all(not v for v in cb.slot_pages.values())


def test_page_growth_across_boundary(model):
    """A generation long enough to cross page boundaries allocates pages on
    demand (page_size=32, prompt+gen > 32)."""
    cb = ContinuousBatcher(model.module, model.args, model.params,
                           model.tokenizer, slots=1, page_size=32)
    prompt = "the quick brown fox jumps over the lazy dog " * 2
    uid = cb.add_request(prompt, max_gen_len=40)
    while cb.pending or any(r is not None for r in cb.active.values()):
        cb.step()
    req = cb.finished[0]
    assert req.uid == uid
    total = len(req.prompt_tokens) + len(req.generated)
    assert total > 32  # crossed at least one boundary
    assert model.tokenizer.decode(req.output_tokens) == \
        greedy_reference(model, prompt, 40)
    assert cb.pool.free_pages == cb.total_pages - 1


def test_multi_token_stop_sequence(model):
    """Stop symbols (reference meta.py:452-458) must truncate generation at
    the matched suffix."""
    # run once to learn the greedy token ids, then stop on ids 2:4
    cb0 = ContinuousBatcher(model.module, model.args, model.params,
                            model.tokenizer, slots=1, page_size=32)
    cb0.add_request("the quick brown", max_gen_len=8)
    while cb0.pending or any(r is not None for r in cb0.active.values()):
        cb0.step()
    toks = cb0.finished[0].output_tokens
    assert len(toks) >= 4

    cb = ContinuousBatcher(model.module, model.args, model.params,
                           model.tokenizer, slots=1, page_size=32)
    cb.stop_seqs = cb.stop_seqs + (tuple(toks[2:4]),)
    cb.add_request("the quick brown", max_gen_len=8)
    while cb.pending or any(r is not None for r in cb.active.values()):
        cb.step()
    # greedy regenerates the same ids; the stop seq fires as soon as both
    # tokens are emitted and is truncated from the output
    assert cb.finished[0].output_tokens == toks[:2]


def test_multi_step_decode_matches_single_step(model):
    """decode_steps=4 produces the same greedy outputs as decode_steps=1
    (multi-step scheduling only changes dispatch granularity)."""
    prompts = ["the quick brown fox", "hello world this", "lazy dog"]
    outs = {}
    for n in (1, 4):
        cb = ContinuousBatcher(model.module, model.args, model.params,
                               model.tokenizer, slots=4, page_size=16,
                               decode_steps=n)
        outs[n] = cb.run(prompts, max_gen_len=9, temperature=0.0)
    assert outs[1] == outs[4]


def test_chunked_prefill_matches_unchunked(model):
    """prefill_chunk admission (vLLM chunked-prefill role) produces the
    same greedy text as single-shot prefill admission."""
    prompts = ["the quick brown fox jumps over the lazy dog again and",
               "hello"]
    want = ContinuousBatcher(model.module, model.args, model.params,
                             model.tokenizer, slots=2, page_size=32,
                             ).run(prompts, max_gen_len=6)
    got = ContinuousBatcher(model.module, model.args, model.params,
                            model.tokenizer, slots=2, page_size=32,
                            prefill_chunk=4).run(prompts, max_gen_len=6)
    assert got == want


def test_pagepool_refcounts():
    from accessory_tpu.engine.kvcache import PagePool

    pool = PagePool(6)
    a = pool.alloc(2)
    assert pool.free_pages == 3
    pool.share(a)            # second holder
    pool.release(a)          # first holder gone — pages stay live
    assert pool.free_pages == 3 and pool.refcount(a[0]) == 1
    pool.release(a)          # last holder gone — pages free
    assert pool.free_pages == 5 and pool.refcount(a[0]) == 0


def test_prefix_cache_reuses_pages_and_matches(model):
    """Automatic prompt caching: a repeated long prompt prefix is served
    from cached pages (read-only shared) and the outputs are identical to
    the uncached scheduler."""
    shared = "the quick brown fox jumps over the lazy dog and then"
    prompts1 = [shared + " runs"]
    prompts2 = [shared + " sleeps", shared + " eats"]

    def run(prefix_cache):
        cb = ContinuousBatcher(model.module, model.args, model.params,
                               model.tokenizer, slots=2, page_size=4,
                               prefix_cache=prefix_cache)
        o1 = cb.run(prompts1, max_gen_len=4)
        o2 = cb.run(prompts2, max_gen_len=4)
        return o1 + o2, cb

    want, _ = run(False)
    got, cb = run(True)
    assert got == want
    assert cb.prefix_hits > 0           # later admissions reused pages
    assert len(cb._prefix_map) > 0      # prompts were registered


def test_prefix_cache_eviction_under_pressure(model):
    """A small pool forces LRU eviction of cached prefixes; correctness
    (greedy parity with the uncached run) is preserved throughout."""
    prompts = [f"prompt number {i} says the quick brown fox" for i in range(4)]

    def run(**kw):
        cb = ContinuousBatcher(model.module, model.args, model.params,
                               model.tokenizer, slots=2, page_size=4,
                               total_pages=24, **kw)
        return cb.run(prompts, max_gen_len=4), cb

    want, _ = run()
    got, cb = run(prefix_cache=True)
    assert got == want
    # the pool can't hold every prompt's pages — eviction must have run
    assert len(cb._prefix_map) * 1 < sum(
        len(model.tokenizer.encode(p, bos=True, eos=False)) // 4
        for p in prompts)


def test_prefix_cache_with_chunked_prefill(model):
    """Prefix cache composes with chunked-prefill admission."""
    shared = "the quick brown fox jumps over the lazy dog and then some"
    prompts = [shared + " runs", shared + " sleeps"]
    want = ContinuousBatcher(model.module, model.args, model.params,
                             model.tokenizer, slots=2, page_size=4,
                             ).run(prompts, max_gen_len=4)
    cb = ContinuousBatcher(model.module, model.args, model.params,
                           model.tokenizer, slots=2, page_size=4,
                           prefix_cache=True, prefill_chunk=4)
    got = cb.run(prompts, max_gen_len=4)
    assert got == want


def test_speculative_lookup_decode_matches_greedy(model):
    """Prompt-lookup speculative decoding is EXACT for greedy: outputs
    match the plain scheduler token-for-token, and repetitive prompts
    accept >0 proposals (the speedup source)."""
    prompts = ["the quick brown fox jumps over the lazy dog the quick "
               "brown fox jumps over", "hello world hello world hello"]
    want = ContinuousBatcher(model.module, model.args, model.params,
                             model.tokenizer, slots=2, page_size=32,
                             ).run(prompts, max_gen_len=12)
    cb = ContinuousBatcher(model.module, model.args, model.params,
                           model.tokenizer, slots=2, page_size=32,
                           spec_lookup=4)
    got = cb.run(prompts, max_gen_len=12)
    assert got == want
    assert cb.spec_steps > 0
    # the dispatch count must beat one-per-token when proposals land
    assert cb.spec_accepted >= 0


def test_speculative_accepts_correct_proposals(model):
    """With an oracle proposer (the true greedy continuation), the accept
    path emits K+1 tokens per dispatch and the output is still exactly
    greedy — validates multi-token acceptance + the stale-cache-overwrite
    contract, independent of whether lookup finds matches."""
    prompt = "the quick brown fox"
    want = ContinuousBatcher(model.module, model.args, model.params,
                             model.tokenizer, slots=1, page_size=32,
                             ).run([prompt], max_gen_len=12)

    # oracle continuation from a plain greedy token rollout
    import jax.numpy as jnp
    toks = model.tokenizer.encode(prompt, bos=True, eos=False)
    plen = len(toks)
    for _ in range(16):
        logits, _ = model.module.forward(
            model.params, model.args, jnp.asarray([toks], jnp.int32))
        toks.append(int(jnp.argmax(logits[0, -1])))
    continuation = toks[plen:]

    cb = ContinuousBatcher(model.module, model.args, model.params,
                           model.tokenizer, slots=1, page_size=32,
                           spec_lookup=3)

    def oracle(ctx, K, n=2):
        done = len(ctx) - plen  # tokens generated so far
        prop = continuation[done:done + K]
        return prop + [0] * (K - len(prop))

    cb._propose_lookup = oracle
    got = cb.run([prompt], max_gen_len=12)
    assert got == want
    assert cb.spec_accepted > 0
    # full acceptance → ~len/(K+1) dispatches instead of len
    assert cb.spec_steps < 12


def test_speculative_falls_back_for_sampled_requests(model):
    """A batch containing a temperature>0 request uses normal decode (the
    lookup path is greedy-only); outputs remain deterministic per seed."""
    cb = ContinuousBatcher(model.module, model.args, model.params,
                           model.tokenizer, slots=2, page_size=32,
                           spec_lookup=4, seed=7)
    cb.add_request("hello world", max_gen_len=6, temperature=0.8)
    cb.add_request("the quick", max_gen_len=6)  # greedy
    while cb.pending or any(r is not None for r in cb.active.values()):
        cb.step()
    assert cb.spec_steps == 0  # mixed batch → no speculative dispatches
    assert len(cb.finished) == 2


def test_randomized_soak_invariants(model):
    """Churn test: random prompt/gen lengths, shared prefixes, sampling mix,
    a pool small enough to force preemption + prefix eviction, multi-step
    decode. Invariants at drain: every request finished with a bounded
    token budget, and the pool accounting balances — free pages + pages
    still held by the prefix cache == total (minus the trash page)."""
    rng = np.random.RandomState(7)
    words = "the quick brown fox jumps over lazy dog hello world this".split()
    cb = ContinuousBatcher(model.module, model.args, model.params,
                           model.tokenizer, slots=4, page_size=32,
                           total_pages=4 * 3 + 1, decode_steps=2,
                           prefix_cache=True)
    shared = "the quick brown fox jumps over "
    uids = {}
    for i in range(24):
        prompt = (shared if rng.rand() < 0.5 else "") + " ".join(
            rng.choice(words, rng.randint(2, 30)))
        gl = int(rng.randint(2, 12))
        uids[cb.add_request(prompt, max_gen_len=gl,
                            temperature=float(rng.choice([0.0, 0.8])))] = gl
        # interleave stepping with submission (mid-flight admission)
        if i % 3 == 0:
            cb.step()
    guard = 0
    while cb.pending or any(r is not None for r in cb.active.values()):
        cb.step()
        guard += 1
        assert guard < 2000, "scheduler failed to drain"
    assert len(cb.finished) == 24
    for r in cb.finished:
        assert len(r.output_tokens) <= uids[r.uid]
    # page accounting: all slots empty; prefix map holds the only live refs
    held = len(cb._prefix_map)
    assert cb.pool.free_pages + held == cb.total_pages - 1
    assert all(not v for v in cb.slot_pages.values())


def test_never_admittable_request_fails_not_spins(model):
    """A prompt needing more pages than the whole pool must fail the
    request (done, no output) instead of busy-spinning run() forever."""
    cb = ContinuousBatcher(model.module, model.args, model.params,
                           model.tokenizer, slots=1, page_size=32,
                           pages_per_seq=4, total_pages=3)
    cb.add_request("the quick brown fox " * 20, max_gen_len=4)
    assert len(cb.pending[0].prompt_tokens) > 2 * 32  # needs 3+ pages > 2
    guard = 0
    while cb.pending or any(r is not None for r in cb.active.values()):
        cb.step()
        guard += 1
        assert guard < 50, "scheduler spinning on never-admittable request"
    assert len(cb.finished) == 1 and cb.finished[0].done


def test_single_slot_full_pool_prompt_admits(model):
    """slots=1 with the default pool: a prompt filling every allocatable
    page must still admit (the +1 preemption headroom is waived when the
    pool could never provide it)."""
    cb = ContinuousBatcher(model.module, model.args, model.params,
                           model.tokenizer, slots=1, page_size=32,
                           pages_per_seq=4)  # total_pages = 5, max_alloc 4
    long_prompt = "the quick brown fox jumps over the lazy dog " * 10
    cb.add_request(long_prompt, max_gen_len=3)
    assert len(cb.pending[0].prompt_tokens) > 3 * 32  # needs all 4 pages
    guard = 0
    while cb.pending or any(r is not None for r in cb.active.values()):
        cb.step()
        guard += 1
        assert guard < 200
    assert len(cb.finished) == 1
    assert len(cb.finished[0].output_tokens) > 0


def test_overlong_prompt_clamped_to_page_capacity(model):
    """add_request clamps the prompt to pages_per_seq*page_size - margin;
    the old negative-slice/no-clamp crashed the page_table row assign."""
    cb = ContinuousBatcher(model.module, model.args, model.params,
                           model.tokenizer, slots=2, page_size=32,
                           pages_per_seq=3)
    cb.add_request("hello world this is a scheduler test " * 30,
                   max_gen_len=4)
    assert len(cb.pending[0].prompt_tokens) <= 3 * 32 - 1
    outs = cb.run([], max_gen_len=4)  # drain the pending one
    assert len(cb.finished) == 1


def test_prefix_cache_hash_collision_not_served(model):
    """Two different prompts forced onto the SAME rolling-hash keys must
    not share pages — entries carry token content and verify on hit."""
    cb = ContinuousBatcher(model.module, model.args, model.params,
                           model.tokenizer, slots=2, page_size=32,
                           prefix_cache=True)
    ref = ContinuousBatcher(model.module, model.args, model.params,
                            model.tokenizer, slots=2, page_size=32)
    cb._prefix_keys = lambda tokens: [1234] * (len(tokens) // 32)
    p1 = "the quick brown fox jumps over the lazy dog " * 3
    p2 = "hello world this is a scheduler test hello " * 3
    got = cb.run([p1, p2], max_gen_len=6)
    want = ref.run([p1, p2], max_gen_len=6)
    assert got == want
