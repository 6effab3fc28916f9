"""Continuous batching scheduler over the paged KV cache.

The reference has no scheduler — its generate() runs one static batch to
completion (meta.py:371-467) and serving wraps single requests
(multi_gpu_wrapper.py:143-321). This is the BASELINE.json "continuous
batching" engine: fixed decode slots share one HBM page pool; new requests
are admitted into free slots between decode steps, finished sequences
release their pages immediately, and every decode step advances ALL active
slots in one jitted call.

Design (vLLM-style block manager, TPU-shaped):
  * PagePool (engine/kvcache.py): host-side free-page allocator. Pages are
    allocated on admission (ceil(prompt/ps)) and grown one page at a time as
    decode crosses page boundaries; released on finish. When the pool is
    exhausted the YOUNGEST active sequence is preempted — its pages are
    released and it re-queues with prompt+generated as the new prompt
    (recompute-on-resume).
  * Batched prefill: all admissions in a step share one jitted prefill at a
    common bucketed length — no per-request compile/dispatch.
  * On-device sampling: the decode jit ends with per-slot temperature/top-p
    sampling (ops/sampling.sample_token_batched); the host fetches only a
    (slots,) token vector per step (a (slots, vocab) logits fetch costs
    ~30 ms through the relay).
  * Context bucketing: decode attention gathers only the first
    ``active_pages`` logical pages (next power of two of the longest active
    context), so HBM traffic scales with actual context, not max_seq_len.
  * Multi-token stop sequences, matched on host (reference meta.py:452-458).

SPMD note: on a multi-host mesh every host must run identical programs; the
scheduler state is deterministic given the request stream, matching the
reference's "same input on all ranks" discipline (SPHINX/inference.py:26-28).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.engine.kvcache import PagePool

_BUCKET = 64


def _round_up(x: int, m: int = _BUCKET) -> int:
    return max(m, (x + m - 1) // m * m)


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


@dataclasses.dataclass
class Request:
    uid: int
    prompt_tokens: List[int]
    max_gen_len: int
    temperature: float = 0.0
    top_p: float = 0.95
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    # preemption bookkeeping: generated tokens folded into prompt_tokens on
    # preempt; orig_prompt_len recovers the true completion
    orig_prompt_len: int = -1
    prefix_gen: int = 0
    admit_seq: int = 0  # admission order, for youngest-first preemption

    def __post_init__(self):
        if self.orig_prompt_len < 0:
            self.orig_prompt_len = len(self.prompt_tokens)

    @property
    def output_tokens(self) -> List[int]:
        return self.prompt_tokens[self.orig_prompt_len:] + self.generated

    @property
    def n_generated(self) -> int:
        return self.prefix_gen + len(self.generated)


class ContinuousBatcher:
    def __init__(self, module, args, params, tokenizer, slots: int = 8,
                 page_size: int = 64, pages_per_seq: Optional[int] = None,
                 total_pages: Optional[int] = None, seed: int = 0,
                 stop_symbols: Iterable[str] = (), decode_steps: int = 1,
                 kv_dtype: Optional[str] = None,
                 prefill_chunk: Optional[int] = None,
                 prefix_cache: bool = False,
                 spec_lookup: int = 0):
        # decode_steps > 1 = multi-step scheduling (vLLM num_scheduler_steps
        # role): each dispatch decodes n tokens per slot with on-device
        # sampling before the host fetch. Amortizes host<->device latency
        # (~30 ms/fetch through the axon relay vs ~2 ms device step); costs
        # up to n-1 wasted tokens per request past a stop sequence.
        self.decode_steps = max(1, int(decode_steps))
        # prefill_chunk: admit long prompts as fixed-size continuation
        # chunks (vLLM chunked-prefill role) — bounds the prefill
        # dispatch latency spike a long prompt injects between decode
        # steps, and caps prefill compile shapes at one per chunk count.
        self.prefill_chunk = (int(prefill_chunk) if prefill_chunk
                              and getattr(module,
                                          "SUPPORTS_CHUNKED_PREFILL", False)
                              else None)
        # prefix_cache: automatic prompt caching (vLLM APC role). Full
        # prompt pages are registered in an LRU map keyed by a rolling
        # hash of their token content; admission reuses matching pages
        # read-only (PagePool refcounts) and prefills only the suffix via
        # continuation dispatches. Entries are evicted under pool
        # pressure. Requires forward_paged(continuation=True).
        self.prefix_cache = bool(
            prefix_cache
            and getattr(module, "SUPPORTS_CHUNKED_PREFILL", False))
        from collections import OrderedDict

        self._prefix_map: "OrderedDict[int, int]" = OrderedDict()
        self._page_key: Dict[int, int] = {}
        self.prefix_hits = 0  # pages served from cache (serving metric)
        # spec_lookup=K: prompt-lookup speculative decoding — propose K
        # tokens per step by matching the context's final n-gram against
        # earlier context (n-gram copying; exact for GREEDY requests: one
        # verify dispatch scores all K+1 positions and the accepted run
        # is precisely what sequential greedy decode would emit). Batches
        # with any sampled request fall back to normal decode.
        self.spec_lookup = (int(spec_lookup) if spec_lookup
                            and getattr(module, "SUPPORTS_CHUNKED_PREFILL",
                                        False)
                            else 0)
        self.spec_accepted = 0  # proposal tokens accepted (serving metric)
        self.spec_steps = 0
        # decode-optimized weight layout (see engine.generate.Generator):
        # scan-sliced weights can't fuse into Pallas calls
        import os as _os

        if (jax.default_backend() == "tpu"
                and _os.environ.get("ACCESSORY_TPU_UNROLL", "1") == "1"
                and getattr(module, "SUPPORTS_UNROLLED_PAGED", False)):
            if (getattr(module, "SUPPORTS_FUSED_QKV", False)
                    and _os.environ.get("ACCESSORY_TPU_FUSE", "1") == "1"):
                # fused wqkv/w13: 5 -> 2 kernel launches per layer
                from accessory_tpu.quant.fuse import fuse_for_decode

                params = fuse_for_decode(params)
            from accessory_tpu.models.llama import unstack_layers

            params = unstack_layers(params)
        self.module = module
        self.args = args
        self.params = params
        self.tokenizer = tokenizer
        self.slots = slots
        self.page_size = page_size
        self.pages_per_seq = pages_per_seq or (args.max_seq_len // page_size)
        # +1 for the reserved trash page; default pool still covers the worst
        # case — servers shrink total_pages to oversubscribe contexts
        self.total_pages = total_pages or (slots * self.pages_per_seq + 1)
        self.pool = PagePool(self.total_pages)
        # kv_dtype="int8": quantized page pools — the same HBM holds ~2x
        # the pages, so total_pages can double for the same budget
        kw = {"kv_dtype": kv_dtype} if kv_dtype is not None else {}
        self.pcache = module.init_paged_cache(
            args, slots=slots, total_pages=self.total_pages,
            page_size=page_size, pages_per_seq=self.pages_per_seq, **kw)

        # host mirrors of the device page table / lengths
        self.page_table = np.full((slots, self.pages_per_seq), PagePool.TRASH,
                                  np.int32)
        self.h_len = np.zeros((slots,), np.int32)
        self.slot_pages: Dict[int, List[int]] = {s: [] for s in range(slots)}
        self.pcache = dataclasses.replace(
            self.pcache, page_indices=jnp.asarray(self.page_table))

        self.active: Dict[int, Optional[Request]] = {
            i: None for i in range(slots)}
        self.pending: List[Request] = []
        self.finished: List[Request] = []
        self._uid = 0
        self._admit_seq = 0
        self._key = jax.random.PRNGKey(seed)
        self._prefill_cache = {}
        self._decode_cache = {}
        self.stop_seqs: Tuple[Tuple[int, ...], ...] = self._stop_token_seqs(
            stop_symbols)

    # ------------------------------------------------------------------

    def _stop_token_seqs(self, stop_symbols: Iterable[str]):
        from accessory_tpu.engine.generate import stop_token_seqs

        return stop_token_seqs(self.tokenizer, stop_symbols)

    def add_request(self, prompt: str, max_gen_len: int = 128,
                    temperature: float = 0.0, top_p: float = 0.95) -> int:
        toks = self.tokenizer.encode(prompt, bos=True, eos=False)
        # clamp to BOTH budgets: the model context minus the generation
        # budget, and the slot's page capacity minus the per-dispatch write
        # margin (an over-long prompt would otherwise overflow the
        # page-table row); max() guards max_gen_len >= max_seq_len, where
        # the old negative slice kept the whole prompt
        margin = max(self.decode_steps, self.spec_lookup + 1)
        keep = max(1, min(self.args.max_seq_len - max_gen_len,
                          self.pages_per_seq * self.page_size - margin))
        toks = toks[-keep:]
        self._uid += 1
        self.pending.append(Request(self._uid, toks, max_gen_len,
                                    temperature, top_p))
        return self._uid

    # ------------------------------------------------------------------
    # compiled steps

    def _prefill_fn(self, g: int, bucket: int):
        key = (g, bucket)
        if key not in self._prefill_cache:
            from accessory_tpu.ops.sampling import sample_token_batched

            def prefill(p, toks, sub, plens, k, temps, topps):
                logits, sub = self.module.forward_paged(p, self.args, toks,
                                                        sub)
                last = jnp.take_along_axis(
                    logits, (plens - 1)[:, None, None], axis=1)[:, 0]
                nxt = sample_token_batched(last, k, temps, topps)
                return nxt, sub

            self._prefill_cache[key] = jax.jit(prefill, donate_argnums=(2,))
        return self._prefill_cache[key]

    def _verify_fn(self, active: int, K: int):
        """Speculative-verify dispatch: forward K+1 tokens per slot at its
        own offset (continuation path) and return the greedy target at
        every position. The host accepts the longest run of proposals that
        match their targets — identical tokens to sequential greedy."""
        key = ("verify", active, K)
        if key not in self._decode_cache:
            def verify(p, toks, c):
                logits, c = self.module.forward_paged(
                    p, self.args, toks, c, active_pages=active,
                    continuation=True)
                return jnp.argmax(logits, axis=-1).astype(jnp.int32), c

            self._decode_cache[key] = jax.jit(verify, donate_argnums=(2,))
        return self._decode_cache[key]

    @staticmethod
    def _propose_lookup(ctx: List[int], K: int, n: int = 2) -> List[int]:
        """Prompt-lookup proposal: copy the K tokens that followed the
        most recent earlier occurrence of the context's final n-gram
        (zero-pad when no match / short tail — mismatches just cap the
        accepted run at the verified next token)."""
        if len(ctx) <= n:
            return [0] * K
        pat = ctx[-n:]
        for p in range(len(ctx) - n - 1, -1, -1):
            if ctx[p:p + n] == pat:
                prop = ctx[p + n:p + n + K]
                return prop + [0] * (K - len(prop))
        return [0] * K

    def _chunk_prefill_fn(self, g: int, cs: int, active: int):
        """Continuation-prefill for chunked admission: one chunk of ``cs``
        tokens per slot at the slot's current length. ``active`` bounds the
        page gather to the pages already written by earlier chunks. Samples
        at ``last_off`` within the chunk (the host keeps only the sample
        from the chunk holding each prompt's final token)."""
        key = ("chunk", g, cs, active)
        if key not in self._prefill_cache:
            from accessory_tpu.ops.sampling import sample_token_batched

            def prefill(p, toks, sub, last_off, k, temps, topps):
                logits, sub = self.module.forward_paged(
                    p, self.args, toks, sub, active_pages=active,
                    continuation=True)
                last = jnp.take_along_axis(
                    logits, last_off[:, None, None], axis=1)[:, 0]
                nxt = sample_token_batched(last, k, temps, topps)
                return nxt, sub

            self._prefill_cache[key] = jax.jit(prefill, donate_argnums=(2,))
        return self._prefill_cache[key]

    def _decode_fn(self, active_pages: int, n_steps: int = 1):
        key = (active_pages, n_steps)
        if key not in self._decode_cache:
            from accessory_tpu.ops.sampling import sample_token_batched

            def steps(p, toks, c, k, temps, topps):
                """n_steps decode tokens per slot in ONE dispatch; returns
                (slots, n_steps) tokens. forward_paged advances c.lengths
                on device each inner step."""
                out0 = jnp.zeros((toks.shape[0], n_steps), jnp.int32)

                def body(i, carry):
                    toks, c, out, k = carry
                    logits, c = self.module.forward_paged(
                        p, self.args, toks, c, active_pages=active_pages)
                    k, sub = jax.random.split(k)
                    nxt = sample_token_batched(logits[:, -1], sub, temps,
                                               topps)
                    out = jax.lax.dynamic_update_slice(
                        out, nxt[:, None], (0, i))
                    return (nxt[:, None], c, out, k)

                _, c, out, _ = jax.lax.fori_loop(
                    0, n_steps, body, (toks, c, out0, k))
                return out, c

            self._decode_cache[key] = jax.jit(steps, donate_argnums=(2,))
        return self._decode_cache[key]

    # ------------------------------------------------------------------
    # paging

    # ------------------------------------------------------------------
    # prefix caching (automatic prompt caching, vLLM APC role)
    # ------------------------------------------------------------------

    def _prefix_keys(self, tokens: List[int]) -> List[int]:
        """Rolling content hash per FULL prompt page (key_j covers
        tokens[:(j+1)*ps], like vLLM's block hashes)."""
        ps = self.page_size
        keys, h = [], 0
        for j in range(len(tokens) // ps):
            h = hash((h, tuple(tokens[j * ps:(j + 1) * ps])))
            keys.append(h)
        return keys

    def _match_prefix(self, tokens: List[int], keys: List[int]) -> List[int]:
        """Longest run of cached pages covering the prompt head. Capped at
        (plen-1)//ps so at least one suffix token remains to prefill (the
        next-token sample needs the last prompt position's logits). Each
        hit compares the stored token content, not just the rolling hash —
        a hash collision would otherwise serve another prompt's KV pages
        (silent corruption in a long-lived server)."""
        ps = self.page_size
        reused = []
        for j in range(min(len(keys), (len(tokens) - 1) // ps)):
            entry = self._prefix_map.get(keys[j])
            if entry is None or entry[1] != tuple(tokens[j * ps:(j + 1) * ps]):
                break
            reused.append(entry[0])
            self._prefix_map.move_to_end(keys[j])
        return reused

    def _register_prefix(self, slot: int, tokens: List[int], k0: int,
                         keys: List[int]) -> None:
        """Publish this slot's freshly written full prompt pages (beyond
        the k0 reused ones). The map holds its own page reference, so
        cached pages outlive the slot; entries carry the page's token
        content for collision-proof hits."""
        ps = self.page_size
        for j in range(k0, len(tokens) // ps):
            if keys[j] in self._prefix_map:
                continue
            page = int(self.page_table[slot, j])
            self.pool.share([page])
            self._prefix_map[keys[j]] = (page, tuple(tokens[j * ps:(j + 1) * ps]))
            self._page_key[page] = keys[j]

    def _evict_prefix(self, n: int) -> int:
        """Drop LRU prefix-cache entries until ~n pages came free (entries
        still referenced by active slots just lose cache residency)."""
        freed = 0
        for key in list(self._prefix_map):
            if freed >= n:
                break
            page, _ = self._prefix_map.pop(key)
            del self._page_key[page]
            before = self.pool.free_pages
            self.pool.release([page])
            freed += self.pool.free_pages - before
        return freed

    def _release_slot(self, slot: int) -> None:
        self.pool.release(self.slot_pages[slot])
        self.slot_pages[slot] = []
        self.page_table[slot, :] = PagePool.TRASH
        self.h_len[slot] = 0
        self.active[slot] = None

    def _preempt_youngest(self) -> bool:
        """Requeue the most recently admitted active request, releasing its
        pages. Returns False if nothing is preemptible."""
        act = [(r.admit_seq, s) for s, r in self.active.items()
               if r is not None]
        if not act:
            return False
        _, slot = max(act)
        req = self.active[slot]
        req.prompt_tokens = req.prompt_tokens + req.generated
        req.prefix_gen += len(req.generated)
        req.generated = []
        self._release_slot(slot)
        self.pending.insert(0, req)
        return True

    def _grow_pages(self, slot: int, ahead: int = 1) -> bool:
        """Ensure the slot has pages for the next ``ahead`` write positions."""
        need = (int(self.h_len[slot]) + ahead - 1) // self.page_size
        while need >= len(self.slot_pages[slot]):
            pg = self.pool.alloc(1)
            if pg is None and self._prefix_map:
                self._evict_prefix(1)
                pg = self.pool.alloc(1)
            if pg is None:
                return False
            self.page_table[slot, len(self.slot_pages[slot])] = pg[0]
            self.slot_pages[slot].append(pg[0])
        return True

    # ------------------------------------------------------------------

    def _admit(self) -> List[Tuple[int, int]]:
        """Batch-admit from the queue into free slots: allocate pages, run
        ONE bucketed prefill for the whole group, sample first tokens on
        device. Returns [(slot, first_token)]."""
        group: List[Tuple[int, Request]] = []
        reuse_k: Dict[int, int] = {}
        keys_by_slot: Dict[int, List[int]] = {}
        max_alloc = self.total_pages - 1  # page 0 is the reserved trash
        pool_full = False
        for slot in range(self.slots):
            if pool_full or self.active[slot] is not None or not self.pending:
                continue
            req = self.pending[0]
            plen = len(req.prompt_tokens)
            n_pages = -(-plen // self.page_size)
            if n_pages > max_alloc:
                # can NEVER be admitted (pool smaller than one prompt) —
                # fail the request instead of spinning the serve loop
                self.pending.pop(0)
                req.done = True
                self.finished.append(req)
                continue
            reused: List[int] = []
            keys: List[int] = []
            if self.prefix_cache:
                keys = self._prefix_keys(req.prompt_tokens)
                reused = self._match_prefix(req.prompt_tokens, keys)
                # hold our reference BEFORE any eviction can free them
                self.pool.share(reused)
                self.prefix_hits += len(reused)
            need = n_pages - len(reused)
            # +1 headroom so the first decode steps can't immediately
            # preempt what we just admitted — unless the pool could never
            # provide it (then headroom would make admission impossible)
            headroom = 1 if need < max_alloc else 0
            if (self.pool.free_pages < need + headroom and self._prefix_map):
                self._evict_prefix(need + headroom - self.pool.free_pages)
            pages = (self.pool.alloc(need)
                     if self.pool.free_pages >= need + headroom else None)
            if pages is None:
                self.pool.release(reused)
                pool_full = True  # FIFO — don't admit younger past this one
                continue
            self.pending.pop(0)
            row = reused + pages
            self.slot_pages[slot] = row
            self.page_table[slot, :] = PagePool.TRASH
            self.page_table[slot, :n_pages] = row
            self._admit_seq += 1
            req.admit_seq = self._admit_seq
            reuse_k[slot] = len(reused)
            keys_by_slot[slot] = keys
            group.append((slot, req))
        if not group:
            return []

        g = len(group)
        plens = np.array([len(r.prompt_tokens) for _, r in group], np.int32)
        # prefix-cache reuse: each slot prefills only its SUFFIX (tokens
        # past the reused pages), starting at its own offset
        starts = np.array([reuse_k.get(s, 0) * self.page_size
                           for s, _ in group], np.int32)
        slens = plens - starts
        bucket = min(_round_up(int(slens.max())),
                     self.pages_per_seq * self.page_size)
        # pad the group to the next power of two so prefill compiles are
        # O(log slots) shapes, not one per group size (each remote compile
        # is tens of seconds — it would dominate p50 TTFT). Dummy rows
        # point every page at the reserved TRASH page and are discarded.
        gp = 1 << (g - 1).bit_length()
        toks = np.zeros((gp, bucket), np.int32)
        for i, (_, r) in enumerate(group):
            toks[i, :slens[i]] = r.prompt_tokens[starts[i]:]
        gslots = np.array([s for s, _ in group])
        slens_p = np.concatenate([slens, np.ones((gp - g,), np.int32)])
        starts_p = np.concatenate([starts, np.zeros((gp - g,), np.int32)])
        rows = np.concatenate(
            [self.page_table[gslots],
             np.full((gp - g, self.pages_per_seq), PagePool.TRASH,
                     self.page_table.dtype)])

        sub = dataclasses.replace(
            self.pcache,
            page_indices=jnp.asarray(rows),
            lengths=jnp.asarray(starts_p))
        temps = jnp.asarray([r.temperature for _, r in group]
                            + [1.0] * (gp - g), jnp.float32)
        topps = jnp.asarray([r.top_p for _, r in group]
                            + [1.0] * (gp - g), jnp.float32)
        cs = self.prefill_chunk
        use_continuation = starts.any() or (cs and bucket > cs)
        if use_continuation:
            # chunked prefill: fixed-cs continuation dispatches. Every slot
            # advances lengths by cs per chunk (overshoot past a short
            # prompt lands in the reserved TRASH page, exactly like the
            # single-shot bucket overshoot); the host keeps the sample
            # from the chunk holding each prompt's last token and resets
            # lengths to the true plens below.
            ce = min(cs, bucket) if cs else bucket
            n_ch = -(-bucket // ce)
            toks_pad = np.zeros((gp, n_ch * ce), np.int32)
            toks_pad[:, :bucket] = toks
            nxt = np.zeros((gp,), np.int64)
            max_start = int(starts_p.max())
            for c in range(n_ch):
                # pow2-bucketed like _decode_fn/_verify_fn: the exact count
                # would mint a fresh compile per distinct prefix length
                active = min(_next_pow2(max(
                    1, -(-(max_start + c * ce) // self.page_size))),
                    self.pages_per_seq)
                last_off = np.clip(slens_p - 1 - c * ce, 0, ce - 1)
                self._key, k = jax.random.split(self._key)
                nc, sub = self._chunk_prefill_fn(gp, ce, active)(
                    self.params,
                    jnp.asarray(toks_pad[:, c * ce:(c + 1) * ce]), sub,
                    jnp.asarray(last_off, jnp.int32), k, temps, topps)
                hit = (slens_p - 1) // ce == c
                if hit.any():
                    nxt[hit] = np.asarray(nc)[hit]
        else:
            self._key, k = jax.random.split(self._key)
            nxt, sub = self._prefill_fn(gp, bucket)(
                self.params, jnp.asarray(toks), sub, jnp.asarray(slens_p), k,
                temps, topps)
            nxt = np.asarray(nxt)

        # adopt the updated pools; set admitted lengths (ALL pool buffers:
        # the prefill donated them, so the old references are deleted)
        self.h_len[gslots] = plens
        extra = ({} if sub.ks_pages is None
                 else {"ks_pages": sub.ks_pages, "vs_pages": sub.vs_pages})
        self.pcache = dataclasses.replace(
            self.pcache, k_pages=sub.k_pages, v_pages=sub.v_pages,
            page_indices=jnp.asarray(self.page_table),
            lengths=jnp.asarray(self.h_len), **extra)

        if self.prefix_cache:
            for slot, req in group:
                self._register_prefix(slot, req.prompt_tokens,
                                      reuse_k[slot], keys_by_slot[slot])

        first = []
        for i, (slot, req) in enumerate(group):
            tok = int(nxt[i])
            self.active[slot] = req
            self._append_token(req, tok)
            first.append((slot, tok))
        return first

    def _append_token(self, req: Request, tok: int) -> None:
        """Append + stop detection (multi-token stop suffix matching,
        reference meta.py:452-458) + budget check. Matching runs over the
        full generated-origin history (prompt_tokens past orig_prompt_len
        are generated tokens folded in by preemption), so a stop sequence
        spanning a preemption boundary is still caught."""
        req.generated.append(tok)
        hist = req.prompt_tokens[req.orig_prompt_len:] + req.generated
        for seq in self.stop_seqs:
            L = len(seq)
            if len(hist) >= L and tuple(hist[-L:]) == seq:
                # strip the stop text: first from generated, then from the
                # folded part (both feed output_tokens)
                k_gen = min(L, len(req.generated))
                req.generated = req.generated[:len(req.generated) - k_gen]
                rem = L - k_gen
                if rem:
                    req.prompt_tokens = req.prompt_tokens[:-rem]
                    req.prefix_gen -= rem
                req.done = True
                return
        if req.n_generated >= req.max_gen_len:
            req.done = True
        # context capacity: one dispatch's worth of writes short of max so
        # the next multi-step / speculative dispatch always fits
        margin = max(self.decode_steps, self.spec_lookup + 1)
        if (len(req.prompt_tokens) + len(req.generated)
                >= self.pages_per_seq * self.page_size - margin):
            req.done = True

    def step(self) -> List[Request]:
        """Admit + one decode step for all active slots; returns newly
        finished requests."""
        self._admit()
        # retire anything already done at admission (stop hit on first token)
        done_now: List[Request] = []
        for s in range(self.slots):
            req = self.active[s]
            if req is not None and req.done:
                done_now.append(req)
                self.finished.append(req)
                self._release_slot(s)

        act = [s for s, r in self.active.items() if r is not None]
        if not act:
            return done_now

        K = self.spec_lookup
        if K and all(self.active[s].temperature == 0.0 for s in act):
            return done_now + self._spec_step(act, K)

        n = self.decode_steps
        # grow pages for the next n write positions; preempt youngest on
        # exhaustion (never below one active sequence)
        for s in list(act):
            while self.active[s] is not None and not self._grow_pages(s, n):
                if not self._preempt_youngest():
                    raise RuntimeError("page pool too small for one sequence")
            # s itself may have been preempted
        act = [s for s, r in self.active.items() if r is not None]
        if not act:
            return done_now

        toks = np.zeros((self.slots, 1), np.int32)
        temps = np.zeros((self.slots,), np.float32)
        topps = np.full((self.slots,), 0.95, np.float32)
        for s in act:
            toks[s, 0] = self.active[s].generated[-1]
            temps[s] = self.active[s].temperature
            topps[s] = self.active[s].top_p

        # context bucket: power-of-two pages covering the longest active
        # context INCLUDING the n tokens this dispatch will add (the newest
        # token rides separately through cached_attention)
        max_pages = max(
            1, -(-(int(self.h_len[act].max()) + n - 1) // self.page_size))
        active_pages = min(_next_pow2(max_pages), self.pages_per_seq)

        # push host mirrors BEFORE decode: page tables may have grown /
        # shrunk, and idle-slot lengths must be pinned at 0 (the batched
        # step advances every slot)
        self.pcache = dataclasses.replace(
            self.pcache, page_indices=jnp.asarray(self.page_table),
            lengths=jnp.asarray(self.h_len))

        self._key, k = jax.random.split(self._key)
        nxt, self.pcache = self._decode_fn(active_pages, n)(
            self.params, jnp.asarray(toks), self.pcache, k,
            jnp.asarray(temps), jnp.asarray(topps))
        nxt = np.asarray(nxt)  # (slots, n) — the only per-dispatch fetch

        # the device advanced every active slot by n regardless of stops;
        # mirror that, then discard host-side whatever lies past a stop
        self.h_len[act] += n
        for s in act:
            req = self.active[s]
            for j in range(n):
                self._append_token(req, int(nxt[s, j]))
                if req.done:
                    break
            if req.done:
                done_now.append(req)
                self.finished.append(req)
                self._release_slot(s)
        return done_now

    def _spec_step(self, act: List[int], K: int) -> List[Request]:
        """One speculative decode dispatch for every active (greedy) slot:
        feed [last_token, K lookup proposals], accept the longest verified
        run plus the bonus target — 1..K+1 tokens per dispatch."""
        done_now: List[Request] = []
        for s in list(act):
            while (self.active[s] is not None
                   and not self._grow_pages(s, K + 1)):
                if not self._preempt_youngest():
                    raise RuntimeError("page pool too small for one sequence")
        act = [s for s, r in self.active.items() if r is not None]
        if not act:
            return done_now

        toks = np.zeros((self.slots, K + 1), np.int32)
        for s in act:
            req = self.active[s]
            ctx = req.prompt_tokens + req.generated
            toks[s, 0] = req.generated[-1]
            toks[s, 1:] = self._propose_lookup(ctx, K)

        max_pages = max(1, -(-(int(self.h_len[act].max()) + K)
                             // self.page_size))
        active_pages = min(_next_pow2(max_pages), self.pages_per_seq)
        self.pcache = dataclasses.replace(
            self.pcache, page_indices=jnp.asarray(self.page_table),
            lengths=jnp.asarray(self.h_len))
        tgt, self.pcache = self._verify_fn(active_pages, K)(
            self.params, jnp.asarray(toks), self.pcache)
        tgt = np.asarray(tgt)  # (slots, K+1) greedy targets

        self.spec_steps += 1
        for s in act:
            req = self.active[s]
            j = 0
            while j < K and tgt[s, j] == toks[s, j + 1]:
                j += 1
            self.spec_accepted += j
            # cache holds K+1 written positions; only the verified prefix
            # is logical context — later writes overwrite the rest before
            # it is ever attended (lengths mask)
            self.h_len[s] += j + 1
            for t in tgt[s, :j + 1]:
                self._append_token(req, int(t))
                if req.done:
                    break
            if req.done:
                done_now.append(req)
                self.finished.append(req)
                self._release_slot(s)
        return done_now

    def run(self, prompts: List[str], max_gen_len: int = 64,
            temperature: float = 0.0) -> List[str]:
        """Convenience: feed all prompts, loop until drained, return texts
        in submission order."""
        ids = [self.add_request(p, max_gen_len, temperature) for p in prompts]
        while self.pending or any(r is not None for r in self.active.values()):
            self.step()
        by_uid = {r.uid: r for r in self.finished}
        return [self.tokenizer.decode(by_uid[i].output_tokens) for i in ids]
