"""Continuous batching scheduler over the paged KV cache.

The reference has no scheduler — its generate() runs one static batch to
completion (meta.py:371-467) and serving wraps single requests
(multi_gpu_wrapper.py). This is the BASELINE.json "continuous batching"
engine: fixed decode slots share one HBM page pool; new requests are
admitted into free slots between decode steps, finished sequences release
their slot immediately, and every decode step advances ALL active slots in
one jitted call.

Host/device split:
  * device (jit): slot prefill (bucketed prompt lengths) and the fused
    B-slot decode step over the paged pool (forward_paged)
  * host: request queue, slot allocation, sampling bookkeeping, stop
    detection, detokenization

SPMD note: on a multi-host mesh every host must run identical programs; the
scheduler state is deterministic given the request stream, matching the
reference's "same input on all ranks" discipline (SPHINX/inference.py:26-28).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BUCKET = 64


def _round_up(x: int, m: int = _BUCKET) -> int:
    return max(m, (x + m - 1) // m * m)


@dataclasses.dataclass
class Request:
    uid: int
    prompt_tokens: List[int]
    max_gen_len: int
    temperature: float = 0.0
    top_p: float = 0.95
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


class ContinuousBatcher:
    def __init__(self, module, args, params, tokenizer, slots: int = 8,
                 page_size: int = 64, pages_per_seq: Optional[int] = None,
                 seed: int = 0):
        self.module = module
        self.args = args
        self.params = params
        self.tokenizer = tokenizer
        self.slots = slots
        self.page_size = page_size
        self.pages_per_seq = pages_per_seq or (args.max_seq_len // page_size)
        total_pages = slots * self.pages_per_seq
        self.pcache = module.init_paged_cache(
            args, slots=slots, total_pages=total_pages, page_size=page_size,
            pages_per_seq=self.pages_per_seq)
        self.active: Dict[int, Optional[Request]] = {i: None for i in range(slots)}
        self.pending: List[Request] = []
        self.finished: List[Request] = []
        self._uid = 0
        self._key = jax.random.PRNGKey(seed)
        self._prefill_cache = {}
        self._decode = jax.jit(
            lambda p, t, c: module.forward_paged(p, args, t, c),
            donate_argnums=(2,))

    # ------------------------------------------------------------------

    def add_request(self, prompt: str, max_gen_len: int = 128,
                    temperature: float = 0.0, top_p: float = 0.95) -> int:
        toks = self.tokenizer.encode(prompt, bos=True, eos=False)
        toks = toks[-(self.args.max_seq_len - max_gen_len):]
        self._uid += 1
        self.pending.append(Request(self._uid, toks, max_gen_len,
                                    temperature, top_p))
        return self._uid

    def _prefill_fn(self, plen: int):
        if plen not in self._prefill_cache:
            self._prefill_cache[plen] = jax.jit(
                lambda p, t, c: self.module.forward_paged(p, self.args, t, c),
                donate_argnums=(2,))
        return self._prefill_cache[plen]

    def _admit(self) -> List[Tuple[int, int]]:
        """Fill free slots from the queue; prefill each admitted request.
        Returns [(slot, first sampled token)]."""
        first_tokens = []
        for slot in range(self.slots):
            if self.active[slot] is not None or not self.pending:
                continue
            req = self.pending.pop(0)
            plen = len(req.prompt_tokens)
            bucket = min(_round_up(plen), self.pages_per_seq * self.page_size)
            toks = np.zeros((1, bucket), np.int32)
            toks[0, :plen] = req.prompt_tokens

            sub = dataclasses.replace(
                self.pcache,
                page_indices=self.pcache.page_indices[slot: slot + 1],
                lengths=jnp.zeros((1,), jnp.int32))
            logits, sub = self._prefill_fn(bucket)(
                self.params, jnp.asarray(toks), sub)
            # adopt the updated pool; slot length = true prompt length (the
            # bucket's junk tail is overwritten as decode proceeds)
            self.pcache = dataclasses.replace(
                self.pcache, k_pages=sub.k_pages, v_pages=sub.v_pages,
                lengths=self.pcache.lengths.at[slot].set(plen))
            nxt = self._sample(np.asarray(logits[0, plen - 1])[None], req)[0]
            req.generated.append(int(nxt))
            self.active[slot] = req
            first_tokens.append((slot, int(nxt)))
        return first_tokens

    def _sample(self, logits: np.ndarray, req: Request) -> np.ndarray:
        from accessory_tpu.ops.sampling import sample_token

        self._key, sub = jax.random.split(self._key)
        return np.asarray(sample_token(jnp.asarray(logits), sub,
                                       req.temperature, req.top_p))

    def step(self) -> List[Request]:
        """Admit + one decode step for all active slots; returns newly
        finished requests."""
        self._admit()
        act = [s for s, r in self.active.items() if r is not None]
        if not act:
            return []

        # feed each slot its last token (pad slot 0 token for idle slots)
        toks = np.zeros((self.slots, 1), np.int32)
        for s in act:
            toks[s, 0] = self.active[s].generated[-1]
        logits, self.pcache = self._decode(
            self.params, jnp.asarray(toks), self.pcache)
        logits = np.asarray(logits[:, 0])

        # idle slots were advanced by the batched step too — pin them at 0 so
        # their scratch writes never walk past their page table
        idle = [s for s, r in self.active.items() if r is None]
        if idle:
            lengths = self.pcache.lengths
            for s in idle:
                lengths = lengths.at[s].set(0)
            self.pcache = dataclasses.replace(self.pcache, lengths=lengths)

        done_now: List[Request] = []
        for s in act:
            req = self.active[s]
            nxt = int(self._sample(logits[s][None], req)[0])
            if nxt == self.tokenizer.eos_id:
                req.done = True
            else:
                req.generated.append(nxt)
            total = len(req.prompt_tokens) + len(req.generated)
            if (len(req.generated) >= req.max_gen_len
                    or total >= self.pages_per_seq * self.page_size - 1):
                req.done = True
            if req.done:
                done_now.append(req)
                self.finished.append(req)
                self.active[s] = None
                # release the slot: reset its length (pages are reused)
                self.pcache = dataclasses.replace(
                    self.pcache,
                    lengths=self.pcache.lengths.at[s].set(0))
        return done_now

    def run(self, prompts: List[str], max_gen_len: int = 64,
            temperature: float = 0.0) -> List[str]:
        """Convenience: feed all prompts, loop until drained, return texts
        in submission order."""
        ids = [self.add_request(p, max_gen_len, temperature) for p in prompts]
        while self.pending or any(r is not None for r in self.active.values()):
            self.step()
        by_uid = {r.uid: r for r in self.finished}
        return [self.tokenizer.decode(by_uid[i].generated) for i in ids]
