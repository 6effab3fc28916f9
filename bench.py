"""Benchmark: decode throughput of the flagship config on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

Model: TinyLlama-1.1B-class LLaMA (BASELINE.json config 1: dim 2048, 22
layers, GQA 32/4, vocab 32000), bf16 weights, batch-8 incremental decode with
a 1024-token KV cache — the reference's serving hot loop
(accessory/model/meta.py:427-443 / llama.py forward_inference) as a single
jitted step.

``vs_baseline`` is the fraction of the memory-bandwidth roofline achieved:
the reference publishes no tokens/s (SURVEY.md §6), so speed-of-light HBM
bandwidth is the honest comparator (BASELINE.json north star: ≥85% of
roofline). roofline tok/s = HBM_BW / bytes_touched_per_token, where
bytes/token ≈ param bytes + KV bytes read per step.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

# v5e (TPU v5 lite): ~819 GB/s HBM bandwidth per chip
HBM_BW = 819e9

BATCH = 8
CACHE_LEN = 1024
STEPS = 50


def main() -> None:
    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama

    args = LLaMAArgs(dim=2048, n_layers=22, n_heads=32, n_kv_heads=4,
                     vocab_size=32000, multiple_of=256, max_seq_len=CACHE_LEN,
                     dtype="bfloat16")
    params = llama.init_params(jax.random.PRNGKey(0), args)
    cache = llama.init_kv_cache(args, BATCH, max_len=CACHE_LEN)

    n_params = sum(x.size for x in jax.tree.leaves(params))
    param_bytes = n_params * 2  # bf16
    kv_bytes_per_tok = (args.n_layers * BATCH * CACHE_LEN
                        * args.kv_heads * args.head_dim * 2 * 2) // BATCH
    roofline_tok_s = HBM_BW / (param_bytes / BATCH + kv_bytes_per_tok)

    step = jax.jit(
        lambda p, t, c, pos: llama.forward(p, args, t, cache=c, cur_pos=pos),
        donate_argnums=(2,))

    import numpy as np

    tok = jnp.ones((BATCH, 1), jnp.int32)
    # warmup / compile
    logits, cache = step(params, tok, cache, 512)
    _ = np.asarray(logits[0, 0, 0])  # host fetch = real barrier (the axon
    # relay's block_until_ready returns before execution finishes)

    def timed(n_steps, cache):
        t0 = time.perf_counter()
        logits = None
        for i in range(n_steps):
            logits, cache = step(params, tok, cache, 512 + i)
        _ = np.asarray(logits[0, 0, 0])
        return time.perf_counter() - t0, cache

    # two-point fit removes the fixed dispatch+fetch overhead (~30ms/fetch)
    n1, n2 = 20, STEPS + 20
    t1, cache = timed(n1, cache)
    t2, cache = timed(n2, cache)
    per_step = (t2 - t1) / (n2 - n1)

    tok_s = BATCH / per_step
    print(json.dumps({
        "metric": "decode tokens/s/chip TinyLlama-1.1B bf16 bs8 (jitted step)",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / roofline_tok_s, 4),
    }))


if __name__ == "__main__":
    main()
