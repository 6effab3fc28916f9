"""Knock out one component of the real TinyLlama W4 decode step at a time
(monkeypatch at trace time) and measure the per-step delta on the chip.

Components:
  full       the real step (bench.py protocol)
  nohead     final output projection replaced by zeros
  noattn     cached_attention_t returns q (no cache read)
  nowrite    write_kv_t returns the caches untouched
  nomatmul   every module_linear returns zeros (no weight streaming)
  nonorm     rms_norm returns x
  norope     apply_rope identity
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from accessory_tpu.config import LLaMAArgs
from accessory_tpu.models import llama
from accessory_tpu.quant.fuse import fuse_for_decode


def measure(step, params, cache):
    tok = jnp.ones((B.BATCH, 1), jnp.int32)
    logits, cache = step(params, tok, cache, 512)
    np.asarray(logits[0, 0, 0])

    def timed(n, cache):
        t0 = time.perf_counter()
        for i in range(n):
            logits, cache = step(params, tok, cache, 512 + i)
        np.asarray(logits[0, 0, 0])
        return time.perf_counter() - t0, cache

    t1, cache = timed(20, cache)
    t2, cache = timed(120, cache)
    return (t2 - t1) / 100


def main():
    args = LLaMAArgs(dim=2048, n_layers=22, n_heads=32, n_kv_heads=4,
                     vocab_size=32000, multiple_of=256,
                     max_seq_len=B.CACHE_LEN, dtype="bfloat16")
    params = llama.unstack_layers(fuse_for_decode(B._host_synthetic_w4(args)))

    real = {k: getattr(llama, k) for k in
            ("linear", "cached_attention_t", "write_kv_t", "write_kv_layer",
             "module_linear", "module_linear_nr", "rms_norm", "apply_rope")}

    def _zeros_like_out(x, mod):
        w = mod["weight"]
        n = w.out_dim if hasattr(w, "out_dim") else w.shape[-1]
        return jnp.zeros(x.shape[:-1] + (n,), x.dtype)

    def patched(name):
        for k, v in real.items():
            setattr(llama, k, v)
        if name == "nohead":
            # the head is the only module_linear_nr on a (..., vocab) output
            def nr(x, mod, *, norm=None, eps=1e-5, residual=None,
                   rope=None, **kw):
                w = mod["weight"]
                n = w.out_dim if hasattr(w, "out_dim") else w.shape[-1]
                if n == args.vocab_size:
                    return jnp.zeros(x.shape[:-1] + (n,), x.dtype)
                return real["module_linear_nr"](x, mod, norm=norm, eps=eps,
                                                residual=residual, rope=rope,
                                                **kw)
            llama.module_linear_nr = nr
        elif name == "noattn":
            llama.cached_attention_t = (
                lambda q, k, v, ck, cv, pos, **kw: q)
        elif name == "nowrite":
            llama.write_kv_t = lambda ck, cv, nk, nv, pos, **kw: (ck, cv)
            llama.write_kv_layer = lambda ck, cv, nk, nv, pos, **kw: (ck, cv)
        elif name == "nomatmul":
            def nr(x, mod, *, norm=None, eps=1e-5, residual=None,
                   rope=None, **kw):
                y = _zeros_like_out(x, mod)
                return y if residual is None else residual + y
            llama.module_linear = _zeros_like_out
            llama.module_linear_nr = nr
        elif name == "nonorm":
            # in-kernel norms: strip the norm argument instead
            llama.rms_norm = lambda x, w, eps: x
            llama.module_linear_nr = (
                lambda x, mod, *, norm=None, eps=1e-5, residual=None,
                rope=None, **kw:
                real["module_linear_nr"](x, mod, residual=residual,
                                         rope=rope, **kw))
        elif name == "norope":
            llama.apply_rope = lambda x, cos, sin, style: x

        return jax.jit(
            lambda p, t, c, pos: llama.forward(p, args, t, cache=c,
                                               cur_pos=pos),
            donate_argnums=(2,))

    base = None
    for name in (sys.argv[1:] or ["full", "nohead", "noattn", "nowrite",
                                  "nomatmul", "nonorm", "norope"]):
        # fresh cache per config: the step donates it
        cache0 = llama.init_kv_cache(args, B.BATCH, max_len=B.CACHE_LEN,
                                     stacked=False)
        dt = measure(patched(name), params, cache0)
        delta = "" if base is None else f"  (saves {1e3*(base-dt):+.3f})"
        if name == "full":
            base = dt
        print(f"{name:9s} {dt*1e3:7.3f} ms/step{delta}", flush=True)


if __name__ == "__main__":
    main()
