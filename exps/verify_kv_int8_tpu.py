"""On-chip verify: int8 KV decode + fused rope epilogue vs bf16/XLA oracle.

Drives a tiny llama through prefill + decode on the real TPU in three
configs (bf16 cache, int8 cache, int8 + paged) and checks logits stay
close to the bf16 baseline. Small shapes -> fast compiles.
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.config import LLaMAArgs
from accessory_tpu.models import llama

print("backend:", jax.default_backend(), flush=True)

args = LLaMAArgs(dim=256, n_layers=2, n_heads=8, n_kv_heads=4,
                 vocab_size=512, max_seq_len=256)
params = llama.init_params(jax.random.key(0), args)
uparams = llama.unstack_layers(params)
toks = jax.random.randint(jax.random.key(1), (2, 8), 0, 512)


def run(kv_dtype, rope_fuse, n_steps=4):
    os.environ["ACCESSORY_ROPE_FUSE"] = "1" if rope_fuse else "0"
    cache = llama.init_kv_cache(args, 2, max_len=256, stacked=False,
                                kv_dtype=kv_dtype)
    fwd = jax.jit(
        lambda p, t, c, pos: llama.forward(p, args, t, cache=c, cur_pos=pos),
        static_argnames=(), donate_argnums=(2,))
    logits, cache = fwd(uparams, toks, cache, 0)
    outs = [np.asarray(logits[:, -1])]
    tok = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
    for i in range(n_steps):
        logits, cache = fwd(uparams, tok, cache, 8 + i)
        outs.append(np.asarray(logits[:, 0]))
        tok = jnp.argmax(logits[:, 0], -1)[:, None].astype(jnp.int32)
    return np.stack(outs)


base = run(None, rope_fuse=False)
fused = run(None, rope_fuse=True)
i8 = run("int8", rope_fuse=True)
i8_nf = run("int8", rope_fuse=False)

d_rope = np.max(np.abs(base - fused))
d_i8 = np.max(np.abs(base - i8))
d_i8n = np.max(np.abs(base - i8_nf))
print(f"rope-fuse max|d|={d_rope:.4f}  int8 max|d|={d_i8:.4f}  "
      f"int8-nofuse max|d|={d_i8n:.4f}", flush=True)
assert d_rope < 0.05, d_rope        # same math, kernel vs XLA rounding
assert d_i8 < 0.35, d_i8            # int8 KV quantization error, tiny model
assert d_i8n < 0.35, d_i8n

# paged path (scheduler-style): prefill into pools + decode, for each of
# (bf16, int8) x (XLA gather, Pallas paged kernel)
def run_paged(kv_dtype, kernel_mode, n_steps=3):
    os.environ["ACCESSORY_ROPE_FUSE"] = "0"
    os.environ["ACCESSORY_PAGED_KERNEL"] = kernel_mode
    pc = llama.init_paged_cache(args, slots=2, total_pages=8, page_size=64,
                                kv_dtype=kv_dtype)
    pfwd = jax.jit(lambda p, t, c: llama.forward_paged(p, args, t, c),
                   donate_argnums=(2,))
    logits, pc = pfwd(uparams, toks, pc)
    outs = [np.asarray(logits[:, -1])]
    tok = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
    for i in range(n_steps):
        logits, pc = pfwd(uparams, tok, pc)
        outs.append(np.asarray(logits[:, 0]))
        tok = jnp.argmax(logits[:, 0], -1)[:, None].astype(jnp.int32)
    return np.stack(outs)


pg = run_paged("int8", kernel_mode="0")
d_paged = np.max(np.abs(pg[0] - i8[0]))
print(f"paged-int8 prefill max|d| vs unrolled-int8: {d_paged:.4f}",
      flush=True)
assert d_paged < 0.35, d_paged

# Pallas paged kernel vs the gather path, exact same pools/tokens
for kv in (None, "int8"):
    a = run_paged(kv, kernel_mode="0")
    b = run_paged(kv, kernel_mode="1")
    d = np.max(np.abs(a - b))
    print(f"paged kernel vs gather ({kv or 'bf16'}): max|d|={d:.4f}",
          flush=True)
    assert d < 0.05, d  # same context bytes, kernel vs XLA rounding only
# bf16 scale storage: same packed weights, f16-representable scales ->
# the bf16-stored kernel must match the f32-stored kernel on chip. (r4:
# scales now STREAM in their stored dtype — the host-side f32 astype that
# used to mask it is gone — and Mosaic rejects f16 blocks outright
# ("Unsupported type f16"), so f16 storage is no longer chip-runnable;
# bf16 is the supported 16-bit option.)
from accessory_tpu.quant.qtensor import (QuantizedWeight, quant_matmul,
                                         quantize_weight, to_planes_layout,
                                         to_w8_layout, dequantize_weight)

w = jax.random.normal(jax.random.key(3), (1024, 256), jnp.float32) * 0.03
x = jax.random.normal(jax.random.key(4), (8, 1024), jnp.float32)
qw = quantize_weight(w, bits=4, group_size=128)
s16 = qw.scales.astype(jnp.float16).astype(jnp.float32)
qw = QuantizedWeight(qw.packed, s16, qw.zeros, qw.bits, qw.group_size,
                     qw.in_dim, qw.out_dim, qw.act_dtype, qw.layout,
                     qw.tile_k)
ref = np.asarray(quant_matmul(x, to_planes_layout(qw, scale_dtype='float32')))
for sd in ("bfloat16",):
    got = np.asarray(quant_matmul(x, to_planes_layout(qw, scale_dtype=sd)))
    d = float(np.max(np.abs(got - ref)))
    print(f"planes scales {sd}: max|d|={d:.5f}", flush=True)
    assert d < 0.15, (sd, d)

# W8A16 kernel vs XLA dequant reference on chip
qw8 = quantize_weight(w, bits=8, group_size=128)
ref8 = np.asarray(x @ dequantize_weight(qw8, jnp.float32))
got8 = np.asarray(quant_matmul(x, to_w8_layout(qw8, scale_dtype='float32')))
d8 = float(np.max(np.abs(got8 - ref8)) / max(1e-6, np.abs(ref8).max()))
print(f"w8 kernel rel|d|={d8:.5f}", flush=True)
assert d8 < 0.02, d8

print("VERIFY OK: int8 KV + rope fuse + paged (kernel+gather) + "
      "bf16-scales + w8 on", jax.default_backend())
