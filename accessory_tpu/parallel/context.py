"""Context parallelism: sequence-sharded attention over a ``cp`` mesh axis.

BEYOND-REFERENCE: the reference has no sequence/context parallelism of any
kind — long context is handled only by RoPE position interpolation
(SURVEY.md §2.2 PP/SP/CP row; accessory/model/LLM/llama.py:46-56
rope_scaling) and the full causal mask materializes O(L^2) in its non-flash
path. This module scales *training* sequence length across chips the
TPU-native way:

  * Activations carry the sequence axis sharded over ``cp``; every
    position-local op (matmuls, norms, SwiGLU, embedding, loss) needs no
    change — GSPMD keeps them sharded (this also subsumes Megatron-style
    "sequence parallelism" for the norms: they compute on local shards).
  * Attention — the only op that mixes positions — runs inside a
    ``jax.shard_map`` manual over {cp, tp}: K/V are all-gathered along cp
    (ICI-bandwidth-optimal on a torus, overlappable with the kernel) and
    the splash kernel runs with its native sequence-sharding support
    (``q_seq_shards``): each shard computes only its own q rows' blocks,
    and causal block-skipping means late shards do proportionally more
    work but nothing recomputes. dp/fsdp stay GSPMD-automatic (partial
    manual shard_map).

This is the all-gather-KV form of context parallelism. A ring
(ppermute-pipelined) variant trades peak memory for latency; on ICI the
all-gather already moves the same bytes with one collective, so the ring
buys nothing until S*nkv*hd per layer stops fitting — out of scope until a
model needs it.

Compute cost per chip: attention FLOPs drop ~cp× (causal blocks split
across shards), KV gather adds (cp-1)/cp * S*nkv*hd*2 bytes of ICI
traffic per layer.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_CP_KERNEL_CACHE = {}


def _splash_cp_kernel(nq: int, s_global: int, cp: int, tp: int,
                      mesh: Mesh, cp_axis: str, tp_axis: Optional[str],
                      interpret: bool):
    """Sequence-sharded splash kernel + its shard_map partition spec."""
    key = (nq, s_global, cp, tp, cp_axis, tp_axis, interpret)
    if key not in _CP_KERNEL_CACHE:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk, splash_attention_mask as sm)

        from accessory_tpu.ops.flash_attention import splash_block_sizes

        mask = sm.MultiHeadMask(
            [sm.CausalMask((s_global, s_global)) for _ in range(nq)])
        # per-shard q length is s_global/cp — blocks must divide IT
        bs = splash_block_sizes(s_global // cp, s_global)
        # eager mask-info build — under an active trace the cached kernel
        # would capture tracers (see ops.flash_attention._splash_kernel);
        # residual name lets the dots remat policy save the output
        # instead of rerunning the forward in backward (util.remat_policy)
        with jax.ensure_compile_time_eval():
            kernel = sk.make_splash_mha(
                mask=mask, head_shards=tp, q_seq_shards=cp,
                block_sizes=bs,
                residual_checkpoint_name="splash_attn_out",
                interpret=interpret)
        spec = kernel.manual_sharding_spec(NamedSharding(
            mesh, P(tp_axis if tp > 1 else None, cp_axis)))
        _CP_KERNEL_CACHE[key] = (kernel, spec)
    return _CP_KERNEL_CACHE[key]


def cp_attention(
    q: jnp.ndarray,  # (b, S, nq, hd) global shapes under jit
    k: jnp.ndarray,  # (b, S, nkv, hd)
    v: jnp.ndarray,
    *,
    mesh: Mesh,
    cp_axis: str = "cp",
    tp_axis: Optional[str] = "tp",
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    use_splash: Optional[bool] = None,
) -> jnp.ndarray:
    """Causal self-attention with the sequence axis sharded over ``cp``.

    Drop-in for ``ops.attention.attention(q, k, v, causal=True)`` inside a
    GSPMD-jitted training step on ``mesh``. The in_specs force the
    sequence sharding at this boundary; GSPMD propagates it outward to the
    rest of the (position-local) model.
    """
    b, s_global, nq, hd = q.shape
    nkv = k.shape[2]
    cp = mesh.shape[cp_axis]
    tp = mesh.shape.get(tp_axis, 1) if tp_axis else 1
    if scale is None:
        scale = hd ** -0.5
    assert s_global % cp == 0, (s_global, cp)
    assert nq % tp == 0 and (tp == 1 or nkv % tp == 0), (nq, nkv, tp)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if use_splash is None:
        use_splash = not interpret  # interpret-mode splash only on request

    manual = {cp_axis} | ({tp_axis} if tp > 1 else set())
    hspec = tp_axis if tp > 1 else None
    qkv_spec = P(None, cp_axis, hspec, None)

    if use_splash and s_global % (cp * 128) == 0 and hd in (64, 128, 256):
        kernel, kspec = _splash_cp_kernel(
            nq, s_global, cp, tp, mesh, cp_axis, tp_axis,
            interpret=interpret)

        def inner(kern, q, k, v):
            # local: q (b, S/cp, nq/tp, hd); k/v (b, S/cp, nkv/tp, hd)
            kg = jax.lax.all_gather(k, cp_axis, axis=1, tiled=True)
            vg = jax.lax.all_gather(v, cp_axis, axis=1, tiled=True)
            qt = (q * scale).astype(q.dtype).transpose(0, 2, 1, 3)
            out = jax.vmap(kern)(qt, kg.transpose(0, 2, 1, 3),
                                 vg.transpose(0, 2, 1, 3))
            return out.transpose(0, 2, 1, 3).astype(q.dtype)

        f = jax.shard_map(
            inner, mesh=mesh,
            in_specs=(kspec, qkv_spec, qkv_spec, qkv_spec),
            out_specs=qkv_spec, axis_names=frozenset(manual),
            check_vma=False)
        return f(kernel, q, k, v)

    # XLA fallback (CPU tests / odd shapes): same sharding structure, the
    # grouped-GQA reference attention with a per-shard position offset
    from accessory_tpu.ops.attention import attention

    s_local = s_global // cp

    def inner_xla(q, k, v):
        kg = jax.lax.all_gather(k, cp_axis, axis=1, tiled=True)
        vg = jax.lax.all_gather(v, cp_axis, axis=1, tiled=True)
        off = jax.lax.axis_index(cp_axis) * s_local
        return attention(q, kg, vg, causal=True, q_offset=off, scale=scale)

    f = jax.shard_map(
        inner_xla, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec),
        out_specs=qkv_spec, axis_names=frozenset(manual),
        check_vma=False)
    return f(q, k, v)


def make_cp_attn_fn(mesh: Mesh, cp_axis: str = "cp",
                    tp_axis: Optional[str] = "tp"):
    """Bind mesh/axes → an ``attn_fn(q, k, v)`` for model forwards
    (models.llama.forward(..., attn_fn=...))."""
    return functools.partial(cp_attention, mesh=mesh, cp_axis=cp_axis,
                             tp_axis=tp_axis)
