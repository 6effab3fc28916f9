"""Top-k MoE routing + expert computation (Mixtral-style SwiGLU experts).

Behavioral reference: accessory/model/LLM/mixtral.py:220-295 (whole-expert
layout, softmax→topk gating, load-balancing loss) and mixtral_sparse.py:299-488
(megablocks/stk block-sparse grouped GEMM path). This file is the TPU
re-design of both:

  * ``moe_ffn_ragged`` — sort-by-expert + ``jax.lax.ragged_dot`` grouped GEMM.
    The TPU-native equivalent of megablocks sort/histogram/padded_gather +
    stk sdd/dsd: argsort and bincount run in XLA, the grouped matmul lowers to
    one MXU kernel over expert bins. No capacity factor, no token dropping —
    exact.
  * ``moe_ffn_dense`` — GShard-style one-hot einsum dispatch. Compute is
    E/k× redundant but it is fully GSPMD-shardable on an ``ep`` axis with
    XLA-inserted all_to_alls, and at decode batch sizes the weights (not
    FLOPs) are the bottleneck, matching the reference's observation that
    decode MoE is memory-bound.

Gating numerics follow mixtral_sparse.py:417-421: softmax over experts in
fp32, top-k, renormalize the top-k weights to sum to 1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def topk_gating(
    x: jnp.ndarray,
    gate_w: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Router: returns (weights (T,k) fp32 renormalized, indices (T,k) int32,
    full softmax scores (T,E) fp32 — needed by the load-balancing loss).

    Reference: mixtral.py:272-279 / mixtral_sparse.py:417-421 (fp32 softmax).
    """
    logits = jnp.dot(x.astype(jnp.float32), gate_w.astype(jnp.float32))
    scores = jax.nn.softmax(logits, axis=-1)
    weights, idx = jax.lax.top_k(scores, k)
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, idx.astype(jnp.int32), scores


def load_balancing_loss(
    scores: jnp.ndarray, idx: jnp.ndarray, num_experts: int, k: int,
    weight: float,
) -> jnp.ndarray:
    """aux loss = w * E / (T*k) * dot(tokens_per_expert, mean_scores).

    Reference: mixtral.py:245-262 `_load_balancing_loss` (bincount of chosen
    experts dotted with mean router scores).
    """
    t = scores.shape[0]
    counts = jnp.sum(
        jax.nn.one_hot(idx.reshape(-1), num_experts, dtype=jnp.float32), axis=0)
    mean_scores = jnp.mean(scores, axis=0)
    scale = weight * num_experts / (t * k)
    return scale * jnp.dot(counts, mean_scores)


def _swiglu_expert_ragged(xs, w1, w3, w2, group_sizes):
    """Grouped SwiGLU: xs (M, d) rows grouped by expert; w* (E, d, h)/(E, h, d)."""
    dt = xs.dtype
    gate = jax.lax.ragged_dot(xs, w1, group_sizes, preferred_element_type=jnp.float32)
    up = jax.lax.ragged_dot(xs, w3, group_sizes, preferred_element_type=jnp.float32)
    hidden = (jax.nn.silu(gate) * up).astype(dt)
    return jax.lax.ragged_dot(hidden, w2, group_sizes, preferred_element_type=jnp.float32)


def moe_ffn_ragged(
    x: jnp.ndarray,
    gate_w: jnp.ndarray,
    w1: jnp.ndarray,
    w3: jnp.ndarray,
    w2: jnp.ndarray,
    k: int = 2,
    balance_weight: Optional[float] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Exact top-k MoE via sort + grouped GEMM.

    x: (T, d); gate_w: (d, E); w1/w3: (E, d, h); w2: (E, h, d).
    Returns (out (T, d) in x.dtype, aux_loss or None).
    """
    t, d = x.shape
    e = gate_w.shape[1]
    weights, idx, scores = topk_gating(x, gate_w, k)

    flat_expert = idx.reshape(-1)  # (T*k,) expert id per (token, slot)
    order = jnp.argsort(flat_expert)  # stable
    token_of = order // k  # original token for each sorted row
    xs = jnp.take(x, token_of, axis=0)  # (T*k, d) gathered by expert order

    group_sizes = jnp.sum(
        jax.nn.one_hot(flat_expert, e, dtype=jnp.int32), axis=0)

    ys = _swiglu_expert_ragged(xs, w1, w3, w2, group_sizes)  # (T*k, d) fp32
    ys = ys * jnp.take(weights.reshape(-1), order)[:, None]

    out = jnp.zeros((t, d), jnp.float32).at[token_of].add(ys)
    aux = None
    if balance_weight is not None:
        aux = load_balancing_loss(scores, idx, e, k, balance_weight)
    return out.astype(x.dtype), aux


def moe_ffn_dense(
    x: jnp.ndarray,
    gate_w: jnp.ndarray,
    w1: jnp.ndarray,
    w3: jnp.ndarray,
    w2: jnp.ndarray,
    k: int = 2,
    balance_weight: Optional[float] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Exact top-k MoE via per-expert masked compute (GSPMD/ep-shardable).

    Every expert processes every token; non-selected outputs are zeroed by the
    combine weights. FLOP-redundant but embarrassingly shardable on the
    ``experts`` axis (each ep shard computes its own experts' einsum slice and
    the final sum is an XLA reduce) — the direct analogue of the reference's
    whole-expert layout with reduce_from_model_parallel_region
    (mixtral.py:230-240, :290).
    """
    t, d = x.shape
    e = gate_w.shape[1]
    weights, idx, scores = topk_gating(x, gate_w, k)

    # combine[t, e] = routing weight of expert e for token t (0 if unselected)
    combine = jnp.zeros((t, e), jnp.float32)
    combine = combine.at[jnp.arange(t)[:, None], idx].set(weights)

    dt = x.dtype
    gate = jnp.einsum("td,edh->eth", x, w1, preferred_element_type=jnp.float32)
    up = jnp.einsum("td,edh->eth", x, w3, preferred_element_type=jnp.float32)
    hidden = (jax.nn.silu(gate) * up).astype(dt)
    outs = jnp.einsum("eth,ehd->etd", hidden, w2, preferred_element_type=jnp.float32)
    out = jnp.einsum("etd,te->td", outs, combine)

    aux = None
    if balance_weight is not None:
        aux = load_balancing_loss(scores, idx, e, k, balance_weight)
    return out.astype(x.dtype), aux


def _qw_index(qw, e: int):
    """Per-expert 2-D view of a (E, …)-stacked QuantizedWeight."""
    return type(qw)(
        packed=qw.packed[e], scales=qw.scales[e], zeros=qw.zeros[e],
        bits=qw.bits, group_size=qw.group_size, in_dim=qw.in_dim,
        out_dim=qw.out_dim, act_dtype=qw.act_dtype, layout=qw.layout,
        tile_k=qw.tile_k)


def moe_ffn_quant(
    x: jnp.ndarray,
    gate_w: jnp.ndarray,
    qw1, qw3, qw2,
    k: int = 2,
    balance_weight: Optional[float] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Top-k MoE over W4-quantized experts (BASELINE config 3).

    Per-expert fused dequant+matmuls with mask-combine. Each expert's
    SwiGLU triplet is gated behind ``lax.cond`` on whether ANY token routed
    to it, so untouched experts stream ZERO weight bytes that step — at
    decode the touched-expert count is min(t*k, E)-ish, and for small
    batches (interactive bs1 top-2 of 8) this skips ~75% of expert HBM
    traffic. Touched experts read their full weights once and compute on
    all t rows (compute is free at decode batch sizes; bytes are the
    bottleneck). Role: megablocks dispatch, mixtral_sparse.py:378-488."""
    t, d = x.shape
    e = gate_w.shape[1]
    weights, idx, scores = topk_gating(x, gate_w, k)
    combine = jnp.zeros((t, e), jnp.float32)
    combine = combine.at[jnp.arange(t)[:, None], idx].set(weights)
    touched = jnp.sum(combine, axis=0) > 0  # (E,) any token routed

    from accessory_tpu.quant.qtensor import quant_matmul

    def pick(qw, ei):
        # pre-unstacked experts (tuple of per-expert QuantizedWeight, see
        # models.llama.unstack_layers) read their own HBM buffers; a static
        # slice of the stacked form is materialized by XLA before the cond
        # (custom-call operands never fuse slices), costing a copy even for
        # untouched experts
        return qw[ei] if isinstance(qw, (list, tuple)) else _qw_index(qw, ei)

    out = jnp.zeros((t, d), jnp.float32)
    for ei in range(e):  # static loop: E cond-gated kernel call triplets
        q1, q3, q2 = pick(qw1, ei), pick(qw3, ei), pick(qw2, ei)

        def run(x):
            gate = jax.nn.silu(quant_matmul(x, q1).astype(jnp.float32))
            up = quant_matmul(x, q3).astype(jnp.float32)
            y = quant_matmul((gate * up).astype(x.dtype), q2)
            return y.astype(jnp.float32)

        y = jax.lax.cond(touched[ei], run,
                         lambda x: jnp.zeros((t, d), jnp.float32), x)
        out = out + combine[:, ei:ei + 1] * y

    aux = None
    if balance_weight is not None:
        aux = load_balancing_loss(scores, idx, e, k, balance_weight)
    return out.astype(x.dtype), aux


def moe_ffn(x, gate_w, w1, w3, w2, k=2, balance_weight=None, impl: str = "ragged"):
    """Dispatch entry. impl: "ragged" (exact grouped GEMM) | "dense"
    (ep-shardable). Quantized expert weights always take the quant path."""
    if isinstance(w1, (list, tuple)) and hasattr(w1[0], "packed"):
        return moe_ffn_quant(x, gate_w, w1, w3, w2, k=k,
                             balance_weight=balance_weight)
    if hasattr(w1, "packed"):
        return moe_ffn_quant(x, gate_w, w1, w3, w2, k=k,
                             balance_weight=balance_weight)
    fn = moe_ffn_ragged if impl == "ragged" else moe_ffn_dense
    return fn(x, gate_w, w1, w3, w2, k=k, balance_weight=balance_weight)
