"""Pipeline parallelism: GPipe-style microbatch schedule over a ``pp`` axis.

BEYOND-REFERENCE: the reference has no pipeline parallelism (SURVEY.md §2.2
"PP: No — nothing in repo"); its scale story is FSDP × megatron-TP only.
GSPMD tp×fsdp covers the reference's published scale points, but a complete
TPU framework wants PP for topologies where a model's layers exceed one
slice's HBM and tp would have to cross DCN: layers are the natural cut.

TPU-native design (single program, no per-stage processes):
  * The stacked ``layers`` pytree (every leaf (L, ...)) is sharded over the
    ``pp`` mesh axis on its leading axis — stage s holds layers
    [s*L/pp, (s+1)*L/pp). No parameter code changes: it is just a sharding
    rule ("layers" → "pp").
  * The schedule runs inside a ``jax.shard_map`` manual over {pp}: a
    Python-unrolled loop of M + pp - 1 ticks; each tick every stage runs
    its layer block on its current microbatch and ``ppermute``s the
    activations to the next stage (ICI neighbor exchange). dp/fsdp/tp stay
    GSPMD-automatic (partial-manual shard_map), so PP composes with the
    existing axes.
  * Backward is plain jax AD through the schedule (GPipe with remat:
    ``jax.checkpoint`` around each stage call bounds activation memory to
    one microbatch per tick per stage). The head+loss run on every stage
    and are masked to the last (simple and correct; the waste is one
    head matmul per non-last stage — acceptable until a model is
    head-dominated).

Bubble fraction is the GPipe (pp-1)/(M+pp-1); choose microbatches M ≥ 4*pp
to keep it under ~20%.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from accessory_tpu.train.loss import cross_entropy_loss


def pp_param_specs(params: Dict[str, Any], pp_axis: str = "pp"):
    """shard_map in_specs pytree for a llama-family params dict: stacked
    ``layers`` leaves split on their leading (layer) axis, everything else
    replicated across pp (dp/fsdp/tp placement of those leaves stays
    GSPMD-automatic outside the manual axis set)."""
    return {k: (P(pp_axis) if k == "layers" else P())
            for k in params.keys()}


def make_pp_loss_fn(
    module,
    args,
    mesh: Mesh,
    *,
    pp_axis: str = "pp",
    microbatches: int = 4,
    ignore_index: int = 0,
    remat: bool = True,
):
    """Build loss_fn(params, tokens, labels) -> (loss, n_tok) running the
    GPipe schedule over ``mesh``'s pp axis. ``module`` must expose the
    llama-family internals (_block, precompute_rope)."""
    pp = mesh.shape[pp_axis]
    M = microbatches
    L = args.n_layers
    assert L % pp == 0, (L, pp)

    def stage_fn(layers_local, h, cos, sin):
        def body(h, layer):
            h, _, _ = module._block(h, layer, args, cos, sin, 0, None)
            return h, None

        if remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(body, h, layers_local)
        return h

    def inner(params, tokens, labels):
        # params["layers"] leaves arrive (L/pp, ...) local; the rest whole
        idx = jax.lax.axis_index(pp_axis)
        b, T = tokens.shape
        assert b % M == 0, (b, M)
        mb = b // M
        cos, sin = module.precompute_rope(
            args.head_dim, T, args.rope_theta, args.rope_scaling)
        h_all = jnp.take(params["tok_embeddings"]["weight"], tokens, axis=0)
        hs = h_all.reshape(M, mb, T, -1)
        layers_local = params["layers"]

        buf = jnp.zeros_like(hs[0])
        outs = []
        for t in range(M + pp - 1):
            # stage 0 feeds microbatch t (static index); others their inbox
            x_in = jnp.where(idx == 0, hs[min(t, M - 1)], buf)
            y = stage_fn(layers_local, x_in.astype(hs.dtype), cos, sin)
            if t >= pp - 1:
                # on the LAST stage this is microbatch t-(pp-1), fully done
                outs.append(y)
            buf = jax.lax.ppermute(
                y, pp_axis, [(r, (r + 1) % pp) for r in range(pp)])

        hN = jnp.stack(outs)  # (M, mb, T, D) — final only on last stage
        from accessory_tpu.ops.linear import module_linear_nr

        logits = module_linear_nr(
            hN, params["output"], norm=params["norm"],
            eps=args.norm_eps).astype(jnp.float32)
        lab = labels.reshape(M, mb, T)
        num = jnp.zeros((), jnp.float32)
        den = jnp.zeros((), jnp.float32)
        for i in range(M):
            li, ni = cross_entropy_loss(logits[i], lab[i], ignore_index)
            num += li * ni
            den += ni
        last = (idx == pp - 1).astype(jnp.float32)
        num = jax.lax.psum(num * last, pp_axis)
        den = jax.lax.psum(den * last, pp_axis)
        return num / jnp.maximum(den, 1.0), den

    def loss_fn(params, tokens, labels):
        spec_tree = pp_param_specs(params, pp_axis)
        g = jax.shard_map(
            inner, mesh=mesh,
            in_specs=(spec_tree, P(), P()),
            out_specs=(P(), P()),
            axis_names=frozenset({pp_axis}), check_vma=False)
        return g(params, tokens, labels)

    return loss_fn


def make_pp_train_step(
    module,
    args,
    tx,
    mesh: Mesh,
    *,
    pp_axis: str = "pp",
    microbatches: int = 4,
    ignore_index: int = 0,
    remat: bool = True,
):
    """GPipe train_step(state, batch) → (state, metrics) — the PP analogue
    of train.make_train_step (which stays the default for tp×fsdp)."""
    import optax

    from accessory_tpu.train.train_step import TrainState

    loss_fn = make_pp_loss_fn(
        module, args, mesh, pp_axis=pp_axis, microbatches=microbatches,
        ignore_index=ignore_index, remat=remat)

    def train_step(state: TrainState, batch):
        def wrapped(params):
            loss, n_tok = loss_fn(params, batch["examples"], batch["labels"])
            return loss, n_tok

        (loss, n_tok), grads = jax.value_and_grad(
            wrapped, has_aux=True)(state.params)
        gnorm = optax.global_norm(
            [g for g in jax.tree.leaves(grads) if g is not None])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "n_tokens": n_tok, "grad_norm": gnorm}
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    return train_step


# sharding rules for the PP layout: layers over pp, megatron dims over tp,
# params otherwise fsdp-sharded as usual (parallel.mesh.DEFAULT_RULES)
def pp_rules(base_rules: Optional[dict] = None, pp_axis: str = "pp"):
    from accessory_tpu.parallel.mesh import DEFAULT_RULES

    rules = dict(base_rules or DEFAULT_RULES)
    rules["layers"] = pp_axis
    return rules
