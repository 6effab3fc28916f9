"""Sharded training step.

Reference hot loop: accessory/engine_finetune.py:13-101 /
engine_pretrain.py:13-142 — autocast forward, loss, scaled backward, global
grad-norm clip, optimizer step, with FSDP reduce-scatter and no_sync grad
accumulation.

TPU design: the whole iteration is one jitted function. Params live sharded
on a (dp, fsdp, tp) mesh; batch is sharded on (dp, fsdp); XLA inserts the
reduce-scatters/all-gathers FSDP did manually. Grad accumulation is a
lax.scan over microbatches inside the step (the no_sync() equivalent: only
one gradient reduction per step). bf16 params with fp32 master copies held
by optax (the reference's promote_trainable_params_to_fp32 role).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from accessory_tpu.train.loss import cross_entropy_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


def _is_static_leaf(x) -> bool:
    """Leaves excluded from differentiation: quantized weights (QPEFT keeps
    the 4-bit base frozen, reference main_finetune.py:172-210) and any
    non-float array."""
    if hasattr(x, "bits") and hasattr(x, "packed"):
        return True
    return hasattr(x, "dtype") and not jnp.issubdtype(x.dtype, jnp.floating)


def _qw(x) -> bool:
    return hasattr(x, "bits") and hasattr(x, "packed")


def partition_params(params):
    """Split into (diff, static) trees with None placeholders (same treedef);
    merge with ``combine_params``."""
    diff = jax.tree.map(lambda x: None if _is_static_leaf(x) else x, params,
                        is_leaf=_qw)
    static = jax.tree.map(lambda x: x if _is_static_leaf(x) else None, params,
                          is_leaf=_qw)
    return diff, static


def combine_params(diff, static):
    return jax.tree.map(lambda d, s: s if d is None else d, diff, static,
                        is_leaf=lambda x: x is None)


def make_train_step(
    module,
    args,
    tx,
    remat=True,  # True/"dots" | "full" (util.remat_policy)
    accum_steps: int = 1,
    ignore_index: int = 0,
    moe_aux: bool = False,
    attn_fn=None,
):
    """Build a jittable train_step(state, batch) → (state, metrics).

    batch: {"examples": (b, s) int32, "labels": (b, s) int32}. With
    ``accum_steps > 1`` the leading batch dim is split into microbatches and
    scanned (grad-accum without extra memory).
    """

    compute_dtype = jnp.dtype(getattr(args, "dtype", "float32"))

    def _autocast(params):
        """The reference's autocast role (tensor_type.py default_tensor_type
        + fp32 masters): params live as fp32 masters in the optimizer, but
        the forward/backward computes in the model dtype — halving
        activation HBM traffic vs running the whole graph in fp32. The cast
        is inside the differentiated function, so weight cotangents
        accumulate back into fp32."""
        if compute_dtype == jnp.float32:
            return params

        def cast(x):
            if hasattr(x, "bits") and hasattr(x, "packed"):
                return x
            if hasattr(x, "dtype") and x.dtype == jnp.float32:
                return x.astype(compute_dtype)
            return x

        return jax.tree.map(cast, params, is_leaf=_qw)

    def loss_fn(params, examples, labels, images=None):
        params = _autocast(params)
        kwargs = {}
        if images is not None:
            kwargs["images"] = images  # multimodal families (sphinx*)
        if attn_fn is not None:
            # context parallelism (parallel.context.cp_attention): inject
            # the sequence-sharded attention into the llama-family forward
            kwargs["attn_fn"] = attn_fn
        if moe_aux:
            logits, _, aux = module.forward(
                params, args, examples, remat=remat, with_aux_loss=True,
                **kwargs)
        else:
            logits, _ = module.forward(params, args, examples, remat=remat,
                                       **kwargs)
            aux = 0.0
        c_loss, n_tok = cross_entropy_loss(logits, labels, ignore_index)
        return c_loss + aux, (c_loss, aux, n_tok)

    def diff_loss_fn(diff, static, examples, labels, images=None):
        return loss_fn(combine_params(diff, static), examples, labels, images)

    grad_fn = jax.value_and_grad(diff_loss_fn, has_aux=True)

    def one_micro(params, mb):
        diff, static = partition_params(params)
        (loss, (c_loss, aux, n_tok)), gdiff = grad_fn(
            diff, static, mb["examples"], mb["labels"], mb.get("images"))
        # static leaves get zero placeholder "grads" (their optimizer label
        # is "frozen"/set_to_zero) so global-norm clipping sees only real ones
        grads = combine_params(gdiff, jax.tree.map(jnp.zeros_like, static))
        return grads, {"loss": loss, "c_loss": c_loss, "aux_loss": aux,
                       "n_tokens": n_tok}

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        params = state.params
        if accum_steps == 1:
            grads, metrics = one_micro(params, batch)
        else:
            def split(x):
                b = x.shape[0]
                return x.reshape(accum_steps, b // accum_steps, *x.shape[1:])

            mbs = jax.tree.map(split, batch)

            def body(carry, mb):
                grads_acc = carry
                g, m = one_micro(params, mb)
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                return grads_acc, m

            zero = jax.tree.map(jnp.zeros_like, params)
            grads, ms = jax.lax.scan(body, zero, mbs)
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            metrics = jax.tree.map(lambda m: jnp.mean(m.astype(jnp.float32)), ms)

        gnorm = optax.global_norm(
            [g for g in jax.tree.leaves(grads) if g is not None])
        updates, opt_state = tx.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics, grad_norm=gnorm)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    return train_step


def _is_float(x) -> bool:
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)


def shard_train_state(state: TrainState, axes_tree, mesh, rules=None):
    """device_put a TrainState: params by their logical axes; optimizer
    moments inherit each param's sharding (ZeRO: optimizer state sharded
    exactly like the fsdp-sharded params)."""
    from accessory_tpu.parallel import DEFAULT_RULES, shard_pytree
    from accessory_tpu.parallel.mesh import named_sharding_tree
    from jax.sharding import NamedSharding, PartitionSpec

    rules = rules or DEFAULT_RULES
    params = shard_pytree(state.params, axes_tree, mesh, rules)
    sh_tree = named_sharding_tree(axes_tree, mesh, rules, params_tree=state.params)
    flat_params, _ = jax.tree.flatten(params)

    # map each opt_state leaf: if it has the same shape as some param, use
    # that param's sharding; else replicate
    shard_by_shape = {}
    for p, s in zip(flat_params, jax.tree.leaves(sh_tree)):
        shard_by_shape.setdefault(getattr(p, "shape", None), s)

    def put(leaf):
        sh = shard_by_shape.get(getattr(leaf, "shape", None))
        if sh is not None and hasattr(leaf, "shape"):
            return jax.device_put(leaf, sh)
        if hasattr(leaf, "shape"):
            return jax.device_put(leaf, NamedSharding(mesh, PartitionSpec()))
        return leaf

    opt_state = jax.tree.map(put, state.opt_state)
    step = jax.device_put(state.step, NamedSharding(mesh, PartitionSpec()))
    return TrainState(step=step, params=params, opt_state=opt_state)
