"""LR schedules: cosine with linear warmup, iter- and epoch-based.

Reference: accessory/util/lr_sched.py:3-35 — warmup is linear from 0,
cosine decays from lr to min_lr; per-group ``lr_scale`` multiplies the
result (layer-wise lr decay, util/param_group.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_lr(it, lr: float, min_lr: float, warmup: float, total: float):
    """Schedule value at step ``it``. Traceable — optax calls schedules with
    a traced step count inside the jitted update."""
    it = jnp.asarray(it, jnp.float32)
    warm = lr * it / jnp.maximum(warmup, 1e-9)
    progress = jnp.clip((it - warmup) / jnp.maximum(total - warmup, 1e-9), 0.0, 1.0)
    cos = min_lr + (lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
    return jnp.where(it < warmup, warm, cos)


def adjust_learning_rate(it: int, args) -> float:
    """Iter-based (pretrain loop, engine_pretrain.py usage)."""
    return cosine_lr(it, args.lr, args.min_lr, args.warmup_iters, args.lr_decay_iters)


def adjust_learning_rate_epoch(epoch_frac: float, args) -> float:
    """Epoch-based (finetune loop, engine_finetune.py:38)."""
    return cosine_lr(epoch_frac, args.lr, args.min_lr, args.warmup_epochs, args.epochs)
