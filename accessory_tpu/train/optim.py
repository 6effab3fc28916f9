"""Optimizer construction: AdamW with weight-decay param groups and
per-group LR scaling.

Reference: apex FusedAdam + weight-decay split (accessory/util/misc.py:544-557
— no decay for ndim<=1 params and biases) + layer-wise lr decay keyed on name
prefixes (accessory/util/param_group.py). optax's multi_transform is the
TPU-native equivalent; XLA fuses the update (the role apex played on GPU).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def param_label_fn(params, trainable: Optional[Callable[[str], bool]] = None):
    """Label each leaf "decay" / "no_decay" / "frozen".

    no_decay: ndim <= 1 (norm weights, biases) plus stacked-layer variants
    (leading layer axis, so effective ndim-1 <= 1) — mirrors misc.py:544-557.
    ``trainable(path)`` False → "frozen" (get_trainable_params protocol,
    meta.py:216-224).
    """
    from accessory_tpu.quant.qtensor import QuantizedWeight

    def label(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if trainable is not None and not trainable(name):
            return "frozen"
        if isinstance(leaf, QuantizedWeight):
            return "frozen"  # quantized weights never train directly (QPEFT)
        nd = getattr(leaf, "ndim", 0)
        if "bias" in name or "norm" in name:
            return "no_decay"
        # stacked-layer params carry a leading L axis; a (L, d) norm/bias is
        # logically 1-D
        if nd <= 1:
            return "no_decay"
        return "decay"

    return jax.tree_util.tree_map_with_path(
        label, params,
        is_leaf=lambda x: hasattr(x, "bits") and hasattr(x, "packed"))


def make_optimizer(
    params,
    lr_fn: Callable[[int], float] | float,
    weight_decay: float = 0.02,
    betas=(0.9, 0.95),
    clip_norm: Optional[float] = None,
    trainable: Optional[Callable[[str], bool]] = None,
):
    """AdamW with decay split + optional global-norm clip.

    clip_norm reproduces util/clip_grad.py's *global* norm across every
    parameter — trivially correct under GSPMD because gradients are global
    arrays (the reference needed 150 lines of DP×MP group reductions).
    """
    labels = param_label_fn(params, trainable)

    def adamw(decay):
        lr = lr_fn if callable(lr_fn) else float(lr_fn)
        return optax.adamw(learning_rate=lr, b1=betas[0], b2=betas[1],
                           weight_decay=decay, eps=1e-8)

    tx = optax.multi_transform(
        {"decay": adamw(weight_decay), "no_decay": adamw(0.0),
         "frozen": optax.set_to_zero()},
        labels)
    if clip_norm is not None:
        # mask the clip to float leaves: QPEFT's static placeholder "grads"
        # (zeros_like of uint32 packed weights) would otherwise crash
        # lax.select inside clip_by_global_norm with a dtype mismatch
        def _float_mask(tree):
            return jax.tree.map(
                lambda x: hasattr(x, "dtype")
                and jnp.issubdtype(x.dtype, jnp.floating), tree)

        tx = optax.chain(
            optax.masked(optax.clip_by_global_norm(clip_norm), _float_mask),
            tx)
    return tx


def scale_lr_by_prefix(params, lr_scales):
    """Per-group LR scaling keyed on param-path prefixes.

    Reference: accessory/util/param_group.py — layer-wise LR decay for the
    visual-encoder groups (each group's lr multiplied by ``lr_scale``).
    Chain AFTER the optimizer: optax.chain(tx, scale_lr_by_prefix(...)).
    lr_scales: {path_prefix: scale}; longest matching prefix wins, default 1.
    """
    import optax

    prefixes = sorted(lr_scales, key=len, reverse=True)

    def scale_of(path) -> float:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        for pre in prefixes:
            if name.startswith(pre):
                return float(lr_scales[pre])
        return 1.0

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        scaled = jax.tree_util.tree_map_with_path(
            lambda path, u: u * scale_of(path), updates)
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)
