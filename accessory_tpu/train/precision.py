"""Precision utilities.

Reference: accessory/util/tensor_type.py — ``default_tensor_type`` context
(ours: the ``dtype`` model arg) and ``promote_trainable_params_to_fp32``
(:60-66): trainable params train in fp32 while frozen ones stay half
precision.

TPU note: on GPU the reference pairs fp32 master params with bf16 autocast
compute. Here ``promote_trainable_params_to_fp32`` gives the fp32 masters;
matmul inputs stay in the activations' dtype because XLA's bf16 matmul
accepts fp32 operands (precision=DEFAULT lowers fp32 params onto the bf16
MXU path), so no explicit autocast wrapper is needed.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def promote_trainable_params_to_fp32(params, trainable: Optional[Callable[[str], bool]] = None):
    """Cast trainable float leaves to fp32 (frozen leaves untouched)."""
    from accessory_tpu.quant.qtensor import QuantizedWeight

    def visit(path, leaf):
        if isinstance(leaf, QuantizedWeight):
            return leaf
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if trainable is not None and not trainable(name):
            return leaf
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(jnp.float32)
        return leaf

    return jax.tree_util.tree_map_with_path(
        visit, params, is_leaf=lambda x: isinstance(x, QuantizedWeight))
