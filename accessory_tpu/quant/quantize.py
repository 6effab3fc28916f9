"""Whole-model quantization: swap dense weights in a params pytree for
QuantizedWeight, honoring a per-model blocklist.

Reference behavior being reproduced (accessory/util/quant.py:95-164 +
MetaModel.get_quant_blocklist, model get_quant_blocklist overrides like
llama_ens.py:523-532): quantize every linear weight except (a) anything on
the model's blocklist (visual encoders), (b) LoRA adapter weights, (c)
embeddings / norms / output head (the reference only swaps Linear layers;
we additionally keep the output head dense by default for logit fidelity —
pass ``quantize_output=True`` to include it).
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import jax
import jax.numpy as jnp

from accessory_tpu.quant.qtensor import QuantizedWeight, quantize_weight

# path substrings never quantized
DEFAULT_BLOCKLIST = (
    "tok_embeddings",
    "norm",          # attention_norm / ffn_norm / final norm
    "lora",          # PEFT adapters stay high precision (quant.py:102-105)
    "bias",
    "gate",          # MoE router: tiny and accuracy-critical (fp32 softmax)
    "visual",        # SPHINX visual encoders (llama_ens.py:523-532)
    "rope",
)


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path
    )


def quantize_params(
    params,
    bits: int = 4,
    group_size: int = 128,
    blocklist: Sequence[str] = DEFAULT_BLOCKLIST,
    quantize_output: bool = False,
    predicate: Callable[[str, jnp.ndarray], bool] | None = None,
    layout: str = "auto",
):
    """Return a params pytree with eligible 2-D weights quantized.

    Eligible: ndim == 2 (or stacked-layer ndim == 3, quantized per layer along
    axis 0), floating dtype, in_dim divisible by group_size, path not in
    blocklist.

    ``layout``: "std" | "planes" | "w8" | "auto" (on TPU: planes for W4 —
    the int8-staged kernel layout, ops/quant_matmul_planes.py — and w8 for
    W8A16, ops/quant_matmul_w8.py; std elsewhere, where the XLA fallback /
    interpret mode serves).
    """
    if layout == "auto":
        on_tpu = jax.default_backend() == "tpu"
        layout = ("planes" if bits == 4 and on_tpu
                  else "w8" if bits == 8 and on_tpu
                  else "std")
    block = tuple(blocklist) + (() if quantize_output else ("output",))

    def maybe_planes(qw):
        if layout == "planes":
            from accessory_tpu.quant.qtensor import to_planes_layout
            return to_planes_layout(qw)
        if layout == "w8":
            from accessory_tpu.quant.qtensor import to_w8_layout
            return to_w8_layout(qw)
        return qw

    def visit(path, leaf):
        if not isinstance(leaf, jnp.ndarray) and not hasattr(leaf, "dtype"):
            return leaf
        name = _path_str(path)
        if any(b in name for b in block):
            return leaf
        if predicate is not None and not predicate(name, leaf):
            return leaf
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
        # pad odd reduction dims to keep the fused kernel's K-tiles big
        # (see quantize_weight pad_in_to)
        def pad_to(in_dim):
            return 1024 if in_dim >= 1024 else group_size

        if leaf.ndim == 2 and leaf.shape[0] % group_size == 0:
            return maybe_planes(
                quantize_weight(leaf, bits=bits, group_size=group_size,
                                act_dtype=leaf.dtype,
                                pad_in_to=pad_to(leaf.shape[0])))
        if leaf.ndim == 3 and leaf.shape[1] % group_size == 0:
            # stacked layers (L, in, out): quantize each layer, stack pytrees
            qws = [maybe_planes(
                       quantize_weight(leaf[i], bits=bits,
                                       group_size=group_size,
                                       act_dtype=leaf.dtype,
                                       pad_in_to=pad_to(leaf.shape[1])))
                   for i in range(leaf.shape[0])]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *qws)
        if leaf.ndim == 4 and leaf.shape[2] % group_size == 0:
            # stacked MoE experts (L, E, in, out)
            qls = []
            for l in range(leaf.shape[0]):
                qes = [maybe_planes(
                           quantize_weight(leaf[l, e], bits=bits,
                                           group_size=group_size,
                                           act_dtype=leaf.dtype,
                                           pad_in_to=pad_to(leaf.shape[2])))
                       for e in range(leaf.shape[1])]
                qls.append(jax.tree.map(lambda *xs: jnp.stack(xs), *qes))
            return jax.tree.map(lambda *xs: jnp.stack(xs), *qls)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)
