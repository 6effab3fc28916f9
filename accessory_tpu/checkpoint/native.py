"""Native checkpoint format: flat safetensors + quant sidecar.

Layout of a checkpoint dir:
  weights.safetensors — every pytree leaf under its "/"-joined path; a
    QuantizedWeight leaf expands to <path>#packed / #scales / #zeros
  quant.json          — {path: {bits, group_size, in_dim, out_dim, act_dtype}}
  (plus config.json / meta.json / tokenizer files written by MetaModel)

Replaces the reference's per-MP-rank ``consolidated.NN-of-MM.model.pth``
files (accessory/util/misc.py:323-386): one file serves every mesh shape.
Sequential multi-path loading with override/add semantics mirrors
``load_tensor_parallel_model_list`` (tensor_parallel.py:425-485); trainable-
only saves (``--only_save_trainable``, misc.py:346-352) map to the ``filter``
argument.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

WEIGHTS_FILE = "weights.safetensors"
QUANT_FILE = "quant.json"


def _qmeta_dict(qw) -> Dict[str, Any]:
    return {"bits": qw.bits, "group_size": qw.group_size, "in_dim": qw.in_dim,
            "out_dim": qw.out_dim, "act_dtype": str(np.dtype(qw.act_dtype)),
            "layout": qw.layout, "tile_k": qw.tile_k}


def flatten_params(params) -> Dict[str, Any]:
    """Flatten a params pytree to {path: array}; QuantizedWeight → #-suffixed
    children plus a #meta entry holding the wrapper."""
    from accessory_tpu.quant.qtensor import QuantizedWeight

    flat: Dict[str, Any] = {}

    def visit(node, prefix):
        if isinstance(node, QuantizedWeight):
            base = prefix[:-1]
            flat[base + "#packed"] = node.packed
            flat[base + "#scales"] = node.scales
            flat[base + "#zeros"] = node.zeros
            flat[base + "#meta"] = node
        elif isinstance(node, dict):
            for k, v in node.items():
                visit(v, prefix + k + "/")
        else:
            flat[prefix[:-1]] = node

    visit(params, "")
    return flat


def save_checkpoint(
    save_dir: str,
    params,
    filter: Optional[Callable[[str], bool]] = None,
) -> None:
    """Write weights.safetensors (+ quant.json). ``filter(path)`` selects the
    subset to save (PEFT trainable-only saves)."""
    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)
    flat = flatten_params(params)
    quant_meta: Dict[str, Any] = {}
    tensors: Dict[str, np.ndarray] = {}
    for key, val in flat.items():
        base = key.split("#")[0]
        if filter is not None and not filter(base):
            continue
        if key.endswith("#meta"):
            quant_meta[base] = _qmeta_dict(val)
            continue
        arr = np.asarray(val)
        if arr.dtype == jnp.bfloat16:
            # safetensors-numpy can't express bf16; store raw bits
            tensors[key + "@bf16"] = arr.view(np.uint16)
        else:
            tensors[key] = arr
    save_file(tensors, str(Path(save_dir) / WEIGHTS_FILE))
    with open(Path(save_dir) / QUANT_FILE, "w") as f:
        json.dump(quant_meta, f, indent=2)


def _read_flat(load_dir: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    raw = load_file(str(Path(load_dir) / WEIGHTS_FILE))
    out = {}
    for k, v in raw.items():
        if k.endswith("@bf16"):
            out[k[: -len("@bf16")]] = v.view(jnp.bfloat16)
        else:
            out[k] = v
    return out


def unflatten_params(flat: Dict[str, Any], quant_meta: Dict[str, Any]):
    """Rebuild the nested pytree, re-wrapping quantized leaves."""
    from accessory_tpu.quant.qtensor import QuantizedWeight

    # group quantized children
    tree: Dict[str, Any] = {}
    qparts: Dict[str, Dict[str, Any]] = {}
    for key, val in flat.items():
        if "#" in key:
            base, part = key.split("#", 1)
            qparts.setdefault(base, {})[part] = val
            continue
        _insert(tree, key.split("/"), val)
    for base, parts in qparts.items():
        meta = quant_meta[base]
        qw = QuantizedWeight(
            packed=jnp.asarray(parts["packed"]),
            scales=jnp.asarray(parts["scales"]),
            zeros=jnp.asarray(parts["zeros"]),
            bits=int(meta["bits"]), group_size=int(meta["group_size"]),
            in_dim=int(meta["in_dim"]), out_dim=int(meta["out_dim"]),
            act_dtype=jnp.dtype(meta["act_dtype"]),
            layout=meta.get("layout", "std"),
            tile_k=int(meta.get("tile_k", 0)),
        )
        _insert(tree, base.split("/"), qw)
    return tree


def _insert(tree: Dict[str, Any], path: List[str], val) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = val


def load_checkpoint(load_dir: str):
    """Load a native checkpoint dir → params pytree."""
    quant_meta = {}
    qf = Path(load_dir) / QUANT_FILE
    if qf.exists():
        quant_meta = json.loads(qf.read_text())
    return unflatten_params(_read_flat(load_dir), quant_meta)


def stream_checkpoint(load_dir: str, device_put_fn=None):
    """Stream tensors one at a time (safetensors lazy slicing) — the
    counterpart of the reference's ShardedTensorLoader
    (tensor_parallel.py:488-576) for checkpoints larger than host RAM.

    Yields (path, array); with ``device_put_fn(path, np_array) -> Array``
    each tensor is placed (e.g. onto its mesh shards) before the next is
    read, so peak host memory stays at one tensor.
    """
    from safetensors import safe_open

    with safe_open(str(Path(load_dir) / WEIGHTS_FILE), framework="np") as f:
        for key in f.keys():
            arr = f.get_tensor(key)
            if key.endswith("@bf16"):
                key = key[: -len("@bf16")]
                arr = arr.view(jnp.bfloat16)
            if device_put_fn is not None:
                arr = device_put_fn(key, arr)
            yield key, arr


def load_checkpoint_streaming(load_dir: str, shardings_flat=None):
    """Build the params pytree tensor-by-tensor, optionally placing each
    leaf with its NamedSharding as it loads (70B-class checkpoints never
    fully materialize on one host)."""
    quant_meta = {}
    qf = Path(load_dir) / QUANT_FILE
    if qf.exists():
        quant_meta = json.loads(qf.read_text())

    def put(key, arr):
        if shardings_flat and key in shardings_flat:
            return jax.device_put(arr, shardings_flat[key])
        return arr

    flat = dict(stream_checkpoint(load_dir, device_put_fn=put))
    return unflatten_params(flat, quant_meta)


def _merge_into(dst: Dict[str, Any], src: Dict[str, Any], diff: bool) -> None:
    """Override/add (or add-delta when ``diff``) — the semantics of
    load_tensor_parallel_model_list (tensor_parallel.py:425-485)."""
    for k, v in src.items():
        if diff and k in dst and hasattr(dst[k], "shape"):
            dst[k] = (jnp.asarray(dst[k]) + jnp.asarray(v)).astype(dst[k].dtype)
        else:
            dst[k] = v


def load_checkpoint_list(
    paths: Sequence[str],
    template_params=None,
    dtype: Optional[str] = None,
):
    """Sequentially load checkpoint dirs, later paths overriding/adding —
    base weights + finetune deltas compose exactly like the reference.

    Each path may be a native dir (weights.safetensors) or a PyTorch
    reference dir (consolidated.* files — auto-imported). ``template_params``
    (from init_params) supplies leaves absent from every checkpoint and the
    target structure for validation.
    """
    from accessory_tpu.checkpoint.torch_import import (
        import_reference_checkpoint, infer_checkpoint_format_and_mp_size)

    flat: Dict[str, Any] = flatten_params(template_params) if template_params else {}
    quant_meta = {
        k[: -len("#meta")]: v for k, v in list(flat.items()) if k.endswith("#meta")
    }
    flat = {k: v for k, v in flat.items() if not k.endswith("#meta")}

    for p in paths:
        if (Path(p) / WEIGHTS_FILE).exists():
            src = _read_flat(p)
            qf = Path(p) / QUANT_FILE
            if qf.exists():
                quant_meta.update(json.loads(qf.read_text()))
            _merge_into(flat, src, diff=False)
        else:
            fmt, _ = infer_checkpoint_format_and_mp_size(p)
            src = import_reference_checkpoint(p)
            _merge_into(flat, src, diff=fmt.endswith("_diff"))

    if dtype is not None:
        cast = jnp.dtype(dtype)

        def maybe_cast(k, v):
            if "#" in k or not hasattr(v, "dtype"):
                return v
            if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating):
                return jnp.asarray(v).astype(cast)
            return v

        flat = {k: maybe_cast(k, v) for k, v in flat.items()}

    qm = {base: (m if isinstance(m, dict) else _qmeta_dict(m))
          for base, m in quant_meta.items()}
    return unflatten_params(flat, qm)
