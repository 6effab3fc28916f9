"""Device mesh + logical-axis → PartitionSpec machinery (GSPMD).

Replaces the reference's NCCL process-group world (accessory/util/misc.py:94-146
``init_distributed_mode`` + fairscale ``initialize_model_parallel``): here the
"process grid" is a `jax.sharding.Mesh` and the mapping from parameters to
devices is declarative.

Sharding rules map *logical* axis names (what a dimension means) to *mesh*
axis names (where it lives). Models emit logical axes from ``param_axes()``;
nothing in model code mentions the mesh, so the same model runs 1-chip, TP,
FSDP×TP, or EP by swapping rule tables — the TPU analogue of the reference's
``--data_parallel {sdp,fsdp,ddp} --model_parallel_size N`` switches.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

# logical axis → mesh axis (or tuple of mesh axes, or None = replicate).
# Training default: params sharded over fsdp (ZeRO-3) × tp (megatron dims);
# batch over (dp, fsdp).
DEFAULT_RULES: Dict[str, Any] = {
    "batch": ("dp", "fsdp"),
    "length": None,
    "layers": None,
    "vocab": "tp",
    "embed": "fsdp",
    "heads": "tp",
    "kv_heads": "tp",
    "ffn": "tp",
    "experts": "ep",
    "expert_ffn": "tp",
}

# Inference: no fsdp axis — weights are tp-sharded, batch over dp.
INFERENCE_RULES: Dict[str, Any] = {
    **DEFAULT_RULES,
    "batch": "dp",
    "embed": None,
}


def make_mesh(
    axes: Mapping[str, int],
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh with the given axis sizes, e.g. ``{"dp": 2, "tp": 4}``.

    Axis order follows dict order; sizes must multiply to the device count.
    Axes of size 1 are kept (harmless, makes rule tables uniform).
    """
    devices = list(devices if devices is not None else jax.devices())
    names = tuple(axes.keys())
    sizes = tuple(axes.values())
    if math.prod(sizes) != len(devices):
        raise ValueError(f"mesh {dict(axes)} needs {math.prod(sizes)} devices, have {len(devices)}")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, names)


def local_mesh(tp: int = 1, dp: int = 1, fsdp: int = 1, ep: int = 1,
               cp: int = 1) -> Mesh:
    """Convenience mesh over all visible devices: (dp, fsdp, ep, cp, tp).
    ``cp`` is the context-parallel (sequence-sharding) axis — see
    parallel.context; the reference has no equivalent."""
    return make_mesh({"dp": dp, "fsdp": fsdp, "ep": ep, "cp": cp, "tp": tp})


def _resolve(axis: Optional[str], rules: Mapping[str, Any], mesh_axes) -> Any:
    if axis is None:
        return None
    ma = rules.get(axis, None)
    if ma is None:
        return None
    if isinstance(ma, (tuple, list)):
        present = tuple(a for a in ma if a in mesh_axes)
        return present if present else None
    return ma if ma in mesh_axes else None


def logical_to_pspec(
    axes: Optional[Tuple[Optional[str], ...]],
    rules: Mapping[str, Any] = DEFAULT_RULES,
    mesh: Optional[Mesh] = None,
) -> PartitionSpec:
    """Translate a tuple of logical axis names into a PartitionSpec.

    Mesh axes absent from ``mesh`` (or of size 1 on a 1-device mesh) resolve
    to replication, so the same axes work across any mesh topology.
    """
    if axes is None:
        return PartitionSpec()
    mesh_axes = set(mesh.axis_names) if mesh is not None else set(
        a for v in rules.values() for a in ((v,) if isinstance(v, str) else (v or ()))
    )
    return PartitionSpec(*[_resolve(a, rules, mesh_axes) for a in axes])


def _is_qweight(x) -> bool:
    from accessory_tpu.quant.qtensor import QuantizedWeight

    return isinstance(x, QuantizedWeight)


def _fit_spec(spec: PartitionSpec, shape, mesh: Optional[Mesh]) -> PartitionSpec:
    """Replicate any dim whose size isn't divisible by its mesh-axis size.

    Needed because a QuantizedWeight's scales/zeros have in_dim/group_size
    rows — at production sizes (4096/128=32 groups) any tp divides, but tiny
    test models would otherwise fail to shard."""
    if mesh is None:
        return spec
    out = []
    for d, ax in enumerate(tuple(spec) + (None,) * (len(shape) - len(tuple(spec)))):
        size = math.prod(mesh.shape[a] for a in ((ax,) if isinstance(ax, str) else ax)) \
            if ax else 1
        out.append(ax if size and shape[d] % size == 0 else None)
    return PartitionSpec(*out)


def _qweight_specs(qw, spec: PartitionSpec, mesh: Optional[Mesh] = None) -> Any:
    """Derive child PartitionSpecs for a QuantizedWeight from its logical
    (in_dim, out_dim) spec: packed/scales/zeros are all (in-blocks, out), so
    they inherit both axes (with non-divisible dims replicated)."""
    axes = tuple(spec)
    if qw.packed.ndim == 3:  # layer-stacked: (L, in-blocks, out)
        lead = axes[0] if len(axes) == 3 else None
        in_ax, out_ax = (axes[1:] + (None, None))[:2] if len(axes) == 3 else (axes + (None, None))[:2]
        child = PartitionSpec(lead, in_ax, out_ax)
    else:
        in_ax, out_ax = (axes + (None, None))[:2]
        child = PartitionSpec(in_ax, out_ax)
    return {
        "packed": _fit_spec(child, qw.packed.shape, mesh),
        "scales": _fit_spec(child, qw.scales.shape, mesh),
        "zeros": _fit_spec(child, qw.zeros.shape, mesh),
    }


def named_sharding_tree(
    axes_tree,
    mesh: Mesh,
    rules: Mapping[str, Any] = DEFAULT_RULES,
    params_tree=None,
):
    """Map a tree of logical-axes tuples to a tree of NamedShardings.

    If ``params_tree`` is given, QuantizedWeight leaves expand into child
    shardings for (packed, scales, zeros).
    """

    def make(axes, param=None):
        spec = logical_to_pspec(axes, rules, mesh)
        if param is not None and _is_qweight(param):
            specs = _qweight_specs(param, spec, mesh)
            return type(param)(
                packed=NamedSharding(mesh, specs["packed"]),
                scales=NamedSharding(mesh, specs["scales"]),
                zeros=NamedSharding(mesh, specs["zeros"]),
                bits=param.bits, group_size=param.group_size,
                in_dim=param.in_dim, out_dim=param.out_dim,
                act_dtype=param.act_dtype,
            )
        return NamedSharding(mesh, spec)

    is_axes_leaf = lambda x: x is None or (  # noqa: E731
        isinstance(x, tuple) and all(e is None or isinstance(e, str) for e in x)
    )
    if params_tree is None:
        return jax.tree.map(make, axes_tree, is_leaf=is_axes_leaf)
    return jax.tree.map(
        lambda a, p: make(a, p), axes_tree, params_tree,
        is_leaf=is_axes_leaf,
    )


def shard_pytree(
    params,
    axes_tree,
    mesh: Mesh,
    rules: Mapping[str, Any] = DEFAULT_RULES,
):
    """device_put a params pytree according to its logical axes.

    The GSPMD equivalent of constructing FairScale parallel layers sized by
    ``mp_world_size`` (reference llama.py:96-99): instead of allocating 1/N
    locally, we allocate globally and let NamedSharding place the shards.
    """
    sh = named_sharding_tree(axes_tree, mesh, rules, params_tree=params)
    flat_p, treedef = jax.tree.flatten(params)
    flat_s = jax.tree.leaves(sh)
    assert len(flat_p) == len(flat_s), (len(flat_p), len(flat_s))
    return jax.tree.unflatten(treedef, [jax.device_put(p, s) for p, s in zip(flat_p, flat_s)])


def with_sharding_constraint_axes(x, axes, rules=DEFAULT_RULES, mesh: Optional[Mesh] = None):
    """Annotate an intermediate activation with logical axes (the GSPMD
    analogue of the reference's explicit gather/reduce_to_model_parallel
    collective calls — here XLA derives the collective)."""
    mesh = mesh or _current_mesh()
    if mesh is None or all(s == 1 for s in mesh.shape.values()):
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, logical_to_pspec(axes, rules, mesh)))


def _current_mesh() -> Optional[Mesh]:
    env = jax.sharding.get_abstract_mesh() if hasattr(jax.sharding, "get_abstract_mesh") else None
    try:
        from jax._src.mesh import thread_resources

        m = thread_resources.env.physical_mesh
        return None if m.empty else m
    except Exception:
        return None
