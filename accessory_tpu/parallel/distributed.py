"""Multi-host initialization + global mesh construction.

Reference: accessory/util/misc.py:94-146 ``init_distributed_mode`` (env-var /
SLURM rank discovery + NCCL process-group init). TPU equivalent:
``jax.distributed.initialize`` per host, then ONE global mesh whose outermost
axis rides DCN (data parallel across slices) and whose inner axes
(fsdp/ep/tp) ride ICI within a slice — the layout the scaling playbook
prescribes so collectives stay on fast interconnect.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed_mode(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Dict[str, int]:
    """Initialize multi-host JAX. No-ops on a single host.

    Env fallbacks mirror the reference's discovery order: explicit args →
    JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID → SLURM variables →
    single-process.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and "SLURM_STEP_NODELIST" in os.environ:
        # first node of the allocation, default port (reference uses a
        # rendezvous file / derived master addr the same way)
        node = os.environ["SLURM_STEP_NODELIST"].split(",")[0].split("[")[0]
        coordinator_address = f"{node}:8476"
        num_processes = num_processes or int(os.environ.get("SLURM_NPROCS", 1))
        process_id = process_id if process_id is not None else int(
            os.environ.get("SLURM_PROCID", 0))
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", 1)),
            process_id=process_id if process_id is not None else int(
                os.environ.get("JAX_PROCESS_ID", 0)))
    return {"rank": jax.process_index(), "world_size": jax.process_count(),
            "local_devices": jax.local_device_count()}


def make_global_mesh(
    tp: int = 1,
    fsdp: int = 1,
    ep: int = 1,
    dcn_dp: Optional[int] = None,
) -> Mesh:
    """Global mesh (dcn_dp, dp, fsdp, ep, tp): dcn_dp spans hosts/slices
    (pure data parallel over DCN), the rest divide each slice's chips over
    ICI. With dcn_dp=None the host count is used.

    Uses jax.experimental.mesh_utils' hybrid helper when multiple slices are
    present so the device order matches the physical topology.
    """
    n_proc = jax.process_count()
    dcn_dp = dcn_dp if dcn_dp is not None else (n_proc if n_proc > 1 else 1)
    per_slice = len(jax.devices()) // dcn_dp
    inner = per_slice // (tp * fsdp * ep)
    assert inner >= 1 and per_slice == inner * tp * fsdp * ep, (
        per_slice, tp, fsdp, ep)
    shape = {"dp": inner, "fsdp": fsdp, "ep": ep, "tp": tp}

    if dcn_dp > 1:
        from jax.experimental import mesh_utils

        # granule = TPU slice when the topology reports one slice per dcn
        # group; otherwise fall back to process granules (multi-host CPU,
        # and single-slice multi-host pods, neither of which has a usable
        # slice_index)
        n_slices = len({getattr(d, "slice_index", 0) for d in jax.devices()})
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(inner, fsdp, ep, tp),
            dcn_mesh_shape=(dcn_dp, 1, 1, 1),
            process_is_granule=(n_slices != dcn_dp),
        )
        return Mesh(devices.reshape(dcn_dp * inner, fsdp, ep, tp),
                    ("dp", "fsdp", "ep", "tp"))

    devices = np.asarray(jax.devices()).reshape(inner, fsdp, ep, tp)
    return Mesh(devices, ("dp", "fsdp", "ep", "tp"))
