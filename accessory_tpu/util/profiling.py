"""Profiling & roofline reporting.

The reference has no profiler integration (SURVEY.md §5: wall-clock meters
only). TPU build adds:
  * ``trace(logdir)``     — jax.profiler trace capture context (view in
    TensorBoard / Perfetto)
  * ``time_fn``           — robust wall-clock timing through the axon relay
    (host-fetch barrier + two-point overhead fit, since block_until_ready
    returns early on this backend)
  * ``roofline_report``   — bytes/flops accounting for a params pytree at
    decode, vs measured step time (the BASELINE "speed-of-light" check)
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np

HBM_BW_DEFAULT = 819e9  # v5e spec; measured streaming ceiling ~656 GB/s


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_busy_from_trace(logdir: str) -> Dict[str, float]:
    """Digest a jax.profiler trace dir: seconds the DEVICE spent executing
    kernels ("XLA Ops" lane busy time) vs the lane's wall span.

    The device-bound number a co-located production host would see is
    work / busy_s; wall - busy is host/dispatch/relay overhead. Used by the
    serving benches to split relay-span from device-span (VERDICT r4 #5).
    """
    import gzip
    import json as _json
    import os

    cands = []
    for root, _, files in os.walk(logdir):
        for f in files:
            if f.endswith("trace.json.gz"):
                cands.append(os.path.join(root, f))
    if not cands:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    prof = max(cands, key=os.path.getmtime)  # newest: stale traces linger
    with gzip.open(prof) as f:
        tr = _json.load(f)
    lanes = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lanes[(e["pid"], e["tid"])] = e["args"]["name"]
    xla = [k for k, v in lanes.items() if "XLA Ops" in v]
    if not xla:
        raise RuntimeError(f"no 'XLA Ops' lane; lanes={sorted(set(lanes.values()))}")
    pid, tid = xla[0]
    dev = [e for e in tr["traceEvents"]
           if e.get("ph") == "X" and e["pid"] == pid and e["tid"] == tid]
    busy = sum(e["dur"] for e in dev)
    span = (max(e["ts"] + e["dur"] for e in dev) - min(e["ts"] for e in dev)
            if dev else 0)
    return {"busy_s": busy / 1e6, "span_s": span / 1e6, "n_kernels": len(dev)}


def time_fn(f: Callable, *args, n1: int = 20, n2: int = 120) -> float:
    """Seconds per call, amortized; the returned value excludes fixed
    dispatch+fetch overhead (two-point fit)."""
    out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n1):
        out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n2):
        out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n2 - n1)


def params_bytes(params) -> int:
    from accessory_tpu.quant.qtensor import QuantizedWeight

    total = 0
    for leaf in jax.tree.leaves(
            params, is_leaf=lambda x: isinstance(x, QuantizedWeight)):
        if isinstance(leaf, QuantizedWeight):
            total += (leaf.packed.size * leaf.packed.dtype.itemsize
                      + leaf.scales.size * leaf.scales.dtype.itemsize
                      + leaf.zeros.size * leaf.zeros.dtype.itemsize)
        else:
            total += leaf.size * leaf.dtype.itemsize
    return total


def roofline_report(step_fn: Callable, params, batch: int,
                    kv_bytes_per_step: int = 0, *step_args,
                    hbm_bw: float = HBM_BW_DEFAULT) -> Dict[str, float]:
    """Measure a decode step and report achieved vs speed-of-light."""
    dt = time_fn(step_fn, params, *step_args)
    wbytes = params_bytes(params)
    bytes_per_step = wbytes + kv_bytes_per_step
    sol_step = bytes_per_step / hbm_bw
    return {
        "step_ms": dt * 1e3,
        "tokens_per_s": batch / dt,
        "weight_bytes": wbytes,
        "achieved_gbps": bytes_per_step / dt / 1e9,
        "roofline_fraction": sol_step / dt,
    }
