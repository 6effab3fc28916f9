"""Real 2-process ``jax.distributed`` dryrun (multi-host path proof).

VERDICT r4 item 2: everything multi-chip so far ran in ONE process with 8
virtual CPU devices; ``parallel.distributed.init_distributed_mode`` /
``make_global_mesh``'s dcn axis (the code path the reference exercises on
every multi-node job via torch.distributed, accessory/util/misc.py:94-146)
had never executed with two actual processes. This launches

  2 processes x 4 CPU devices  (gloo collectives, coordinator on localhost)

builds the global (dp, fsdp, ep, tp) mesh THROUGH the hybrid dcn x ici
helper, runs ONE dp x tp train step and one W4-TP decode across processes,
and asserts the loss and logits match a single-process 8-device run of the
identical program bit-for-bit shapes (f32 tolerance for reduction order).

Usage:
  python exps/dryrun_multihost.py              # orchestrator: spawns all 3
  python exps/dryrun_multihost.py worker I P   # internal: worker I, port P
  python exps/dryrun_multihost.py ref          # internal: 1-process baseline

Writes MULTIHOST.json at the repo root (the green artifact).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
LOCAL_DEV = 4


def _setup_jax():
    sys.path.insert(0, REPO)
    import jax

    # the axon sitecustomize pins jax_platforms="axon,cpu" via jax.config;
    # env vars alone cannot override it (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    # CPU cross-process collectives need an explicit implementation
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from accessory_tpu.util.compile_cache import enable_cpu_cache

    enable_cpu_cache()
    return jax


def _workload(mesh, out_path: str):
    """One sharded train step + one W4-TP decode on ``mesh`` (identical
    program in the 2-process and 1-process runs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama
    from accessory_tpu.parallel import INFERENCE_RULES, shard_pytree
    from accessory_tpu.quant import quantize_params
    from accessory_tpu.train import TrainState, make_optimizer, make_train_step
    from accessory_tpu.train.train_step import shard_train_state

    # --- dp x tp train step --------------------------------------------
    args = LLaMAArgs(dim=128, n_layers=2, n_heads=8, n_kv_heads=4,
                     vocab_size=256, multiple_of=64, max_seq_len=64,
                     dtype="float32")
    params = jax.tree.map(np.asarray,
                          llama.init_params(jax.random.PRNGKey(0), args))
    tx = make_optimizer(params, 1e-3, clip_norm=1.0)
    state = shard_train_state(TrainState.create(params, tx),
                              llama.param_axes(args), mesh)
    step = jax.jit(make_train_step(llama, args, tx, remat=True))
    repl = NamedSharding(mesh, P())
    batch = {
        "examples": jax.device_put(np.tile(np.arange(32, dtype=np.int32) % 251,
                                           (8, 1)), repl),
        "labels": jax.device_put(np.ones((8, 32), np.int32), repl),
    }
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)

    # --- W4 TP-sharded decode ------------------------------------------
    iparams = quantize_params(
        jax.tree.map(np.asarray, llama.init_params(jax.random.PRNGKey(2),
                                                   args)), group_size=64)
    iparams = shard_pytree(iparams, llama.param_axes(args), mesh,
                           INFERENCE_RULES)
    cache = llama.init_kv_cache(args, 4, max_len=32, kv_dtype="fp")
    qfwd = jax.jit(lambda p, t, c, pos: llama.forward(
        p, args, t, cache=c, cur_pos=pos), out_shardings=repl)
    toks = jax.device_put(
        np.tile(np.arange(8, dtype=np.int32)[None] + 3, (4, 1)), repl)
    logits, cache = qfwd(iparams, toks, cache, 0)
    tok1 = jax.device_put(np.full((4, 1), 7, np.int32), repl)
    logits, cache = qfwd(iparams, tok1, cache, 8)
    logits_np = np.asarray(jax.device_get(logits.addressable_data(0)))
    assert logits_np.shape == (4, 1, 256)

    if out_path:
        np.savez(out_path, loss=np.float64(loss), logits=logits_np)
    return loss


def run_worker(pid: int, port: int, out_path: str) -> None:
    jax = _setup_jax()
    from accessory_tpu.parallel.distributed import (init_distributed_mode,
                                                    make_global_mesh)

    info = init_distributed_mode(
        coordinator_address=f"localhost:{port}",
        num_processes=N_PROC, process_id=pid)
    assert info["world_size"] == N_PROC, info
    assert info["local_devices"] == LOCAL_DEV, info
    assert len(jax.devices()) == N_PROC * LOCAL_DEV
    # dcn_dp=2 (one "slice" per process) x ici (dp=2, tp=2) per slice —
    # exercises the hybrid dcn x ici device-order helper
    mesh = make_global_mesh(tp=2)
    assert dict(mesh.shape) == {"dp": 4, "fsdp": 1, "ep": 1, "tp": 2}, (
        mesh.shape)
    loss = _workload(mesh, out_path if pid == 0 else "")
    print(f"worker {pid}: mesh {dict(mesh.shape)} over "
          f"{jax.process_count()} processes, loss={loss:.6f}", flush=True)


def run_reference(out_path: str) -> None:
    jax = _setup_jax()
    from accessory_tpu.parallel.distributed import make_global_mesh

    assert len(jax.devices()) == N_PROC * LOCAL_DEV
    mesh = make_global_mesh(tp=2)  # single process: dcn_dp=1, plain reshape
    assert dict(mesh.shape) == {"dp": 4, "fsdp": 1, "ep": 1, "tp": 2}
    loss = _workload(mesh, out_path)
    print(f"reference: 1-process 8-device mesh, loss={loss:.6f}", flush=True)


def orchestrate() -> int:
    import socket

    with socket.socket() as s:  # free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    tmp = tempfile.mkdtemp(prefix="mh_dryrun_")
    ref_npz = os.path.join(tmp, "ref.npz")
    mh_npz = os.path.join(tmp, "mh.npz")

    def env(n_dev):
        e = dict(os.environ)
        e["XLA_FLAGS"] = (e.get("XLA_FLAGS", "")
                          + f" --xla_force_host_platform_device_count={n_dev}"
                          + " --xla_cpu_parallel_codegen_split_count=1").strip()
        e["JAX_PLATFORMS"] = "cpu"
        return e

    me = os.path.abspath(__file__)
    ref = subprocess.run([sys.executable, me, "ref", ref_npz],
                         env=env(N_PROC * LOCAL_DEV), cwd=REPO, timeout=900,
                         capture_output=True, text=True)
    print(ref.stdout, end="")
    if ref.returncode != 0:
        print(ref.stderr[-3000:], file=sys.stderr)
        return 1

    procs = [subprocess.Popen(
        [sys.executable, me, "worker", str(i), str(port), mh_npz],
        env=env(LOCAL_DEV), cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for i in range(N_PROC)]
    rc = 0
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            rc = 1
        print(out, end="")
        if p.returncode != 0:
            print(f"--- worker {i} stderr ---\n{err[-3000:]}", file=sys.stderr)
            rc = 1
    if rc:
        return rc

    import numpy as np

    ref_d, mh_d = np.load(ref_npz), np.load(mh_npz)
    dl = abs(float(ref_d["loss"]) - float(mh_d["loss"]))
    dlog = float(np.max(np.abs(ref_d["logits"] - mh_d["logits"])))
    ok = dl < 1e-4 and dlog < 1e-3  # f32, cross-process reduction order
    result = {
        "metric": "2-process jax.distributed dryrun (dp4 x tp2 over dcn2)",
        "ok": bool(ok), "loss_delta": dl, "logits_max_delta": dlog,
        "loss": float(mh_d["loss"]),
        "train_step": "dp x tp sharded fwd+bwd+clip+adamw",
        "decode": "W4A16 TP-sharded prefill+decode",
    }
    print(json.dumps(result), flush=True)
    with open(os.path.join(REPO, "MULTIHOST.json"), "w") as f:
        json.dump(result, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        run_worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    elif len(sys.argv) > 1 and sys.argv[1] == "ref":
        run_reference(sys.argv[2])
    else:
        sys.exit(orchestrate())
