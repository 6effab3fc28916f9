"""Training checkpoint save/resume (two-stage).

Reference: accessory/util/misc.py:323-527 —
  * epoch{N}[-iter{M}] directories with consolidated weights + config.json +
    meta.json + tokenizer (:365-386)
  * optimizer state + epoch/iter metadata (*.other.pth, :409-424)
  * per-rank dataset iterator state (rank-specific-*.pth, :426-437)
  * two-stage resume: weights before wrapping (resume_stage1 :440-462),
    optimizer/scaler/dataset after (resume_stage2 :465-527)

TPU version: weights go to our safetensors format (any mesh reloads it);
optimizer state + step metadata go to an orbax PyTreeCheckpointer dir
(sharding-aware); dataset/sampler state is JSON per data shard.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path
from typing import Any, Dict, Optional

import jax

from accessory_tpu.checkpoint import load_checkpoint_list, save_checkpoint


def ckpt_dir_name(epoch: int, it: Optional[int] = None) -> str:
    return f"epoch{epoch}" + (f"-iter{it}" if it is not None else "")


def save_train_checkpoint(
    output_dir: str,
    state,  # TrainState
    args=None,
    epoch: int = 0,
    it: Optional[int] = None,
    model_args=None,
    llama_type: Optional[str] = None,
    tokenizer=None,
    dataset_state: Optional[Dict[str, Any]] = None,
    trainable_filter=None,
    only_save_trainable: bool = False,
    data_shard_rank: int = 0,
) -> str:
    import dataclasses

    import orbax.checkpoint as ocp

    save_dir = os.path.join(output_dir, ckpt_dir_name(epoch, it))
    os.makedirs(save_dir, exist_ok=True)

    # 1. weights (optionally trainable-only, reference --only_save_trainable)
    filt = trainable_filter if only_save_trainable else None
    save_checkpoint(save_dir, state.params, filter=filt)

    # 2. self-description (config.json / meta.json / tokenizer, :365-386)
    if model_args is not None:
        with open(Path(save_dir) / "config.json", "w") as f:
            json.dump(dataclasses.asdict(model_args), f, indent=2)
    if llama_type is not None:
        with open(Path(save_dir) / "meta.json", "w") as f:
            json.dump({"llama_type": llama_type}, f, indent=2)
    if tokenizer is not None:
        tokenizer.save(save_dir)

    # 3. optimizer state + progress (the reference's *.other.pth)
    opt_dir = Path(save_dir) / "opt_state"
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(str(opt_dir.absolute()), state.opt_state, force=True)
    with open(Path(save_dir) / "other.json", "w") as f:
        json.dump({"epoch": epoch, "iter": it if it is not None else 0,
                   "step": int(state.step),
                   "train_args": vars(args) if args else None}, f, indent=2,
                  default=str)

    # 4. per-data-shard iterator state (rank-specific-*.pth equivalent)
    if dataset_state is not None:
        with open(Path(save_dir) / f"dataset-shard-{data_shard_rank}.json", "w") as f:
            json.dump(dataset_state, f)
    return save_dir


def resume_stage1(resume_dir: str, template_params, dtype: Optional[str] = None):
    """Load model weights (before any device placement)."""
    return load_checkpoint_list([resume_dir], template_params, dtype=dtype)


def resume_stage2(resume_dir: str, state, data_shard_rank: int = 0):
    """Restore optimizer state + progress into an existing TrainState.

    Returns (state, meta_dict, dataset_state|None).
    """
    import dataclasses

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        str((Path(resume_dir) / "opt_state").absolute()),
        item=state.opt_state)
    meta = json.loads((Path(resume_dir) / "other.json").read_text())
    state = dataclasses.replace(
        state, opt_state=restored, step=jnp.asarray(meta["step"], jnp.int32))
    ds_file = Path(resume_dir) / f"dataset-shard-{data_shard_rank}.json"
    ds_state = json.loads(ds_file.read_text()) if ds_file.exists() else None
    return state, meta, ds_state


def find_latest_checkpoint(output_dir: str) -> Optional[str]:
    """Pick the newest epochN[-iterM] dir (reference auto-resume behavior)."""
    if not os.path.isdir(output_dir):
        return None
    best, key = None, (-1, -1)
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"epoch(\d+)(?:-iter(\d+))?", name)
        if m and (Path(output_dir) / name / "other.json").exists():
            k = (int(m.group(1)), int(m.group(2) or 1 << 60))
            if k > key:
                key, best = k, os.path.join(output_dir, name)
    return best
