"""Extract / apply weight deltas between checkpoints.

Reference: accessory/tools/weight_operate.py:17-30+ — delta = finetuned -
base (fp32 math, fp16 storage); apply = base + delta. Used to distribute
finetunes as diff checkpoints (tensor_parallel.py:387-422 load semantics).

Operates on our native safetensors checkpoint dirs; keys absent from the
base are kept verbatim (new PEFT params).

Usage:
  python -m accessory_tpu.tools.weight_operate --operate_type extract \
      --pretrained_path base/ --delta_path finetuned/ --output_path delta/
  python -m accessory_tpu.tools.weight_operate --operate_type apply \
      --pretrained_path base/ --delta_path delta/ --output_path merged/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("weight delta extract/apply", add_help=False)
    p.add_argument("--pretrained_path", required=True, type=str)
    p.add_argument("--delta_path", required=True, type=str)
    p.add_argument("--output_path", default="./output", type=str)
    p.add_argument("--operate_type", default="apply", choices=["extract", "apply"])
    return p


def _load_flat(path):
    from accessory_tpu.checkpoint.native import QUANT_FILE, _read_flat
    import json
    from pathlib import Path

    flat = _read_flat(path)
    qf = Path(path) / QUANT_FILE
    quant = json.loads(qf.read_text()) if qf.exists() else {}
    return flat, quant


def _save_flat(path, flat, quant):
    import json
    import os
    from pathlib import Path

    from safetensors.numpy import save_file

    from accessory_tpu.checkpoint.native import QUANT_FILE, WEIGHTS_FILE

    os.makedirs(path, exist_ok=True)
    import jax.numpy as jnp

    tensors = {}
    for k, v in flat.items():
        arr = np.asarray(v)
        if arr.dtype == jnp.bfloat16:
            tensors[k + "@bf16"] = arr.view(np.uint16)
        else:
            tensors[k] = arr
    save_file(tensors, str(Path(path) / WEIGHTS_FILE))
    with open(Path(path) / QUANT_FILE, "w") as f:
        json.dump(quant, f, indent=2)


def extract_delta(base_path: str, finetuned_path: str, out_path: str) -> None:
    base, _ = _load_flat(base_path)
    tuned, quant = _load_flat(finetuned_path)
    delta = {}
    for k, v in tuned.items():
        vf = np.asarray(v, np.float32)
        if k in base and "#" not in k:
            delta[k] = (vf - np.asarray(base[k], np.float32)).astype(np.float16)
        else:
            delta[k] = np.asarray(v)  # new params (PEFT) ship whole
    _save_flat(out_path, delta, quant)
    # mark as diff so loaders apply add semantics
    with open(os.path.join(out_path, "DIFF"), "w") as f:
        f.write("delta checkpoint: load with apply/add semantics\n")


def apply_delta(base_path: str, delta_path: str, out_path: str) -> None:
    base, quant = _load_flat(base_path)
    delta, dquant = _load_flat(delta_path)
    merged = dict(base)
    for k, v in delta.items():
        if k in base and "#" not in k:
            bf = np.asarray(base[k], np.float32)
            merged[k] = (bf + np.asarray(v, np.float32)).astype(
                np.asarray(base[k]).dtype)
        else:
            merged[k] = np.asarray(v)
    quant.update(dquant)
    _save_flat(out_path, merged, quant)


def main(args) -> None:
    if args.operate_type == "extract":
        extract_delta(args.pretrained_path, args.delta_path, args.output_path)
    else:
        apply_delta(args.pretrained_path, args.delta_path, args.output_path)


if __name__ == "__main__":
    main(get_args_parser().parse_args())
