"""Offline token packing for pretraining.

Reference: accessory/tools/generate_packed_data.py:14-71 — tokenize parquet
"content" rows, concatenate with BOS/EOS, slice into fixed-length sequences,
pickle one list per source file.
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
from pathlib import Path


def get_args_parser():
    p = argparse.ArgumentParser("pack pretraining data", add_help=False)
    p.add_argument("--data_dir", required=True, type=str)
    p.add_argument("--out_dir", required=True, type=str)
    p.add_argument("--tokenizer_path", required=True, type=str)
    p.add_argument("--max_words", default=2048, type=int)
    return p


def pack_file(path: str, out_path: str, tokenizer, max_words: int) -> int:
    import numpy as np
    import pandas as pd

    from accessory_tpu import native

    df = pd.read_parquet(path, columns=["content"])
    stream = []
    for text in df["content"]:
        stream.extend(tokenizer.encode(text, bos=True, eos=True))
    # C fast path (native/packing.cc) with numpy fallback
    arr = native.pack_stream(np.asarray(stream, np.int32), max_words)
    packed = [row.tolist() for row in arr]
    with open(out_path, "wb") as f:
        pickle.dump(packed, f)
    return len(packed)


def main(args) -> None:
    from accessory_tpu.tokenizer import Tokenizer

    tok = Tokenizer(args.tokenizer_path)
    os.makedirs(args.out_dir, exist_ok=True)
    files = sorted(glob.glob(os.path.join(args.data_dir, "*.parquet")))
    for f in files:
        out = os.path.join(args.out_dir, Path(f).stem + ".pkl")
        n = pack_file(f, out, tok, args.max_words)
        print(f"{f} -> {out}: {n} sequences")


if __name__ == "__main__":
    main(get_args_parser().parse_args())
