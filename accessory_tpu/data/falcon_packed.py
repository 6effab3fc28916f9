"""Pretrain iterable over pre-tokenized packed shards.

Reference: accessory/data/falcon_packed.py:17-35, 147-159 — same skeleton as
falcon.py but items are fixed-length token lists produced offline by
tools/generate_packed_data.py (no per-item tokenization in the hot loop).
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Iterator, List

import numpy as np

from accessory_tpu.data.falcon import Falcon


class FalconPacked(Falcon):
    def __init__(self, data_dir: str, rank: int = 0, num_shards: int = 1,
                 split: str = "train"):
        files = sorted(glob.glob(os.path.join(data_dir, "*.pkl")))
        assert files, f"no packed .pkl files under {data_dir}"
        if split == "train":
            files = files[:-1] if len(files) > 1 else files
        else:
            files = files[-1:]
        self.files = files[rank::num_shards] if num_shards > 1 else files
        assert self.files
        self.max_words = None
        self.tokenizer = None
        self._file_idx = 0
        self._curr_idx = 0
        self._prefetched = {}
        self._prefetch_thread = None

    def _read_file(self, idx: int) -> List[List[int]]:
        with open(self.files[idx % len(self.files)], "rb") as f:
            return pickle.load(f)

    def _encode(self, item) -> np.ndarray:  # items are already token lists
        return np.asarray(item, np.int32)
