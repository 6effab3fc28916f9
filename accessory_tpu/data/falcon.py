"""Pretrain iterable dataset over parquet shards (RefinedWeb / Falcon style).

Reference: accessory/data/falcon.py —
  * file-level sharding ``rank * n_workers + worker :: num_shards`` (:52-62)
  * background-thread prefetch of the next parquet file (:113-143)
  * per-item tokenize + pad/truncate to max_words (:145-162)
  * resume via per-worker {_file_idx, _curr_idx} state dict (:48-50, 98-104)
  * the last file of the corpus is reserved for validation (:21)
"""

from __future__ import annotations

import glob
import os
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np


class Falcon:
    def __init__(self, data_dir: str, max_words: int, tokenizer,
                 rank: int = 0, num_shards: int = 1, split: str = "train"):
        files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
        assert files, f"no parquet files under {data_dir}"
        if split == "train":
            files = files[:-1] if len(files) > 1 else files
        else:  # val: last file only (reference falcon.py:21)
            files = files[-1:]
        # shard files across (rank, worker) slots
        self.files = files[rank::num_shards] if num_shards > 1 else files
        assert self.files, (rank, num_shards, len(files))
        self.max_words = max_words
        self.tokenizer = tokenizer
        self._file_idx = 0
        self._curr_idx = 0
        self._prefetched: Dict[int, List[str]] = {}
        self._prefetch_thread: Optional[threading.Thread] = None

    # -- resume (reference :48-50, 98-104) ---------------------------------

    def state_dict(self) -> Dict[str, int]:
        return {"_file_idx": self._file_idx, "_curr_idx": self._curr_idx}

    def load_state_dict(self, state: Dict[str, int]) -> None:
        self._file_idx = state["_file_idx"]
        self._curr_idx = state["_curr_idx"]

    # -- io ----------------------------------------------------------------

    def _read_file(self, idx: int) -> List[str]:
        import pandas as pd

        df = pd.read_parquet(self.files[idx % len(self.files)], columns=["content"])
        return df["content"].tolist()

    def _get_file(self, idx: int) -> List[str]:
        if idx in self._prefetched:
            return self._prefetched.pop(idx)
        return self._read_file(idx)

    def _start_prefetch(self, idx: int) -> None:
        def work():
            self._prefetched[idx] = self._read_file(idx)

        self._prefetch_thread = threading.Thread(target=work, daemon=True)
        self._prefetch_thread.start()

    # -- iteration ---------------------------------------------------------

    def _encode(self, text: str) -> np.ndarray:
        t = self.tokenizer.encode(text, bos=True, eos=True)
        t = t[: self.max_words]
        pad = self.max_words - len(t)
        if pad:
            t = t + [0] * pad
        return np.asarray(t, np.int32)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            contents = self._get_file(self._file_idx)
            self._start_prefetch(self._file_idx + 1)  # overlap next file read
            while self._curr_idx < len(contents):
                item = contents[self._curr_idx]
                self._curr_idx += 1
                yield self._encode(item)
            if self._prefetch_thread is not None:
                self._prefetch_thread.join()
            self._file_idx += 1
            self._curr_idx = 0


def batched(it: Iterator[np.ndarray], batch_size: int) -> Iterator[np.ndarray]:
    """Stack an item iterator into (batch, max_words) arrays."""
    buf: List[np.ndarray] = []
    for item in it:
        buf.append(item)
        if len(buf) == batch_size:
            yield np.stack(buf)
            buf = []
