"""Finetune dataset + grouped distributed sampler.

Reference: accessory/data/alpaca.py —
  * YAML META config of {path, type, preprocess, prompt_type} (:24-111)
  * per-type grouping + length sort for efficient batching (:113-124)
  * optional h5 on-disk annotation cache built once (:130-149)
  * labels mask out the prompt; 0-padding; image budget (:181-199)
  * FinetuneDistSampler: every global batch drawn from ONE dataset type,
    resumable via set_epoch(epoch, start_iter) (:246-328)

Differences: outputs numpy (not torch); "distributed" rank/world here means
data-parallel shards of the GSPMD mesh (process index on multi-host), not
NCCL ranks.
"""

from __future__ import annotations

import copy
import json
import os
import random
import warnings
from pathlib import Path
from time import sleep
from typing import Dict, Iterator, List, Optional

import numpy as np
import yaml

from accessory_tpu.data.system_prompt import format_prompt


class MetaPreprocessor:
    """Annotation-format adapters (reference alpaca.py:212-244)."""

    def preprocess(self, meta_l: List[Dict], recipe: str) -> List[Dict]:
        return getattr(self, f"_{recipe}")(meta_l)

    @staticmethod
    def _single_turn_llava(meta_l):
        return [{
            "image": d["image"],
            "instruction": d["conversations"][0]["value"],
            "output": d["conversations"][1]["value"],
        } for d in meta_l]

    @staticmethod
    def _caption(meta_l):
        out = []
        for d in meta_l:
            cap = d["caption"]
            if isinstance(cap, list):
                cap = random.choice(cap)
            out.append({"image": d["url"], "output": cap})
        return out


def _read_meta_file(meta_path: str) -> List[Dict]:
    ext = os.path.splitext(meta_path)[-1]
    if ext == ".json":
        with open(meta_path) as f:
            return json.load(f)
    if ext == ".jsonl":
        out = []
        with open(meta_path) as f:
            for line in f:
                out.append(json.loads(line))
        return out
    if ext == ".csv":
        import pandas as pd

        return pd.read_csv(meta_path, sep="\t", engine="pyarrow").to_dict(
            orient="records")
    raise NotImplementedError(f"unknown meta extension {ext}")


class FinetuneDataset:
    def __init__(self, config_path: str, transform=None, max_words: int = 30,
                 image_words: int = 257, tokenizer=None,
                 cache_on_disk: bool = False, rank: int = 0):
        with open(config_path) as f:
            self.config = yaml.load(f, Loader=yaml.FullLoader)

        self.cache_on_disk = cache_on_disk
        self.cache_dir = None
        if cache_on_disk:
            ident = config_path
            for ch in ["/", "\\", ".", "?", "!"]:
                ident = ident.replace(ch, "-")
            self.cache_dir = f"./accessory_data_cache/{ident}"
            if rank == 0:
                Path(self.cache_dir).mkdir(parents=True, exist_ok=True)

        need_collect = (not cache_on_disk) or (
            rank == 0 and not ((Path(self.cache_dir) / "data.h5").exists()
                               and (Path(self.cache_dir) / "ready").exists()))

        if need_collect:
            group_ann: Dict[str, List[Dict]] = {}
            for meta in self.config["META"]:
                meta_l = _read_meta_file(meta["path"])
                if meta.get("preprocess"):
                    meta_l = MetaPreprocessor().preprocess(meta_l, meta["preprocess"])
                prompt_type = meta.get("prompt_type", "alpaca")
                for item in meta_l:
                    item["sys_prompt"] = prompt_type
                group_ann.setdefault(meta["type"], []).extend(meta_l)

            # length sort within type → batches of similar length (:113-124);
            # dialog items (no instruction/output keys) sort by total text
            def sort_key(d):
                try:
                    return len(format_prompt(d, d["sys_prompt"]) + d["output"])
                except KeyError:
                    return sum(len(s.get("value", ""))
                               for s in d.get("conversations", []))

            for meta_l in group_ann.values():
                meta_l.sort(key=sort_key)

            ann = sum(group_ann.values(), start=[])
            ranges, start = {}, 0
            for t, meta_l in group_ann.items():
                ranges[t] = [start, start + len(meta_l)]
                start += len(meta_l)

            if not cache_on_disk:
                self.ann = ann
                self.group_indices = {k: list(range(v[0], v[1]))
                                      for k, v in ranges.items()}
            else:
                import h5py

                serialized = [json.dumps(a) for a in ann]
                with h5py.File(Path(self.cache_dir) / "data.h5", "w") as f:
                    dt = h5py.vlen_dtype(str)
                    ds = f.create_dataset("ann", (len(serialized),), dtype=dt)
                    ds[:] = serialized
                    f.create_dataset("group_indice_range", data=json.dumps(ranges))
                (Path(self.cache_dir) / "ready").write_text("ready")

        if cache_on_disk:
            import h5py

            while not (Path(self.cache_dir) / "ready").exists():
                assert rank != 0
                sleep(1)
            cache_file = h5py.File(Path(self.cache_dir) / "data.h5", "r")
            self.ann = cache_file["ann"]
            ranges = json.loads(cache_file["group_indice_range"].asstr()[()])
            self.group_indices = {k: list(range(v[0], v[1]))
                                  for k, v in ranges.items()}

        self.transform = transform
        self.max_words = max_words
        self.image_words = image_words
        self.tokenizer = tokenizer

    def __len__(self) -> int:
        return len(self.ann)

    def __getitem__(self, index: int):
        item = self.ann[index]
        if self.cache_on_disk:
            item = json.loads(item)

        image = item.get("image")
        if image is not None:
            from PIL import Image

            image = Image.open(image).convert("RGB")
            image = self.transform(image) if self.transform else np.asarray(image)

        answer = item["output"]
        prompt = format_prompt(item, item["sys_prompt"])
        t_prompt = self.tokenizer.encode(prompt, bos=True, eos=False)
        t_full = self.tokenizer.encode(prompt + answer, bos=True, eos=True)

        max_words = self.max_words - (self.image_words if image is not None else 0)
        tokens = np.array(t_full, np.int32)
        if len(tokens) > max_words:
            warnings.warn(f"truncating overlong input ({len(tokens)} > {max_words})")
            tokens = tokens[:max_words]
        pad = max_words - len(tokens)
        tokens = np.concatenate([tokens, np.full(pad, -1, np.int32)])

        labels = tokens.copy()
        labels[: len(t_prompt)] = -1  # mask the prompt (reference :192-199)
        tokens_mask = tokens >= 0
        labels_mask = labels >= 0
        tokens = np.where(tokens_mask, tokens, 0)
        labels = np.where(labels_mask, labels, 0)
        if image is None:
            return tokens, labels, tokens_mask.astype(np.float32)
        return tokens, labels, tokens_mask.astype(np.float32), image

    def groups(self) -> List[List[int]]:
        return list(self.group_indices.values())


class FinetuneDistSampler:
    """Distributed grouped sampler: every global batch comes from a single
    dataset type; supports resume at (epoch, start_iter).

    Reference: accessory/data/alpaca.py:246-328.
    """

    def __init__(self, dataset: FinetuneDataset, num_replicas: int, rank: int,
                 shuffle: bool = True, seed: int = 0, batch_size: int = None,
                 acc_grad: int = 1):
        assert batch_size is not None
        assert 0 <= rank < num_replicas
        self.dataset = dataset
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.batch_size = batch_size
        self.acc_grad = acc_grad
        self.epoch = 0
        self.start_iter = 0

        global_bsz = batch_size * num_replicas * acc_grad
        self.group_len = {}
        groups = dataset.groups()
        total = 0
        for i, g in enumerate(groups):
            trimmed = len(g) // global_bsz * global_bsz
            self.group_len[i] = trimmed
            total += trimmed
        self.total_size = total
        self.num_samples = total // num_replicas

    def __len__(self) -> int:
        return self.num_samples

    def __iter__(self) -> Iterator[int]:
        global_bsz = self.batch_size * self.num_replicas * self.acc_grad
        rng = random.Random(self.seed + self.epoch)
        groups = self.dataset.groups()

        global_batches: List[List[int]] = []
        for gi, g in enumerate(groups):
            g = list(g)
            if self.shuffle:
                rng.shuffle(g)
            g = g[: self.group_len[gi]]
            for i in range(0, len(g), global_bsz):
                global_batches.append(g[i: i + global_bsz])
        if self.shuffle:
            rng.shuffle(global_batches)

        indices: List[int] = []
        own = self.batch_size * self.acc_grad
        for gb in global_batches:
            start = self.rank * own
            indices.extend(gb[start: start + own])
        assert len(indices) == self.num_samples

        # resume: skip consumed iterations (reference set_epoch(epoch, start_iter))
        skip = self.start_iter * self.batch_size * self.acc_grad
        return iter(indices[skip:])

    def set_epoch(self, epoch: int, start_iter: int = 0) -> None:
        self.epoch = epoch
        self.start_iter = start_iter
