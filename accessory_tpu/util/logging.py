"""Training metrics & logging.

Reference: accessory/util/misc.py — SmoothedValue (windowed median/avg,
:149-208), MetricLogger.log_every (iter/data timing + memory, :211-292),
rank-0-only print with timestamps (:46-61).

TPU notes: device memory comes from jax's live-buffer stats instead of
torch.cuda.max_memory_allocated; cross-process metric sync uses
jax.experimental.multihost_utils on multi-host (no-op single-process).
"""

from __future__ import annotations

import builtins
import datetime
import json
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional

import numpy as np


def setup_for_distributed(is_master: bool) -> None:
    """Silence non-master processes; add timestamps (misc.py:46-61)."""
    builtin_print = builtins.print

    def print_fn(*args, **kwargs):
        force = kwargs.pop("force", False)
        if is_master or force:
            now = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
            builtin_print(f"[{now}]", *args, **kwargs)

    builtins.print = print_fn


class SmoothedValue:
    """Track a series and provide windowed median/avg + global avg."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


def _device_mem_gb() -> float:
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / 1024 ** 3
    except Exception:
        pass
    return 0.0


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            if v is None:
                continue
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def add_meter(self, name: str, meter: SmoothedValue) -> None:
        self.meters[name] = meter

    def __str__(self) -> str:
        return self.delimiter.join(f"{n}: {m}" for n, m in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "", start_iter: int = 0,
                  total: Optional[int] = None):
        i = start_iter
        if total is None:
            try:
                total = len(iterable)  # type: ignore[arg-type]
            except TypeError:
                total = None
        start = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        for obj in iterable:
            data_time.update(time.time() - end)
            yield i, obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                if total:
                    eta = iter_time.global_avg * (total - i)
                    eta_str = str(datetime.timedelta(seconds=int(eta)))
                    print(f"{header} [{i}/{total}] eta: {eta_str} {self} "
                          f"time: {iter_time} data: {data_time} "
                          f"mem: {_device_mem_gb():.1f}GB")
                else:
                    print(f"{header} [{i}] {self} time: {iter_time} "
                          f"data: {data_time} mem: {_device_mem_gb():.1f}GB")
            i += 1
            end = time.time()
        elapsed = time.time() - start
        print(f"{header} Total time: {datetime.timedelta(seconds=int(elapsed))}")


def write_log_line(output_dir: str, stats: Dict) -> None:
    """Append a JSON line to log.txt (reference main_finetune.py:351-355)."""
    import os

    with open(os.path.join(output_dir, "log.txt"), "a") as f:
        f.write(json.dumps(stats) + "\n")
