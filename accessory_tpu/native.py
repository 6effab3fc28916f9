"""ctypes bindings for the native host library (native/packing.cc).

Compiled lazily with g++ on first use (cached next to the source); every
entry point has a numpy fallback so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "packing.cc"
_SO = _SRC.parent / "libaccessory_native.so"
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.pack_stream.restype = ctypes.c_long
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def pack_stream(tokens: np.ndarray, max_words: int) -> np.ndarray:
    """Slice a 1-D int32 token stream into (n_seqs, max_words)."""
    tokens = np.ascontiguousarray(tokens, np.int32)
    n_seqs = len(tokens) // max_words
    lib = _load()
    if lib is None:
        return tokens[: n_seqs * max_words].reshape(n_seqs, max_words).copy()
    out = np.empty((n_seqs, max_words), np.int32)
    lib.pack_stream(_ptr(tokens, ctypes.c_int32), len(tokens), max_words,
                    _ptr(out, ctypes.c_int32))
    return out


def pad_batch(items: List[np.ndarray], max_words: int, pad_id: int = 0) -> np.ndarray:
    """Assemble variable-length int32 sequences into a padded batch."""
    lib = _load()
    if lib is None:
        out = np.full((len(items), max_words), pad_id, np.int32)
        for i, it in enumerate(items):
            n = min(len(it), max_words)
            out[i, :n] = it[:n]
        return out
    flat = np.concatenate([np.ascontiguousarray(i, np.int32) for i in items]) \
        if items else np.empty((0,), np.int32)
    offsets = np.zeros(len(items) + 1, np.int64)
    np.cumsum([len(i) for i in items], out=offsets[1:])
    out = np.empty((len(items), max_words), np.int32)
    lib.pad_batch(_ptr(flat, ctypes.c_int32), _ptr(offsets, ctypes.c_long),
                  len(items), max_words, pad_id, _ptr(out, ctypes.c_int32))
    return out


def pack_u4(q: np.ndarray) -> np.ndarray:
    """(k, n) int32 in [0,16) → (k//8, n) uint32 nibble-packed along k."""
    q = np.ascontiguousarray(q, np.int32)
    k, n = q.shape
    assert k % 8 == 0, k
    lib = _load()
    if lib is None:
        qq = q.astype(np.uint32).reshape(k // 8, 8, n)
        shifts = (np.arange(8, dtype=np.uint32) * 4)[None, :, None]
        return np.bitwise_or.reduce(qq << shifts, axis=1).astype(np.uint32)
    out = np.empty((k // 8, n), np.uint32)
    lib.pack_u4(_ptr(q, ctypes.c_int32), k, n, _ptr(out, ctypes.c_uint32))
    return out


def unpack_u4(packed: np.ndarray, k: int) -> np.ndarray:
    packed = np.ascontiguousarray(packed, np.uint32)
    n = packed.shape[1]
    lib = _load()
    if lib is None:
        shifts = (np.arange(8, dtype=np.uint32) * 4)[None, :, None]
        vals = (packed[:, None, :] >> shifts) & np.uint32(0xF)
        return vals.reshape(-1, n)[:k].astype(np.int32)
    out = np.empty((packed.shape[0] * 8, n), np.int32)
    lib.unpack_u4(_ptr(packed, ctypes.c_uint32), packed.shape[0] * 8, n,
                  _ptr(out, ctypes.c_int32))
    return out[:k]


def available() -> bool:
    return _load() is not None
