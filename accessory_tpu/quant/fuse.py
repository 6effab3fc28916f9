"""Decode-time weight fusion: QKV and gate/up merged into single matmuls.

At decode (m = batch) every matmul is HBM-bound and pays a fixed kernel
dispatch + tile-scheduling cost. The k/v projections of a GQA model are
skinny (out_dim = n_kv_heads * head_dim, e.g. 256 at TinyLlama scale) —
far below the fused W4 kernel's preferred 512-lane output tiles. Fusing
wq|wk|wv and w1|w3 along the *output* axis turns 5 kernel launches per
layer into 2 with full-width tiles, identical math.

This is a pure parameter-tree transform (applied after load/quantize, before
the decode loop): the output axis of both the packed nibbles and the
scales/zeros is plain data lanes for every layout ("std" planes-packing and
the int8-staged "planes" layout both pack along K), so fusion is a
concatenation. Models branch on the presence of the fused keys, which is
static under jit.

Reference role: the reference keeps separate ColumnParallelLinear wq/wk/wv
(accessory/model/LLM/llama.py:120-150); fusion is a TPU-side optimization
with no checkpoint-format impact (checkpoints always store unfused).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from accessory_tpu.quant.qtensor import QuantizedWeight


def _concat_weights(mods, axis=-1):
    """Concatenate linear-module weights along the output axis. All must be
    the same representation: either plain arrays or QuantizedWeight with
    identical (bits, group_size, in_dim, layout, tile_k)."""
    ws = [m["weight"] for m in mods]
    if all(isinstance(w, QuantizedWeight) for w in ws):
        w0 = ws[0]
        for w in ws[1:]:
            if (w.bits, w.group_size, w.in_dim, w.layout, w.tile_k) != (
                    w0.bits, w0.group_size, w0.in_dim, w0.layout, w0.tile_k):
                return None
        return QuantizedWeight(
            packed=jnp.concatenate([w.packed for w in ws], axis=-1),
            scales=jnp.concatenate([w.scales for w in ws], axis=-1),
            zeros=jnp.concatenate([w.zeros for w in ws], axis=-1),
            bits=w0.bits, group_size=w0.group_size, in_dim=w0.in_dim,
            out_dim=sum(w.out_dim for w in ws), act_dtype=w0.act_dtype,
            layout=w0.layout, tile_k=w0.tile_k)
    if any(isinstance(w, QuantizedWeight) for w in ws):
        return None  # mixed representations: leave unfused
    if len({w.shape[:-1] for w in ws}) != 1:
        return None
    return jnp.concatenate(ws, axis=-1)


def _fusible(mods) -> bool:
    # LoRA / bias modules keep their own per-projection adapters — skip
    return all(set(m.keys()) == {"weight"} for m in mods)


def fuse_for_decode(params: Dict[str, Any]) -> Dict[str, Any]:
    """Return a params tree with per-layer wqkv / w13 fused weights.

    Leaves the tree unchanged where fusion does not apply (PEFT adapters,
    mixed quantization, MoE feed-forwards). Safe to call on any LLaMA-family
    params dict; models consume the fused keys when present.
    """
    layers = params.get("layers")
    if not isinstance(layers, dict) or "attention" not in layers:
        return params
    out = dict(params)
    layers = dict(layers)
    att = dict(layers["attention"])
    if all(k in att for k in ("wq", "wk", "wv")) and _fusible(
            [att["wq"], att["wk"], att["wv"]]):
        fused = _concat_weights([att["wq"], att["wk"], att["wv"]])
        if fused is not None:
            att["wqkv"] = {"weight": fused}
            del att["wq"], att["wk"], att["wv"]
    layers["attention"] = att
    ff = layers.get("feed_forward")
    if isinstance(ff, dict) and all(k in ff for k in ("w1", "w3")) and \
            _fusible([ff["w1"], ff["w3"]]):
        fused = _concat_weights([ff["w1"], ff["w3"]])
        if fused is not None:
            ff = dict(ff)
            ff["w13"] = {"weight": fused}
            del ff["w1"], ff["w3"]
            layers["feed_forward"] = ff
    out["layers"] = layers
    import os

    # width-aware k-tile retiling (r4): with the FINAL call widths known
    # (post-fusion), single-k-tile weights whose output tiles stay >=1024
    # lanes repack to TWO k-tiles so the bdiag dequant's dot latency
    # hides behind the second tile's DMA (chip A/B: w13 647->726 GB/s,
    # wo 741->789; wqkv keeps tk 2048 — its fused width 2560 pads to
    # 512-lane tiles, where halving loses)
    if os.environ.get("ACCESSORY_RETILE", "1") == "1":
        out = retile_for_decode(out)
    # Default "auto" (r5): apply ONLY in the 7B-class regime — attention
    # norm can NOT fold (in_dim > tile_k) AND in_dim <= 4096. Chip A/Bs:
    #   dim 2048 (TinyLlama, norms fold):   prep -2.7% (r4) — the tiny
    #     ops' S(1) outputs double as MSA prefetches for the fused-norm
    #     kernels' operands
    #   dim 4096 (7B): prep +5.5% (int8 714 -> 753 tok/s, busy
    #     11.13 -> 10.51 ms) — no norm folds, the per-step converts/pads
    #     are pure launch bloat
    #   dim 8192 (70B): prep -25% (146.5 -> 110 tok/s, 3 runs each) —
    #     the 4x-bigger scale arrays lean on the S(1) staging the tiny
    #     ops provide
    # "1"/"0" force.
    prep_env = os.environ.get("ACCESSORY_KERNEL_PREP", "auto")
    if prep_env == "1":
        out = kernel_prep(out)
    elif prep_env == "auto":
        wqkv = out["layers"].get("attention", {}).get("wqkv", {})
        w = wqkv.get("weight") if isinstance(wqkv, dict) else None
        if (isinstance(w, QuantizedWeight) and w.in_dim != w.tile_k
                and w.in_dim <= 4096):
            out = kernel_prep(out)
    return out


def _replan_tiles_np(packed, in_dim: int, tk_old: int, tk_new: int):
    """Numpy re-tiling of planes-packed words: recover the per-row
    nibbles from the tk_old tile order, re-emit in tk_new order (both
    halves of the round trip share quant_matmul_planes'
    pack/unpack_tile_words — single source of the tile layout)."""
    from accessory_tpu.ops.quant_matmul_planes import (pack_tile_words,
                                                       unpack_tile_words)

    return pack_tile_words(unpack_tile_words(packed, in_dim, tk_old),
                           tk_new)


def retile_for_decode(params: Dict[str, Any]) -> Dict[str, Any]:
    """Repack planes-layout weights to the decode-optimal k-tile for
    their (post-fusion) call width. One-time host-side numpy; scales and
    zeros are tile-independent (group structure unchanged)."""
    import dataclasses

    import numpy as np

    from accessory_tpu.ops.quant_matmul_planes import choose_tile_k

    def visit(x):
        if not (isinstance(x, QuantizedWeight) and x.layout == "planes"):
            return x
        want = choose_tile_k(x.in_dim, x.group_size, out_dim=x.out_dim)
        if want == x.tile_k:
            return x
        if x.packed.ndim == 3:  # stacked layers: retile each slice
            repacked = np.stack([
                _replan_tiles_np(x.packed[i], x.in_dim, x.tile_k, want)
                for i in range(x.packed.shape[0])])
        else:
            repacked = _replan_tiles_np(x.packed, x.in_dim, x.tile_k, want)
        return dataclasses.replace(x, packed=jnp.asarray(
            repacked.astype(np.uint32)), tile_k=want)

    import jax

    return jax.tree.map(visit, params,
                        is_leaf=lambda x: isinstance(x, QuantizedWeight))


def _align_scale_rows(qw: QuantizedWeight) -> QuantizedWeight:
    """Pad planes/w8 scale+zeros rows up to the kernels' sublane alignment
    (8 rows f32, 16 rows for 16-bit storage). planes_qmm/w8_qmm otherwise
    emit two pad KERNELS per call per step (w2's K=5632/g128 → 44 rows);
    padded rows are never read (the kernels roll-and-slice the real
    groups), and dequant consumers slice back to in_dim // group_size."""
    import dataclasses

    if qw.layout not in ("planes", "w8"):
        return qw
    rows = qw.in_dim // qw.group_size
    if qw.scales.shape[-2] != rows:
        return qw  # already padded
    align = 8 if jnp.dtype(qw.scales.dtype).itemsize == 4 else 16
    pad = (-rows) % align
    if not pad:
        return qw
    widths = [(0, 0)] * (qw.scales.ndim - 2) + [(0, pad), (0, 0)]
    return dataclasses.replace(qw, scales=jnp.pad(qw.scales, widths),
                               zeros=jnp.pad(qw.zeros, widths))


_NORM_KEYS = ("attention_norm", "ffn_norm", "norm", "input_layernorm",
              "post_attention_layernorm", "layernorm", "rmsnorm")


def kernel_prep(params: Dict[str, Any]) -> Dict[str, Any]:
    """One-time decode-tree prep that removes per-step launch bloat.

    The decode step is kernel-launch-bound (BENCHMARKS.md round 2-3); an
    HLO audit of the round-3 headline step counted 46 ``pad`` and 45
    ``convert`` kernels per step — all of them re-doing, every step, work
    that depends only on the weights:
      * scale/zeros rows of planes/w8 quantized weights padded to the
        sublane tile (see _align_scale_rows),
      * norm vectors upcast to f32 for the fused-norm kernel operand
        (planes_qmm norm_weight.astype(f32) — a real convert kernel when
        the norm is stored bf16, since custom-call operands cannot fuse).
    Applying both here turns them into no-ops at trace time. Pure tree
    transform; math unchanged (rms_norm/layer_norm upcast to f32 anyway).
    """
    def walk(node, name=""):
        if isinstance(node, QuantizedWeight):
            return _align_scale_rows(node)
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (any(k == nk or k.endswith("_" + nk) for nk in _NORM_KEYS)
                        and isinstance(v, dict)):
                    v = {kk: (vv.astype(jnp.float32)
                              if kk in ("weight", "bias")
                              and hasattr(vv, "dtype")
                              and jnp.issubdtype(vv.dtype, jnp.floating)
                              else vv)
                         for kk, vv in v.items()}
                out[k] = walk(v, k)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, name) for v in node)
        return node

    return walk(params)
