"""Import OmniQuant / GPTQ-format quantized checkpoints.

BASELINE.json requires OmniQuant-style W4A16/W3A16 with *learned* scales and
zeros imported from checkpoints (not RTN). Released OmniQuant weights ship in
the AutoGPTQ tensor layout; this module converts that layout to our
QuantizedWeight:

  GPTQ:  qweight (K/pw, N) int32 — pw=32//bits values per word along K
         qzeros  (K/gs, N/pw) int32 — packed zero points along N
         scales  (K/gs, N) fp16
         dequant w[k,n] = (q[k,n] - (z[g,n] + 1)) * s[g,n]   (classic GPTQ
         +1 zero offset; ``zero_plus_one=False`` for exllama-style exports)

Ours:  packed (K/pw, N) uint32 along K (same order), zeros fp32 UNPACKED.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from accessory_tpu.quant.qtensor import QuantizedWeight


def _unpack_cols(packed: np.ndarray, bits: int) -> np.ndarray:
    """Unpack int32 (G, N/pw) → (G, N) along the last axis."""
    pw = 32 // bits
    mask = (1 << bits) - 1
    shifts = (np.arange(pw, dtype=np.uint32) * bits)[None, None, :]
    vals = (packed.astype(np.uint32)[:, :, None] >> shifts) & mask
    return vals.reshape(packed.shape[0], packed.shape[1] * pw)


def from_gptq(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    bits: int = 4,
    group_size: int = 128,
    act_dtype=jnp.bfloat16,
    zero_plus_one: bool = True,
) -> QuantizedWeight:
    """Convert one GPTQ-layout linear to QuantizedWeight."""
    pw = 32 // bits
    in_dim = qweight.shape[0] * pw
    out_dim = qweight.shape[1]
    zeros = _unpack_cols(np.asarray(qzeros), bits).astype(np.float32)
    if zero_plus_one:
        zeros = zeros + 1.0
    assert zeros.shape == (in_dim // group_size, out_dim), zeros.shape
    return QuantizedWeight(
        packed=jnp.asarray(np.asarray(qweight).view(np.uint32)),
        scales=jnp.asarray(np.asarray(scales, np.float32)),
        zeros=jnp.asarray(zeros),
        bits=bits,
        group_size=group_size,
        in_dim=in_dim,
        out_dim=out_dim,
        act_dtype=jnp.dtype(act_dtype),
    )


def _rope_unpermute_cols(n_heads: int, out_dim: int) -> np.ndarray:
    """Column permutation taking HF half-split rotary layout to our
    interleaved layout (same mapping as convert_weights_to_hf._unpermute_rope
    but expressed as an index array over the out axis).

    Interleaved position (h, 2i+p) reads HF position (h, p*hd/2 + i).
    """
    hd = out_dim // n_heads
    i = np.arange(hd // 2)
    per_head = np.empty(hd, np.int64)
    per_head[2 * i] = i
    per_head[2 * i + 1] = hd // 2 + i
    return (np.arange(n_heads)[:, None] * hd + per_head[None, :]).reshape(-1)


def unpermute_rope_qw(qw: QuantizedWeight, n_heads: int) -> QuantizedWeight:
    """Undo the HF half-split rotary row permutation on a GPTQ-imported
    q/k projection. HF AutoGPTQ checkpoints quantize HF-layout weights
    (rows permuted for half-split RoPE); our models default to
    rope_style='interleaved' (config.py), so the out (N) axis of
    packed/scales/zeros must be column-reordered — a pure reorder, exact."""
    perm = _rope_unpermute_cols(n_heads, qw.out_dim)
    return QuantizedWeight(
        packed=qw.packed[:, perm], scales=qw.scales[:, perm],
        zeros=qw.zeros[:, perm], bits=qw.bits, group_size=qw.group_size,
        in_dim=qw.in_dim, out_dim=qw.out_dim, act_dtype=qw.act_dtype,
        layout=qw.layout, tile_k=qw.tile_k)


# HF-GPTQ module name → our flat param path (llama family)
_HF_TO_OURS = {
    "self_attn.q_proj": "layers/attention/wq/weight",
    "self_attn.k_proj": "layers/attention/wk/weight",
    "self_attn.v_proj": "layers/attention/wv/weight",
    "self_attn.o_proj": "layers/attention/wo/weight",
    "mlp.gate_proj": "layers/feed_forward/w1/weight",
    "mlp.down_proj": "layers/feed_forward/w2/weight",
    "mlp.up_proj": "layers/feed_forward/w3/weight",
}


def load_gptq_dir(path: str, bits: int = 4, group_size: int = 128,
                  act_dtype=jnp.bfloat16, n_heads: Optional[int] = None,
                  n_kv_heads: Optional[int] = None,
                  rope_style: str = "interleaved",
                  ) -> Dict[str, Dict[int, QuantizedWeight]]:
    """Read a HF AutoGPTQ safetensors dir → {our_path: {layer_idx: QW}}.

    With ``rope_style='interleaved'`` (our models' default) the HF
    half-split rotary permutation on q_proj/k_proj is undone column-wise
    (``unpermute_rope_qw``) — ``n_heads`` (and ``n_kv_heads`` for GQA) are
    then required. Pass ``rope_style='half'`` only if the target model is
    configured with half-split RoPE.

    The caller stacks per-layer QWs onto the leading layer axis (see
    ``install_gptq_weights``)."""
    import glob
    import re

    from safetensors.numpy import load_file

    tensors: Dict[str, np.ndarray] = {}
    for f in sorted(glob.glob(f"{path}/*.safetensors")):
        tensors.update(load_file(f))

    if rope_style == "interleaved" and n_heads is None:
        raise ValueError(
            "load_gptq_dir: n_heads is required to undo the HF rotary "
            "permutation for rope_style='interleaved' (pass rope_style="
            "'half' only if the model uses half-split RoPE)")

    out: Dict[str, Dict[int, QuantizedWeight]] = {}
    pat = re.compile(r"model\.layers\.(\d+)\.(.+)\.qweight")
    for name, qw in tensors.items():
        m = pat.fullmatch(name)
        if not m:
            continue
        idx, mod = int(m.group(1)), m.group(2)
        ours = _HF_TO_OURS.get(mod)
        if ours is None:
            continue
        base = f"model.layers.{idx}.{mod}"
        imported = from_gptq(
            qw, tensors[base + ".qzeros"], tensors[base + ".scales"],
            bits=bits, group_size=group_size, act_dtype=act_dtype)
        if rope_style == "interleaved":
            if mod == "self_attn.q_proj":
                imported = unpermute_rope_qw(imported, n_heads)
            elif mod == "self_attn.k_proj":
                imported = unpermute_rope_qw(imported, n_kv_heads or n_heads)
        out.setdefault(ours, {})[idx] = imported
    return out


def install_gptq_weights(params, gptq: Dict[str, Dict[int, QuantizedWeight]]):
    """Replace dense stacked weights in a llama params pytree with stacked
    QuantizedWeights imported from GPTQ."""
    import jax

    for path, per_layer in gptq.items():
        idxs = sorted(per_layer)
        qws = [per_layer[i] for i in idxs]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qws)
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = stacked
    return params
