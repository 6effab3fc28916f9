"""Import PyTorch reference checkpoints → accessory_tpu params pytrees.

Reference subsystem: accessory/util/tensor_parallel.py —
  * filename-format regexes + mp-size inference (:40-45, :333-384)
  * TP shard dim table Column:0 / Row:1 / Embedding:1 (:34-38)
  * merge across mp shards (:83-130); fused-MoE merge hooks
    (mixtral_sparse.py:210-219: view (E, h/mp, d) → cat dim1)
  * diff checkpoints add deltas (:387-422)

We always merge to FULL (unsharded) weights — GSPMD re-shards on device_put,
so the reference's "reshard to current mp size" machinery is unnecessary.

Layout conversion: torch nn.Linear stores (out, in); our matmul layout is
(in, out) → transpose. Per-layer weights are stacked on a leading layer axis
for the lax.scan decoder.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

FORMAT_FILENAME_PATTERNS = {
    "meta_ori": re.compile(r"^consolidated\.(\d{2})\.pth$"),
    "consolidated": re.compile(r"^consolidated\.(\d{2})-of-(\d{2})\.model\.pth$"),
    "consolidated_diff": re.compile(
        r"^consolidated\.(\d{2})-of-(\d{2})\.model-diff\.pth$"),
}

# suffix → merge behavior in TORCH orientation (out, in):
#   col  = ColumnParallelLinear weight: cat shards on dim 0 (out)
#   row  = RowParallelLinear weight: cat on dim 1 (in); bias replicated
#   embed= ParallelEmbedding weight: cat on dim 1 (embedding dim)
#   rep  = replicated (norms etc.): take shard 0
_COL_W = (".wq.weight", ".wk.weight", ".wv.weight", ".w1.weight", ".w3.weight",
          "output.weight", ".Wqkv.weight", ".dense_h_to_4h.weight",
          ".lora_b.weight")
_ROW_W = (".wo.weight", ".w2.weight", ".dense.weight", ".out_proj.weight",
          ".dense_4h_to_h.weight", ".lora_a.weight")
_COL_B = (".wq.bias", ".wk.bias", ".wv.bias", ".w1.bias", ".w3.bias",
          ".Wqkv.bias", ".dense_h_to_4h.bias")
_EMBED_W = ("tok_embeddings.weight", "word_embeddings.weight")


def _merge_rule(name: str, llama_type: str) -> Tuple[str, int]:
    """Return ("cat", dim) / ("rep", 0) / ("moe_fused", 0) for a param name."""
    if llama_type.startswith("mixtral_sparse") and re.search(
            r"feed_forward\.w[123]$|feed_forward\.w[123]\.weight$|\.moe\.w[123]$", name):
        return ("moe_fused", 0)
    if llama_type.startswith("mixtral") and ".experts." in name:
        # whole experts are distributed, not sharded: union by name
        return ("rep", 0)
    if name.endswith(_EMBED_W):
        return ("cat", 1)
    if name.endswith(_COL_W) or name.endswith(_COL_B):
        return ("cat", 0)
    if name.endswith(_ROW_W):
        return ("cat", 1)
    return ("rep", 0)


def infer_checkpoint_format_and_mp_size(path: str) -> Tuple[str, int]:
    """Reference: tensor_parallel.py:333-384."""
    files = [f.name for f in Path(path).iterdir() if f.is_file()]
    for fmt, pat in FORMAT_FILENAME_PATTERNS.items():
        matches = [pat.match(f) for f in files]
        matches = [m for m in matches if m]
        if matches:
            if fmt == "meta_ori":
                mp = len(matches)
            else:
                mp = int(matches[0].group(2))
                assert len(matches) == mp, \
                    f"expect {mp} shards, found {len(matches)} in {path}"
            return fmt, mp
    raise FileNotFoundError(f"no recognized checkpoint files under {path}")


def _to_numpy(t) -> np.ndarray:
    import torch

    if t.dtype == torch.bfloat16:
        # exact: bf16 → fp32 is lossless; jnp casts back on load
        return t.to(torch.float32).numpy()
    return t.numpy()


def load_torch_checkpoint(path: str, llama_type: str = "llama") -> Dict[str, np.ndarray]:
    """Load all shards of a reference checkpoint dir and merge to full
    weights. Returns {reference_name: np.ndarray} with the "llma." / "model."
    prefixes stripped."""
    import torch

    fmt, mp = infer_checkpoint_format_and_mp_size(path)
    pat = FORMAT_FILENAME_PATTERNS[fmt]
    shard_files = sorted(
        f for f in Path(path).iterdir() if f.is_file() and pat.match(f.name))

    shards: List[Dict[str, Any]] = []
    for f in shard_files:
        sd = torch.load(str(f), map_location="cpu", weights_only=True)
        if "model" in sd and isinstance(sd["model"], dict):
            sd = sd["model"]
        shards.append({_strip(k): v for k, v in sd.items()})

    all_keys: List[str] = []
    for sh in shards:
        for k in sh.keys():
            if k not in all_keys:
                all_keys.append(k)

    merged: Dict[str, np.ndarray] = {}
    for name in all_keys:
        present = [sh[name] for sh in shards if name in sh]
        rule, dim = _merge_rule(name, llama_type)
        if len(present) == 1 or rule == "rep":
            if len(present) > 1:
                # replicated params must agree across shards (reference
                # consistency check, tensor_parallel.py:116-123)
                import torch as _t

                ref0 = present[0].float()
                for other in present[1:]:
                    diff = float((other.float() - ref0).abs().max())
                    if diff > 1e-6:
                        import warnings

                        warnings.warn(
                            f"replicated param {name!r} differs across TP "
                            f"shards (max abs diff {diff:.3e})")
                        break
            merged[name] = _to_numpy(present[0])
        elif rule == "moe_fused":
            import torch as _t

            num_experts = _guess_num_experts(shards, name)
            views = [w.view(num_experts, -1, w.shape[-1]) for w in present]
            merged[name] = _to_numpy(_t.cat(views, dim=1).reshape(-1, views[0].shape[-1]))
        else:
            import torch as _t

            merged[name] = _to_numpy(_t.cat(present, dim=dim))
    return merged


def _strip(k: str) -> str:
    for prefix in ("llma.", "model.", "module."):
        if k.startswith(prefix):
            return k[len(prefix):]
    return k


def _guess_num_experts(shards, name) -> int:
    # gate weight shape (E, dim) lives next to the fused weights
    gate_name = name.rsplit(".", 2)[0] + ".gate.weight" if ".weight" in name else \
        name.rsplit(".", 1)[0] + ".gate.weight"
    for sh in shards:
        if gate_name in sh:
            return sh[gate_name].shape[0]
    return 8  # mixtral default


# ---------------------------------------------------------------------------
# reference state-dict → accessory_tpu pytree
# ---------------------------------------------------------------------------

def detect_llama_type(keys) -> str:
    """Infer the model family from reference state-dict key names (used when
    the caller has no meta.json at hand)."""
    keys = list(keys)
    if any(".mixer.Wqkv." in k for k in keys):
        return "internlm"
    if any(".self_attention." in k for k in keys):
        return "falcon"
    if any(".feed_forward.experts." in k for k in keys):
        return "mixtral"
    if any(re.search(r"\.feed_forward\.w[123]$", k) for k in keys):
        return "mixtral_sparse"
    return "llama"


def import_reference_checkpoint(
    path: str,
    llama_type: Optional[str] = None,
    n_layers: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Load + convert a reference checkpoint dir to our *flat* param dict
    ("/"-joined keys, stacked layers, (in, out) layout) — ready to merge into
    a params pytree via checkpoint.native machinery."""
    sd = load_torch_checkpoint(path, llama_type or "llama")
    if llama_type is None:
        llama_type = detect_llama_type(sd.keys())
        if llama_type.startswith("mixtral"):
            # re-merge with MoE-aware rules
            sd = load_torch_checkpoint(path, llama_type)
    return convert_state_dict(sd, llama_type, n_layers=n_layers)


def _layer_ids(sd: Dict[str, np.ndarray]) -> List[int]:
    ids = set()
    for k in sd:
        m = re.match(r"layers\.(\d+)\.", k)
        if m:
            ids.add(int(m.group(1)))
    return sorted(ids)


def _stack(sd, template: str, ids, transform=None) -> np.ndarray:
    arrs = []
    for i in ids:
        a = sd[template.format(i)]
        arrs.append(transform(a) if transform else a)
    return np.stack(arrs)


_T = lambda a: np.ascontiguousarray(a.T)  # noqa: E731


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    llama_type: str,
    n_layers: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Map merged reference names → our flat keys. Supports llama(_peft),
    internlm, falcon, mixtral, mixtral_sparse naming."""
    ids = _layer_ids(sd)
    if n_layers is not None:
        assert len(ids) in (0, n_layers), (len(ids), n_layers)
    out: Dict[str, np.ndarray] = {}

    def put(key, val):
        out[key] = val

    family = llama_type.split("_")[0]
    if family == "llama" or llama_type.startswith("mixtral"):
        if "tok_embeddings.weight" in sd:
            put("tok_embeddings/weight", sd["tok_embeddings.weight"])
        if "norm.weight" in sd:
            put("norm/weight", sd["norm.weight"])
        if "output.weight" in sd:
            put("output/weight", _T(sd["output.weight"]))
        if ids:
            L = "layers.{}."
            put("layers/attention_norm/weight",
                _stack(sd, L + "attention_norm.weight", ids))
            put("layers/ffn_norm/weight", _stack(sd, L + "ffn_norm.weight", ids))
            for w in ("wq", "wk", "wv", "wo"):
                put(f"layers/attention/{w}/weight",
                    _stack(sd, L + f"attention.{w}.weight", ids, _T))
            if llama_type.startswith("mixtral"):
                _convert_moe(sd, ids, put, fused="sparse" in llama_type)
            else:
                for w in ("w1", "w2", "w3"):
                    put(f"layers/feed_forward/{w}/weight",
                        _stack(sd, L + f"feed_forward.{w}.weight", ids, _T))
    elif family == "internlm":
        if "word_embeddings.weight" in sd:
            put("word_embeddings/weight", sd["word_embeddings.weight"])
        if "norm.weight" in sd:
            put("norm/weight", sd["norm.weight"])
        if "output.weight" in sd:
            put("output/weight", _T(sd["output.weight"]))
        if ids:
            L = "layers.{}."
            put("layers/norm1/weight", _stack(sd, L + "norm1.weight", ids))
            put("layers/norm2/weight", _stack(sd, L + "norm2.weight", ids))
            put("layers/mixer/Wqkv/weight", _stack(sd, L + "mixer.Wqkv.weight", ids, _T))
            put("layers/mixer/Wqkv/bias", _stack(sd, L + "mixer.Wqkv.bias", ids))
            put("layers/mixer/out_proj/weight",
                _stack(sd, L + "mixer.out_proj.weight", ids, _T))
            put("layers/mixer/out_proj/bias", _stack(sd, L + "mixer.out_proj.bias", ids))
            # internlm reference names mlp weights w1/w2/w3 (internlm.py:172-200)
            for w in ("w1", "w2", "w3"):
                put(f"layers/mlp/{w}/weight", _stack(sd, L + f"mlp.{w}.weight", ids, _T))
    elif family == "falcon":
        if "word_embeddings.weight" in sd:
            put("word_embeddings/weight", sd["word_embeddings.weight"])
        for nm in ("ln_f.weight", "ln_f.bias"):
            if nm in sd:
                put(nm.replace(".", "/"), sd[nm])
        if "output.weight" in sd:
            put("output/weight", _T(sd["output.weight"]))
        if ids:
            L = "layers.{}."
            att = "self_attention."
            for w in ("wq", "wk", "wv", "dense"):
                put(f"layers/self_attention/{w}/weight",
                    _stack(sd, L + att + f"{w}.weight", ids, _T))
                if L.format(0) + att + f"{w}.bias" in sd:
                    put(f"layers/self_attention/{w}/bias",
                        _stack(sd, L + att + f"{w}.bias", ids))
            for w in ("dense_h_to_4h", "dense_4h_to_h"):
                put(f"layers/mlp/{w}/weight", _stack(sd, L + f"mlp.{w}.weight", ids, _T))
                if L.format(0) + f"mlp.{w}.bias" in sd:
                    put(f"layers/mlp/{w}/bias", _stack(sd, L + f"mlp.{w}.bias", ids))
            for ln in ("ln_attn", "ln_mlp", "input_layernorm", "post_attention_layernorm"):
                if L.format(0) + ln + ".weight" in sd:
                    put(f"layers/{ln}/weight", _stack(sd, L + ln + ".weight", ids))
                    put(f"layers/{ln}/bias", _stack(sd, L + ln + ".bias", ids))
    else:
        raise ValueError(f"no converter for llama_type {llama_type!r}")
    return out


def _convert_moe(sd, ids, put, fused: bool) -> None:
    """Mixtral FFN → our (L, E, dim, H)/(L, E, H, dim) stacked experts."""
    L = "layers.{}."
    put("layers/feed_forward/gate/weight",
        _stack(sd, L + "feed_forward.gate.weight", ids, _T).astype(np.float32))
    if fused:
        # fused (E*H, dim): view (E, H, dim); w1/w3 are (out=H, in=dim) per
        # expert → transpose to (dim, H); w2 fused rows are already (H, dim)
        gate0 = sd[L.format(ids[0]) + "feed_forward.gate.weight"]
        E = gate0.shape[0]

        def unfuse(name, transpose):
            def f(a):
                a = a.reshape(E, -1, a.shape[-1])
                return np.ascontiguousarray(np.swapaxes(a, 1, 2)) if transpose else a
            return f

        put("layers/feed_forward/w1/weight",
            _stack(sd, L + "feed_forward.w1", ids, unfuse("w1", True)))
        put("layers/feed_forward/w3/weight",
            _stack(sd, L + "feed_forward.w3", ids, unfuse("w3", True)))
        put("layers/feed_forward/w2/weight",
            _stack(sd, L + "feed_forward.w2", ids, unfuse("w2", False)))
    else:
        gate0 = sd[L.format(ids[0]) + "feed_forward.gate.weight"]
        E = gate0.shape[0]

        def stack_experts(w, transpose):
            layers = []
            for i in ids:
                experts = [sd[L.format(i) + f"feed_forward.experts.{e}.{w}.weight"]
                           for e in range(E)]
                experts = [_T(x) if transpose else x for x in experts]
                layers.append(np.stack(experts))
            return np.stack(layers)

        put("layers/feed_forward/w1/weight", stack_experts("w1", True))
        put("layers/feed_forward/w3/weight", stack_experts("w3", True))
        put("layers/feed_forward/w2/weight", stack_experts("w2", True))
