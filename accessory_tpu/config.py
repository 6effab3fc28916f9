"""Model configuration system.

Mirrors the reference semantics of per-model ``ModelArgs`` dataclasses built
from a *union merge* of JSON config files (reference: accessory/model/meta.py:33-45
— each ``--llama_config`` JSON is read in order into one dict, last key wins,
then the per-family dataclass is constructed from the union).

Every model family registers its args class here; the model registry
(``accessory_tpu.models``) maps ``llama_type`` strings to (args_cls, module).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Union


def union_merge_configs(paths_or_dicts: Sequence[Union[str, Dict[str, Any]]]) -> Dict[str, Any]:
    """Union-merge JSON config files / dicts, last key wins.

    Reference behavior: accessory/model/meta.py:33-45.
    """
    merged: Dict[str, Any] = {}
    for item in paths_or_dicts:
        if isinstance(item, str):
            with open(item) as f:
                item = json.load(f)
        if not isinstance(item, dict):
            raise TypeError(f"config item must be a dict or JSON path, got {type(item)}")
        merged.update(item)
    return merged


def make_args(args_cls, config: Sequence[Union[str, Dict[str, Any]]] = (), **overrides):
    """Build an args dataclass from a union-merged config plus kw overrides.

    Unknown keys are ignored with the same tolerance the reference shows when
    passing a superset config dict into a dataclass via ``**`` — except we skip
    them instead of raising, so one JSON can parameterize several families.
    """
    merged = union_merge_configs(config)
    merged.update(overrides)
    fields = {f.name for f in dataclasses.fields(args_cls)}
    known = {k: v for k, v in merged.items() if k in fields}
    return args_cls(**known)


@dataclass
class LLaMAArgs:
    """LLaMA / LLaMA2 / CodeLLaMA family args.

    Field names and defaults match the reference
    accessory/model/LLM/llama.py:28-43 so reference config JSONs load
    unchanged.
    """

    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: Optional[int] = None
    vocab_size: int = -1  # set by tokenizer
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0

    max_batch_size: int = 32
    max_seq_len: int = 2048

    rope_scaling: Optional[float] = None

    # --- TPU-build extensions (absent in reference JSONs → defaults) ---
    dtype: str = "bfloat16"  # parameter / activation dtype
    rope_style: str = "interleaved"  # "interleaved" (meta llama) | "half" (neox/hf)
    tie_embeddings: bool = False
    # PEFT (reference: llama_peft.py:48-50)
    lora_rank: int = -1
    bias_tuning: bool = False
    norm_tuning: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads if self.n_kv_heads is not None else self.n_heads

    @property
    def ffn_hidden_dim(self) -> int:
        """SwiGLU hidden size with 2/3 shrink + multiple_of round-up.

        Reference: accessory/model/LLM/llama.py FeedForward.__init__
        (hidden = int(2*4*dim/3), optional multiplier, round up to multiple_of).
        """
        hidden = int(2 * (4 * self.dim) / 3)
        if self.ffn_dim_multiplier is not None:
            hidden = int(self.ffn_dim_multiplier * hidden)
        return self.multiple_of * ((hidden + self.multiple_of - 1) // self.multiple_of)


@dataclass
class InternLMArgs:
    """InternLM family (HF-style names). Reference: accessory/model/LLM/internlm.py:45-63."""

    num_layers: int = 32
    hidden_size: int = 4096
    num_attention_heads: int = 32
    mlp_ratio: float = 8 / 3
    layer_norm_epsilon: float = 1e-5
    norm_type: str = "rmsnorm"  # "rmsnorm" | "layernorm"
    norm_eps: float = 1e-5
    use_swiglu: bool = True
    vocab_size: int = -1
    multiple_of: int = 256
    rope_theta: float = 10000.0
    max_batch_size: int = 32
    max_seq_len: int = 2048
    rope_scaling: Optional[float] = None
    dtype: str = "bfloat16"
    bias: bool = True  # internlm attention projections carry bias


@dataclass
class FalconArgs:
    """Falcon / Falcon-180B family. Reference: accessory/model/LLM/falcon.py:24-44."""

    num_layers: int = 80
    hidden_size: int = 14848
    num_attention_heads: int = 232
    bias: bool = False
    multi_query: bool = True
    new_decoder_architecture: bool = True
    parallel_attn: bool = True
    num_kv_heads: Optional[int] = None
    layer_norm_epsilon: float = 1e-5
    vocab_size: int = -1
    rope_theta: float = 10000.0
    max_batch_size: int = 32
    max_seq_len: int = 2048
    rope_scaling: Optional[float] = None
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def kv_heads(self) -> int:
        if self.new_decoder_architecture:
            return self.num_kv_heads if self.num_kv_heads is not None else self.num_attention_heads
        return 1 if self.multi_query else self.num_attention_heads


@dataclass
class MixtralArgs:
    """Mixtral-8x7B MoE family. Reference: accessory/model/LLM/mixtral.py and
    mixtral_sparse.py:46-75 (moe dict: num_experts, num_experts_per_tok)."""

    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: Optional[int] = 8
    vocab_size: int = -1
    hidden_dim: int = 14336
    norm_eps: float = 1e-5
    rope_theta: float = 1000000.0
    max_batch_size: int = 32
    max_seq_len: int = 2048
    rope_scaling: Optional[float] = None

    num_experts: int = 8
    num_experts_per_tok: int = 2
    load_balancing_weight: float = 0.01

    dtype: str = "bfloat16"
    rope_style: str = "interleaved"
    # expert layout: "ep" (whole experts sharded over the ep axis, reference
    # mixtral.py) | "sparse" (every device holds 1/tp of each expert's hidden
    # dim, reference mixtral_sparse.py)
    expert_layout: str = "ep"
    # PEFT (reference mixtral_peft.py: LoRA/bias on the attention projections)
    lora_rank: int = -1
    bias_tuning: bool = False
    norm_tuning: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads if self.n_kv_heads is not None else self.n_heads


@dataclass
class AdapterArgs(LLaMAArgs):
    """LLaMA-Adapter zero-init prefix tuning. Reference:
    accessory/model/LLM/llama_adapter.py:48-62."""

    prefix_layers: Optional[int] = None  # None → all layers
    prefix_len: int = 10
    v_embed_dim: int = 768
    v_depth: int = 8
    v_num_heads: int = 16
    v_mlp_ratio: float = 4.0
    trainable_mode: str = "sg"  # sg | mm_stage1 | mm_stage2


@dataclass
class _VisualTowerFields:
    """SPHINX visual-ensemble configuration, shared by the dense (llama_ens)
    and MoE (mixtral_sparse_ens) hosts. Tower dimensions default to the
    production ensemble; tests shrink them."""

    visual: str = "ens"
    image_size: int = 224  # 448 for ens5 variants
    load_pretrained_visual_encoder: bool = False

    # CLIP ViT-L/14
    vit_patch: int = 14
    clip_width: int = 1024
    clip_layers: int = 24
    clip_heads: int = 16
    # DINOv2 ViT-g/14
    dino_width: int = 1536
    dino_layers: int = 40
    dino_heads: int = 24
    # OpenCLIP ConvNeXt-XXL
    convnext_depths: tuple = (3, 4, 30, 3)
    convnext_dims: tuple = (384, 768, 1536, 3072)
    # BLIP-2 Q-Former
    qformer_width: int = 768
    qformer_layers: int = 12
    qformer_heads: int = 12


@dataclass
class SphinxArgs(_VisualTowerFields, LLaMAArgs):
    """SPHINX multimodal (llama_ens family). Reference:
    accessory/model/LLM/llama_ens.py:278-339 (visual ensemble + image_words),
    llama_ens5.py (448px 5-crop), llama_ens_light.py (light towers).
    ``visual``: "ens" | "ens5" | "ens_light" | "ens5_light"."""


@dataclass
class SphinxMoEArgs(_VisualTowerFields, MixtralArgs):
    """SPHINX-MoE (mixtral_sparse_ens family). Reference:
    accessory/model/LLM/mixtral_sparse_ens.py (sparse MoE decoder + SPHINX
    visual ensemble, 512px) and mixtral_sparse_ens5.py (5-crop, 1024px)."""


ARGS_REGISTRY: Dict[str, Any] = {
    "llama": LLaMAArgs,
    "llama_peft": LLaMAArgs,
    "llama_adapter": AdapterArgs,
    "internlm": InternLMArgs,
    "falcon": FalconArgs,
    "mixtral": MixtralArgs,
    "mixtral_peft": MixtralArgs,
    "mixtral_sparse": MixtralArgs,
    "llama_qformerv2": SphinxArgs,
    "llama_qformerv2_peft": SphinxArgs,
    "llama_ens": SphinxArgs,
    "llama_ens5": SphinxArgs,
    "llama_ens5p2": SphinxArgs,
    "llama_ens10": SphinxArgs,
    "llama_ens_peft": SphinxArgs,
    "llama_ens_light": SphinxArgs,
    "llama_ens5_light": SphinxArgs,
    "mixtral_sparse_ens": SphinxMoEArgs,
    "mixtral_sparse_ens5": SphinxMoEArgs,
}


def _sphinx_visual_for(llama_type: str) -> str:
    return {
        "llama_ens": "ens", "llama_ens5": "ens5", "llama_ens5p2": "ens5p2",
        "llama_ens10": "ens5", "llama_ens_peft": "ens",
        "llama_ens_light": "ens_light", "llama_ens5_light": "ens5_light",
        "mixtral_sparse_ens": "ens", "mixtral_sparse_ens5": "ens5",
        # qformer-only visual branch (llama_qformerv2.py); the model module
        # ignores the ensemble fields it doesn't use
        "llama_qformerv2": "ens", "llama_qformerv2_peft": "ens",
    }[llama_type]


def _sphinx_image_size_for(llama_type: str) -> int:
    """Reference per-variant input sizes (llama_ens*.py image_size fields);
    multi-crop counts follow from size // 224 (2x2+1 at 448, 3x3+1 at 672)."""
    return {
        "llama_ens": 224, "llama_ens_peft": 224, "llama_ens_light": 224,
        "llama_ens5": 448, "llama_ens5p2": 448, "llama_ens5_light": 448,
        "llama_ens10": 672,
        "mixtral_sparse_ens": 224, "mixtral_sparse_ens5": 448,
    }.get(llama_type, 224)
