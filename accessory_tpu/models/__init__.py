"""Model registry: ``llama_type`` string → module implementing the family.

Mirrors the reference's importlib-by-name registry
(accessory/model/meta.py:29-31; names in accessory/model/LLM/__init__.py).
Each module exposes: ``init_params``, ``param_axes``, ``init_kv_cache``,
``cache_axes``, ``forward`` and uses the matching args class from
accessory_tpu.config.ARGS_REGISTRY.
"""

from __future__ import annotations

import importlib

_FAMILY_BY_TYPE = {
    # llama family and its PEFT/multimodal variants share one implementation;
    # variant behavior is config- and adapter-driven, not copy-pasted modules.
    "llama": "llama",
    "llama_peft": "llama",
    "internlm": "internlm",
    "falcon": "falcon",
    "mixtral": "mixtral",
    "mixtral_peft": "mixtral",
    "mixtral_sparse": "mixtral",
    "llama_adapter": "llama_adapter",
    "llama_qformerv2": "llama_qformerv2",
    "llama_qformerv2_peft": "llama_qformerv2",
    # SPHINX multimodal (llama_ens family; reference has one file per crop
    # layout — here the layout is the `visual` config field)
    "llama_ens": "sphinx",
    "llama_ens5": "sphinx",
    "llama_ens5p2": "sphinx",
    "llama_ens10": "sphinx",
    "llama_ens_peft": "sphinx",
    "llama_ens_light": "sphinx",
    "llama_ens5_light": "sphinx",
    "mixtral_sparse_ens": "sphinx_moe",
    "mixtral_sparse_ens5": "sphinx_moe",
}


def get_model_module(llama_type: str):
    family = _FAMILY_BY_TYPE.get(llama_type, llama_type)
    return importlib.import_module(f"accessory_tpu.models.{family}")
