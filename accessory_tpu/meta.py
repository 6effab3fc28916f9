"""MetaModel facade: one entry point over the model zoo.

Behavioral reference: accessory/model/meta.py — dynamic model-module lookup
(:29-31), config-JSON union merge (:33-45), tokenizer-driven vocab size
(:42-43), ``from_pretrained`` probing meta.json/config.json/tokenizer
(:80-214), generation APIs (:371-548), quantization hook (:198-211),
``get_quant_blocklist`` passthrough (:570-573).

TPU differences: params are a pytree (not an nn.Module); quantization swaps
array leaves for QuantizedWeight values (not module classes); generation is
delegated to the jitted engine.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from accessory_tpu.config import ARGS_REGISTRY, make_args, union_merge_configs
from accessory_tpu.engine.generate import Generator
from accessory_tpu.models import get_model_module
from accessory_tpu.tokenizer import Tokenizer, probe_tokenizer_path_from_pretrained


class MetaModel:
    def __init__(
        self,
        llama_type: str,
        llama_config: Union[str, Sequence[Union[str, Dict[str, Any]]]] = (),
        tokenizer_path: Optional[str] = None,
        with_visual: bool = False,
        max_seq_len: int = 4096,
        seed: int = 0,
        init_params: bool = True,
    ):
        if isinstance(llama_config, (str, dict)):
            llama_config = [llama_config]
        self.llama_type = llama_type
        self.module = get_model_module(llama_type)
        args_cls = ARGS_REGISTRY.get(llama_type)
        if args_cls is None:
            raise KeyError(f"unknown llama_type {llama_type!r}")

        self.tokenizer = Tokenizer(tokenizer_path) if tokenizer_path else None
        vocab = self.tokenizer.n_words if self.tokenizer else None

        overrides: Dict[str, Any] = {"max_seq_len": max_seq_len}
        if vocab is not None:
            overrides["vocab_size"] = vocab
        from accessory_tpu.config import (
            SphinxArgs, SphinxMoEArgs, _sphinx_image_size_for,
            _sphinx_visual_for)

        if args_cls in (SphinxArgs, SphinxMoEArgs):
            # per-type defaults, but explicit config keys win
            merged_cfg = union_merge_configs(llama_config)
            if "visual" not in merged_cfg:
                overrides["visual"] = _sphinx_visual_for(llama_type)
            if "image_size" not in merged_cfg:
                overrides["image_size"] = _sphinx_image_size_for(llama_type)
            with_visual = True
        self.args = make_args(args_cls, llama_config, **overrides)
        self.with_visual = with_visual

        self.params = (
            self.module.init_params(jax.random.PRNGKey(seed), self.args)
            if init_params else None)
        self._generator: Optional[Generator] = None

    # ------------------------------------------------------------------

    def _encode_image_hook(self):
        """(params, images) → (image token embeds, n_image_words) for the
        generation engine, when the model family has a visual branch."""
        enc = getattr(self.module, "encode_image", None)
        if not self.with_visual or enc is None:
            return None
        words_fn = getattr(self.module, "image_words", None)
        if words_fn is None:
            from accessory_tpu.models.sphinx import image_words as words_fn

        def f(params, images):
            import jax.numpy as jnp

            return enc(params, self.args, jnp.asarray(images)), \
                words_fn(self.args)

        return f

    @property
    def generator(self) -> Generator:
        if self._generator is None:
            assert self.params is not None and self.tokenizer is not None
            self._generator = Generator(
                self.module, self.args, self.params, self.tokenizer,
                encode_image=self._encode_image_hook(),
                kv_dtype=getattr(self, "kv_dtype", None))
        return self._generator

    def _reset_generator(self):
        self._generator = None

    def generate(self, prompts: List[str], images=None, max_gen_len: int = 512,
                 temperature: float = 0.0, top_p: float = 0.95,
                 additional_stop_symbols: Iterable[str] = (), seed: int = 0):
        return self.generator.generate(
            prompts, images=images, max_gen_len=max_gen_len,
            temperature=temperature, top_p=top_p,
            additional_stop_symbols=additional_stop_symbols, seed=seed)

    def stream_generate(self, prompt: str, images=None, max_gen_len: int = 512,
                        temperature: float = 0.0, top_p: float = 0.95,
                        additional_stop_symbols: Iterable[str] = (), seed: int = 0):
        return self.generator.stream_generate(
            prompt, images=images, max_gen_len=max_gen_len,
            temperature=temperature, top_p=top_p,
            additional_stop_symbols=additional_stop_symbols, seed=seed)

    def compute_logits(self, examples, images=None):
        return self.generator.compute_logits(examples, images)

    def evaluate_examples(self, contexts, continuations, images=None,
                          batch_size: int = 8):
        return self.generator.evaluate_examples(contexts, continuations,
                                                images=images,
                                                batch_size=batch_size)

    # ------------------------------------------------------------------

    def get_quant_blocklist(self) -> List[str]:
        """Model-specific substrings never quantized (reference meta.py:570-573,
        llama_ens.py:523-532 blocks visual towers)."""
        fn = getattr(self.module, "get_quant_blocklist", None)
        return list(fn(self.args)) if fn else []

    def quantize(self, bits: int = 4, group_size: int = 128):
        from accessory_tpu.quant import DEFAULT_BLOCKLIST, quantize_params

        block = tuple(DEFAULT_BLOCKLIST) + tuple(self.get_quant_blocklist())
        self.params = quantize_params(
            self.params, bits=bits, group_size=group_size, blocklist=block)
        self._reset_generator()
        return self

    # ------------------------------------------------------------------

    def save_pretrained(self, save_dir: str) -> None:
        """Self-describing checkpoint dir: weights + config.json + meta.json +
        tokenizer (reference misc.py:365-386)."""
        from accessory_tpu.checkpoint import save_checkpoint

        os.makedirs(save_dir, exist_ok=True)
        save_checkpoint(save_dir, self.params)
        with open(Path(save_dir) / "config.json", "w") as f:
            json.dump(dataclasses.asdict(self.args), f, indent=2)
        with open(Path(save_dir) / "meta.json", "w") as f:
            json.dump({"llama_type": self.llama_type}, f, indent=2)
        if self.tokenizer is not None:
            self.tokenizer.save(save_dir)

    @classmethod
    def from_pretrained(
        cls,
        pretrained_path: Union[str, Sequence[str]],
        llama_type: Optional[str] = None,
        llama_config: Optional[Sequence[str]] = None,
        tokenizer_path: Optional[str] = None,
        max_seq_len: int = 4096,
        with_visual: bool = False,
        quant: bool = False,
        quant_bits: int = 4,
        kv_dtype: Optional[str] = None,
        dtype: str = "bfloat16",
    ) -> "MetaModel":
        """Probe a checkpoint dir for meta.json / config.json / tokenizer and
        load weights (reference meta.py:80-214). ``pretrained_path`` may be a
        list — later entries override/add (diff checkpoints,
        tensor_parallel.py:425-485 semantics)."""
        paths = [pretrained_path] if isinstance(pretrained_path, str) else list(pretrained_path)
        root = paths[-1]

        if llama_type is None:
            meta_file = Path(root) / "meta.json"
            assert meta_file.exists(), f"no meta.json under {root}; pass llama_type"
            llama_type = json.loads(meta_file.read_text())["llama_type"]
        if llama_config is None:
            cfg = Path(root) / "config.json"
            llama_config = [str(cfg)] if cfg.exists() else []
        if tokenizer_path is None:
            for p in reversed(paths):
                tokenizer_path = probe_tokenizer_path_from_pretrained(p)
                if tokenizer_path:
                    break
            assert tokenizer_path, f"no tokenizer found under {paths}"

        model = cls(llama_type, list(llama_config), tokenizer_path,
                    with_visual=with_visual, max_seq_len=max_seq_len,
                    init_params=True)

        from accessory_tpu.checkpoint import load_checkpoint_list

        model.params = load_checkpoint_list(paths, model.params, dtype=dtype)
        if quant:
            model.quantize(bits=quant_bits)
        if kv_dtype is not None:
            # int8 KV cache (half KV HBM traffic, 2x context per GB) —
            # consumed by the Generator at cache init
            model.kv_dtype = kv_dtype
            model._reset_generator()
        return model
