"""Inference engine: batched generation, streaming, scoring.

TPU re-design of the reference's Python-driven decode loop
(accessory/model/meta.py:371-548): tokenization and text post-processing stay
on the host, but the entire sample→write→forward decode loop runs as ONE
jitted ``lax.while_loop`` on device (no per-token host round trips, KV cache
donated so XLA updates it in place).
"""

from accessory_tpu.engine.generate import Generator  # noqa: F401
