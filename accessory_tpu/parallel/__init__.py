"""Parallelism: device mesh construction + logical-axis sharding rules.

This package is the TPU-native replacement for the reference's entire
distributed stack — FairScale `initialize_model_parallel` 2-D process grids
(reference: accessory/main_finetune.py:143), Column/RowParallelLinear layer
classes (accessory/model/LLM/llama.py:10-15), and FSDP parameter sharding
(accessory/main_finetune.py:241-263). Instead of parallel *layer classes* and
NCCL process groups, models annotate every parameter with *logical axis
names* and GSPMD inserts the collectives:

  * ``tp``   — megatron tensor parallel (attention heads / ffn hidden / vocab)
  * ``fsdp`` — ZeRO-3-style parameter sharding (the reference's ``fsdp`` mode)
  * ``dp``   — pure data parallel replicas (the reference's ``ddp`` mode)
  * ``ep``   — expert parallel (whole experts per device, mixtral.py layout)

The reference's ``sdp`` (ZeRO-2) has no direct GSPMD analogue and is covered
by ``fsdp`` which strictly dominates on TPU.
"""

from accessory_tpu.parallel.mesh import (  # noqa: F401
    DEFAULT_RULES,
    INFERENCE_RULES,
    make_mesh,
    local_mesh,
    logical_to_pspec,
    shard_pytree,
    named_sharding_tree,
    with_sharding_constraint_axes,
)
