"""Checkpoint / weight management.

Reference subsystem being reproduced: accessory/util/tensor_parallel.py (TP
shard merge/split + format inference + diff checkpoints, :34-576) and
accessory/util/misc.py:323-527 (save/resume).

TPU-native design: our on-disk format is a single *unsharded* safetensors
file with "/"-joined pytree keys (+ quant.json sidecar for packed quantized
leaves). GSPMD makes per-rank shard files unnecessary — any mesh loads the
same file and `jax.device_put` scatters the shards — so the reference's
mp-size resharding logic (:83-161) collapses to "merge everything on import".
PyTorch reference checkpoints (consolidated.* / meta_ori / *-diff) are
imported by `torch_import` with the same dim table (Column:0, Row:1,
Embedding:1, tensor_parallel.py:34-38) and converted to our layout.
"""

from accessory_tpu.checkpoint.native import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    load_checkpoint_list,
)
from accessory_tpu.checkpoint.torch_import import (  # noqa: F401
    infer_checkpoint_format_and_mp_size,
    load_torch_checkpoint,
    import_reference_checkpoint,
)
