"""Host-side data pipeline.

Reference subsystem: accessory/data/ — pretrain iterable datasets
(falcon.py / falcon_packed.py), finetune dataset + grouped distributed
sampler (alpaca.py), dialog templates + dataset (conversation/), image
transforms (transform.py), system prompts (system_prompt.py).

Everything here runs on the host CPU and emits numpy arrays; device code
never sees Python objects. The sampler's "every global batch comes from one
dataset type" and resume-at-iteration guarantees are preserved because
training-state reproducibility depends on them.
"""

from accessory_tpu.data.alpaca import FinetuneDataset, FinetuneDistSampler  # noqa: F401
from accessory_tpu.data.falcon import Falcon  # noqa: F401
from accessory_tpu.data.falcon_packed import FalconPacked  # noqa: F401
from accessory_tpu.data.system_prompt import format_prompt  # noqa: F401
