"""Large-DiT: LLaMA-style diffusion transformers (ImageNet class-conditional
and T2I), TPU-native.

Reference: Large-DiT-ImageNet/ and Large-DiT-T2I/ — DiT with adaLN-zero
conditioning and LLaMA-style blocks (Large-DiT-T2I/models/model.py:36-513),
gaussian diffusion library (diffusion/, ~1200 LoC), TP+FSDP/HSDP training
with EMA (train.py:121-131, :160-235; parallel.py:40-92).

TPU design: the DiT is a functional pytree model scanned over stacked
layers like the LLM zoo; HSDP's intra/inter-node groups become (dp, fsdp)
mesh axes; EMA is one jitted tree-map.
"""

from accessory_tpu.dit.model import DiTArgs, dit_forward, init_dit, dit_param_axes  # noqa: F401
from accessory_tpu.dit.diffusion import GaussianDiffusion  # noqa: F401
