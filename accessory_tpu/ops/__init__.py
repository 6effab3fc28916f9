"""Core numerical ops: RoPE, norms, attention, sampling, quantized matmul, MoE.

Every op has an XLA (pure jnp) implementation; the hot ones additionally have
Pallas TPU kernels (flash attention, fused dequant+matmul, paged decode
attention) selected via dispatch helpers.
"""

from accessory_tpu.ops.norms import rms_norm, layer_norm  # noqa: F401
from accessory_tpu.ops.rope import precompute_rope, apply_rope  # noqa: F401
from accessory_tpu.ops.attention import attention  # noqa: F401
from accessory_tpu.ops.sampling import sample_top_p, sample_token  # noqa: F401
