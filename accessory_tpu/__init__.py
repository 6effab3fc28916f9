"""accessory_tpu — a TPU-native LLM training / quantized-inference framework.

A from-scratch JAX / XLA / Pallas re-design of the capability surface of
Alpha-VLLM/LLaMA2-Accessory (reference: /root/reference):

- model zoo: LLaMA/LLaMA2/CodeLLaMA, InternLM, Falcon, Mixtral-8x7B MoE,
  SPHINX multimodal (reference: accessory/model/LLM/*.py)
- training: data-parallel (fsdp-style param sharding) x tensor parallel over a
  GSPMD device mesh (reference: FSDP x FairScale megatron TP)
- inference: jitted prefill + decode_step, paged KV cache, batched top-p
  sampling, streaming (reference: accessory/model/meta.py:371-548)
- quantization: W4A16/W3A16 group-wise weight-only with fused
  dequant+matmul Pallas kernels (reference: bitsandbytes NF4 swap,
  accessory/util/quant.py)

Design is TPU-first: pure-functional models (params = pytrees with logical
sharding axes), lax.scan over stacked layers, GSPMD mesh sharding instead of
NCCL process groups, Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"
