#!/bin/bash
# QPEFT: W4 base + normBiasLora adapters (reference quantization docs flow)
python -m accessory_tpu.main_finetune \
  --llama_type llama_peft \
  --llama_config configs/model/llama2_70b.json configs/model/llamaPeft_normBiasLora.json \
  --tokenizer_path "$TOKENIZER" --pretrained_path "$PRETRAINED" \
  --data_config "$DATA_YAML" \
  --data_parallel fsdp --model_parallel_size "${MP:-8}" --checkpointing \
  --quant --only_save_trainable \
  --epochs 4 --lr 1e-4 --batch_size 2 --accum_iter 4 \
  --max_words 512 --output_dir "${OUT:-out/qpeft_70b}"
