#!/bin/bash
# single-turn finetune of LLaMA2-7B (reference exps/finetune/sg counterpart)
python -m accessory_tpu.main_finetune \
  --llama_type llama --llama_config configs/model/llama2_7b.json \
  --tokenizer_path "$TOKENIZER" --pretrained_path "$PRETRAINED" \
  --data_config "$DATA_YAML" \
  --data_parallel fsdp --model_parallel_size "${MP:-1}" --checkpointing \
  --epochs 4 --lr 2e-5 --warmup_epochs 1 --batch_size 4 --accum_iter 2 \
  --max_words 512 --output_dir "${OUT:-out/sg_7b}"
