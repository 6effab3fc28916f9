#!/bin/bash
# packed-data pretraining (reference exps/pretrain counterpart)
python -m accessory_tpu.main_pretrain \
  --llama_type llama --llama_config configs/model/llama2_7b.json \
  --tokenizer_path "$TOKENIZER" --data_meta_path "$PACKED_DIR" --packed_data \
  --data_parallel fsdp --model_parallel_size "${MP:-4}" --checkpointing \
  --lr 3e-4 --warmup_iters 2000 --lr_decay_iters 400000 --max_iters 400000 \
  --batch_size 8 --accum_iter 4 --max_words 2048 \
  --output_dir "${OUT:-out/pretrain_7b}"
