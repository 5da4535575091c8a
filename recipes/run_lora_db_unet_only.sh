#!/bin/bash
# DreamBooth, UNet-only rank-4 (reference run_lora_db_unet_only.sh).
export MODEL_NAME=${MODEL_NAME:-"/models/stable-diffusion-v1-5"}
export INSTANCE_DIR=${INSTANCE_DIR:-"./data/instance"}
export OUTPUT_DIR=${OUTPUT_DIR:-"./exps/db_unet_only"}

python -m lora_tpu.cli.lora_db \
  --pretrained_model_name_or_path=$MODEL_NAME \
  --instance_data_dir=$INSTANCE_DIR \
  --output_dir=$OUTPUT_DIR \
  --instance_prompt="a photo of sks dog" \
  --resolution=512 \
  --train_batch_size=1 \
  --learning_rate=1e-4 \
  --lr_scheduler="constant" \
  --lr_warmup_steps=0 \
  --lora_rank=4 \
  --max_train_steps=30000 \
  --mixed_precision=bf16 \
  --data_parallel=True
