#!/bin/bash
# DreamBooth LoRA on SDXL (beyond the reference, which predates SDXL).
# The XL family is autodetected from the checkpoint dir (text_encoder_2);
# artifacts go out in the kohya-XL schema (webui-loadable), so
# output_format must be "safe". --train_text_encoder trains BOTH text
# encoders (lora_te1_/lora_te2_).
export MODEL_NAME=${MODEL_NAME:-"/models/stable-diffusion-xl-base-1.0"}
export INSTANCE_DIR=${INSTANCE_DIR:-"./data/instance"}
export OUTPUT_DIR=${OUTPUT_DIR:-"./exps/db_xl"}

python -m lora_tpu.cli.lora_db \
  --pretrained_model_name_or_path=$MODEL_NAME \
  --instance_data_dir=$INSTANCE_DIR \
  --output_dir=$OUTPUT_DIR \
  --instance_prompt="a photo of sks dog" \
  --resolution=1024 \
  --train_batch_size=1 \
  --learning_rate=1e-4 \
  --learning_rate_text=5e-5 \
  --train_text_encoder=True \
  --lr_scheduler="constant" \
  --lr_warmup_steps=0 \
  --lora_rank=8 \
  --max_train_steps=1000 \
  --mixed_precision=bf16 \
  --output_format=safe \
  --gradient_checkpointing=True \
  --data_parallel=True
