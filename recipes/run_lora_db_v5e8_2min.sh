#!/bin/bash
# The BASELINE.json north-star run: 800-step rank-4 DreamBooth LoRA on a
# v5e-8, data-parallel over all 8 chips with cached latents. At the
# measured ~20 train steps/sec/chip (PERF.md) the 800 steps take seconds
# of device time; wall clock is dominated by compile + VAE pre-encode.
# Per-chip batch semantics: each chip sees train_batch_size examples.
export MODEL_NAME=${MODEL_NAME:-"/models/stable-diffusion-v1-5"}
export INSTANCE_DIR=${INSTANCE_DIR:-"./data/instance"}
export OUTPUT_DIR=${OUTPUT_DIR:-"./exps/db_v5e8"}

python -m lora_tpu.cli.lora_db \
  --pretrained_model_name_or_path=$MODEL_NAME \
  --instance_data_dir=$INSTANCE_DIR \
  --output_dir=$OUTPUT_DIR \
  --instance_prompt="a photo of sks dog" \
  --resolution=512 \
  --train_batch_size=1 \
  --learning_rate=1e-4 \
  --lr_scheduler="constant" \
  --lora_rank=4 \
  --max_train_steps=800 \
  --mixed_precision=bf16 \
  --cached_latents=True \
  --data_parallel=True
