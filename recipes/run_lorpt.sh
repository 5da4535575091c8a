#!/bin/bash
# Legacy single-loop TI+LoRA (reference run_lorpt.sh / train_lora_w_ti.py).
export MODEL_NAME=${MODEL_NAME:-"/models/stable-diffusion-v1-5"}
export INSTANCE_DIR=${INSTANCE_DIR:-"./data/instance"}
export OUTPUT_DIR=${OUTPUT_DIR:-"./exps/lorpt"}

python -m lora_tpu.cli.lora_ti \
  --pretrained_model_name_or_path=$MODEL_NAME \
  --instance_data_dir=$INSTANCE_DIR \
  --output_dir=$OUTPUT_DIR \
  --placeholder_token="<krk>" \
  --learnable_property="object" \
  --resolution=512 \
  --train_batch_size=1 \
  --learning_rate=1e-4 \
  --learning_rate_text=5e-5 \
  --learning_rate_ti=5e-4 \
  --max_train_steps=3000 \
  --unfreeze_lora_step=1500 \
  --save_steps=500 \
  --mixed_precision=bf16
