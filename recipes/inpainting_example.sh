#!/bin/bash
# Inpainting PTI (reference inpainting_example.sh): SD-inpainting base
# (9-channel UNet), train_inpainting, lora scale 2.0.
export MODEL_NAME=${MODEL_NAME:-"/models/stable-diffusion-inpainting"}
export INSTANCE_DIR=${INSTANCE_DIR:-"./data/data_captioned"}
export OUTPUT_DIR=${OUTPUT_DIR:-"./exps/output_inpainting"}

python -m lora_tpu.cli.lora_pti \
  --pretrained_model_name_or_path=$MODEL_NAME \
  --instance_data_dir=$INSTANCE_DIR \
  --output_dir=$OUTPUT_DIR \
  --train_text_encoder=True \
  --train_inpainting=True \
  --resolution=512 \
  --train_batch_size=1 \
  --gradient_accumulation_steps=2 \
  --scale_lr=True \
  --learning_rate_unet=2e-4 \
  --learning_rate_text=1e-6 \
  --learning_rate_ti=5e-4 \
  --color_jitter=True \
  --lr_scheduler="linear" \
  --lr_warmup_steps=0 \
  --lr_scheduler_lora="constant" \
  --lr_warmup_steps_lora=100 \
  --placeholder_tokens="<s1>|<s2>" \
  --placeholder_token_at_data="<krk>|<s1><s2>" \
  --save_steps=100 \
  --max_train_steps_ti=500 \
  --max_train_steps_tuning=1000 \
  --perform_inversion=True \
  --clip_ti_decay=True \
  --weight_decay_ti=0.000 \
  --weight_decay_lora=0.001 \
  --continue_inversion=True \
  --continue_inversion_lr=1e-4 \
  --cached_latents=False \
  --use_mask_captioned_data=True \
  --lora_rank=4 \
  --lora_scale=2.0
