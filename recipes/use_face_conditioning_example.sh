#!/bin/bash
# Face-conditioned PTI (reference use_face_conditioning_example.sh):
# rank 8, dropout 0.1, lora scale 8.0, face-segmentation mask loss.
export MODEL_NAME=${MODEL_NAME:-"/models/stable-diffusion-v1-5"}
export INSTANCE_DIR=${INSTANCE_DIR:-"./data/data_face"}
export OUTPUT_DIR=${OUTPUT_DIR:-"./exps/output_face"}

python -m lora_tpu.cli.lora_pti \
  --pretrained_model_name_or_path=$MODEL_NAME \
  --instance_data_dir=$INSTANCE_DIR \
  --output_dir=$OUTPUT_DIR \
  --train_text_encoder=True \
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
  --use_face_segmentation_condition=True \
  --lora_rank=8 \
  --lora_dropout_p=0.1 \
  --lora_scale=8.0
