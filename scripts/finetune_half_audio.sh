#!/usr/bin/env bash
# Audio TASU SFT — the released `half_audio_finetuned` recipe: real CTC
# posteriors + PSD on top of a text_only checkpoint
# (reference scripts/finetune_deespeed_sensevoice.sh:25-45 with
# gt_emb=false, 900 h audio per readme.md:65-66).
set -euo pipefail

LLM=${LLM:-/models/Qwen2.5-1.5B-Instruct}
ENCODER=${ENCODER:-/models/SenseVoiceSmall}
DATA=${DATA:-/data}
INIT=${INIT:-exp/text_only/step_15000/pytorch_model.bin}
OUT=${OUT:-exp/half_audio}

# Multi-host: export PS_COORDINATOR, PS_NUM_HOSTS, PS_HOST_ID per host
# (replaces the reference's DeepSpeed hostfile launch, :109-121).
python -m ps_slm_tpu.cli.finetune \
  ++model_config.llm_path="$LLM" \
  ++model_config.llm_dim=1536 \
  ++model_config.encoder_path="$ENCODER" \
  ++model_config.encoder_dim=25055 \
  ++model_config.encoder_projector=linear-silu \
  ++model_config.encoder_projector_ds_rate=1 \
  ++train_config.ctc_posterior=true \
  ++train_config.voca_trans=false \
  ++train_config.gt_emb=false \
  ++train_config.do_psd=true \
  ++train_config.freeze_encoder=true \
  ++train_config.freeze_llm=true \
  ++train_config.lr=5e-5 \
  ++train_config.warmup_steps=200 \
  ++train_config.total_steps=15000 \
  ++train_config.num_epochs=3 \
  ++train_config.validation_interval=1000 \
  ++train_config.output_dir="$OUT" \
  ckpt_path="$INIT" \
  ++dataset_config.multitask_prompt_path=conf/multiprompt.jsonl \
  ++dataset_config.train_scp_file_path="$DATA/train/" \
  ++dataset_config.dev_scp_file_path="$DATA/dev/" \
  ++dataset_config.train_max_frame_length=3000 \
  ++dataset_config.ds_rate=1 \
  ++log_config.log_interval=5 \
  "$@"
