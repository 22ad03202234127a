#!/usr/bin/env bash
# Serving-oriented greedy decode presets: continuous slot-pool batching,
# int8 weights, and CTC-draft speculative verification (docs/PERF.md).
# Same scoring pipeline as scripts/decode.sh afterwards.
set -euo pipefail

LLM=${LLM:-/models/Qwen2.5-1.5B-Instruct}
ENCODER=${ENCODER:-/models/SenseVoiceSmall}
DATA=${DATA:-/data}
CKPT=${CKPT:-exp/half_audio/step_15000/pytorch_model.bin}
LOG=${LOG:-exp/decode/test_serving}
MODE=${MODE:-continuous}   # continuous | speculative | plain

case "$MODE" in
  continuous)
    EXTRA="++train_config.continuous_batching=true ++train_config.decode_slots=8"
    ;;
  speculative)
    EXTRA="++train_config.speculative_ctc=true ++train_config.spec_window=8"
    ;;
  plain)
    EXTRA=""
    ;;
esac

python -m ps_slm_tpu.cli.decode \
  ++model_config.llm_path="$LLM" \
  ++model_config.llm_dim=1536 \
  ++model_config.encoder_path="$ENCODER" \
  ++model_config.encoder_dim=25055 \
  ++model_config.encoder_projector=linear-silu \
  ++train_config.ctc_posterior=true \
  ++train_config.do_psd=true \
  ++train_config.num_beams=1 \
  ++train_config.quantization=true \
  ++train_config.max_new_tokens=200 \
  ++dataset_config.multitask_prompt_path=conf/multiprompt.jsonl \
  ++dataset_config.test_scp_file_path="$DATA/test/" \
  ckpt_path="$CKPT" \
  decode_log="$LOG" \
  $EXTRA \
  "$@"

python -m ps_slm_tpu.tools.clean_marks "${LOG}_pred"
python -m ps_slm_tpu.tools.clean_marks "${LOG}_gt"
python -m ps_slm_tpu.tools.wer --char=1 -v=1 "${LOG}_gt" "${LOG}_pred" > "${LOG}_wer"
tail -5 "${LOG}_wer"
