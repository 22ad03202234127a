"""ps_slm_tpu — a TPU-native speech-LLM framework (TASU).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``PigeonDan1/ps-slm`` (reference layout surveyed in SURVEY.md): a frozen
CTC speech encoder (SenseVoice-style SANM), a projector zoo, a Qwen2.5-class
decoder LLM, text-only / audio TASU training variants, a multitask streaming
data pipeline, distributed (mesh-sharded) training, batch decoding and WER
scoring.

Layering (bottom-up):
  ops/        device kernels & jittable primitives (attention, fbank, PSD, merge, CTC)
  models/     functional model definitions (qwen2, sensevoice, projectors, tasu)
  parallel/   mesh construction + sharding rules + collectives
  data/       host-side manifests, tokenizers, audio I/O, batching
  training/   optimizer, train/eval loops, checkpointing
  inference/  bucketed KV-cache decoding, batch decode
  tools/      WER scorer, punctuation cleaner, posterior analysis
  cli/        entry points (finetune, decode)
"""

__version__ = "0.1.0"
