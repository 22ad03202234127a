"""Entry points (reference L6: finetune_deepspeed.py / inference_batch.py)."""
