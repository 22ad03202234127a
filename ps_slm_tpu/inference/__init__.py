"""Inference runtime: bucketed KV-cache decoding, batch decode."""
