"""Host-side data pipeline: manifests, tokenizers, audio I/O, batching."""
