"""Training runtime: optimizer/state, loops, checkpointing."""
