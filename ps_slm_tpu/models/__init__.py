"""Functional model definitions (params as pytrees, pure apply fns)."""
