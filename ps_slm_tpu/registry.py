"""Factory registry.

The reference loads model/dataset factories by *file path string*
(``model_config.file = "model/ps-slm.py:model_factory"``, resolved via
``SourceFileLoader`` in ``Multitask/utils/model_utils.py:14-33`` and
``utils/dataset_utils.py:28-46``).  Same capability — pluggable factories —
expressed as a registry, so user code registers by name instead of shipping
exec-by-path.
"""

from __future__ import annotations

from typing import Callable, Dict

_MODEL_FACTORIES: Dict[str, Callable] = {}
_DATASET_FACTORIES: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn: Callable) -> Callable:
        _MODEL_FACTORIES[name] = fn
        return fn
    return deco


def register_dataset(name: str):
    def deco(fn: Callable) -> Callable:
        _DATASET_FACTORIES[name] = fn
        return fn
    return deco


def get_model_factory(name: str) -> Callable:
    _ensure_builtins()
    if name not in _MODEL_FACTORIES:
        raise KeyError(
            f"unknown model factory {name!r}; known: {sorted(_MODEL_FACTORIES)}"
        )
    return _MODEL_FACTORIES[name]


def get_dataset_factory(name: str) -> Callable:
    _ensure_builtins()
    if name not in _DATASET_FACTORIES:
        raise KeyError(
            f"unknown dataset factory {name!r}; known: {sorted(_DATASET_FACTORIES)}"
        )
    return _DATASET_FACTORIES[name]


_BOOTSTRAPPED = False


def _ensure_builtins() -> None:
    """Import built-in factories lazily (avoids import cycles)."""
    global _BOOTSTRAPPED
    if _BOOTSTRAPPED:
        return
    _BOOTSTRAPPED = True
    from ps_slm_tpu.models import tasu  # noqa: F401  registers "tasu"
    from ps_slm_tpu.data import dataset  # noqa: F401  registers "multitask"
