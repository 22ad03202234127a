"""Console + file logging and a wandb-compatible metric sink.

Reference behaviors: per-run file+console logger
(``finetune_deepspeed.py:72-94``), rank-0 wandb scalars every
``log_interval`` steps (``deepspeed_utils.py:213-230``, ``LogConfig``
``aispeech_asr_config.py:173-181``).  wandb is optional (not in this image);
``MetricLogger`` falls back to JSONL on disk with the same call shape.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, Optional


def setup_logger(
    name: str = "ps_slm", log_file: Optional[str] = None,
    level: int = logging.INFO,
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "[%(asctime)s][%(name)s][%(levelname)s] - %(message)s"
    )
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class MetricLogger:
    """wandb if available+enabled, JSONL sink otherwise."""

    def __init__(self, log_cfg, run_config: Optional[dict] = None):
        self.cfg = log_cfg
        self._wandb = None
        self._fh = None
        if log_cfg.use_wandb:
            try:
                import wandb  # noqa

                os.makedirs(log_cfg.wandb_dir, exist_ok=True)
                self._wandb = wandb.init(
                    dir=log_cfg.wandb_dir,
                    entity=log_cfg.wandb_entity_name,
                    project=log_cfg.wandb_project_name,
                    name=log_cfg.wandb_exp_name,
                    config=run_config,
                )
            except ImportError:
                pass
        if self._wandb is None:
            path = os.path.join(
                os.path.dirname(log_cfg.log_file) or ".", "metrics.jsonl"
            )
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")

    def log(self, metrics: Dict, step: Optional[int] = None) -> None:
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        elif self._fh is not None:
            rec = {"step": step, "time": time.time(), **metrics}
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        if self._fh is not None:
            self._fh.close()


def count_params(tree) -> int:
    import numpy as np

    return int(sum(
        np.prod(getattr(l, "shape", ()) or (1,))
        for l in __import__("jax").tree_util.tree_leaves(tree)
    ))


def log_model_size(logger, model, trainable=None) -> None:
    """Per-module parameter counts (reference print_model_size /
    print_module_size, utils/model_utils.py:36-65)."""
    import jax

    for name, sub in model.params.items():
        n = count_params(sub)
        msg = f"module {name}: {n / 1e6:.2f}M params"
        if trainable is not None:
            nt = int(sum(
                count_params(l)
                for l, m in zip(
                    jax.tree_util.tree_leaves(sub),
                    jax.tree_util.tree_leaves(trainable[name]),
                )
                if m
            ))
            msg += f" ({nt / 1e6:.2f}M trainable)"
        logger.info(msg)
