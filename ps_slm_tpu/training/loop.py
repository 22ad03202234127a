"""Epoch training / evaluation loops.

Replaces the reference DeepSpeed loops (``Multitask/utils/deepspeed_utils.py``
``train`` :136-391, ``evaluation`` :394-498) with the mesh-sharded jitted
step.  Preserved behaviors:

  * grad accumulation (optax.MultiSteps inside the step)
  * per-``log_interval`` loss/acc logging (+wandb-compatible sink)
  * ``validation_interval`` mid-epoch eval; checkpoint gated on best eval
    loss (deepspeed_utils.py:248-293)
  * epoch summaries with step timing + memory report (:315-365)

Removed by design: the per-step gloo join barrier (:102-123) — deterministic
global batching guarantees equal step counts; and the host->device cast loop
(:194-204) — batches are placed sharded once per step.
"""

from __future__ import annotations

import itertools
import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ps_slm_tpu.parallel import mesh as meshlib
from ps_slm_tpu.training.step import make_eval_step, make_train_step
from ps_slm_tpu.utils.memory import MemoryTrace
from ps_slm_tpu.utils.profiler import StepTimer, trace


_DEVICE_KEYS = (
    "input_ids", "attention_mask", "labels", "input_features",
    "input_feature_length", "waveform", "waveform_length", "gt_ids",
    "gt_lens", "batch_valid",
)


def to_device_batch(batch: Dict, mesh) -> Dict:
    dev = {
        k: jnp.asarray(v) for k, v in batch.items() if k in _DEVICE_KEYS
    }
    return meshlib.shard_batch(dev, mesh)


def _batch_audio_seconds(batch: Dict) -> float:
    """True audio seconds in the batch, excluding padded repeat rows
    (batch_valid=False) — those train with masked loss and must not count
    toward throughput.  ``audio_seconds`` is the collator's pre-pad per-row
    duration (correct for the whisper path too, whose
    input_feature_length is a fixed 3000 regardless of real audio);
    the fallbacks cover precomputed-feature arks (60 ms LFR frames)."""
    valid = batch.get("batch_valid")

    def masked_sum(v):
        v = np.asarray(v)
        if valid is not None:
            v = v[np.asarray(valid)]
        return float(np.sum(v))

    if "audio_seconds" in batch:
        return masked_sum(batch["audio_seconds"])
    if "waveform_length" in batch:
        return masked_sum(batch["waveform_length"]) / 16000.0
    if "input_feature_length" in batch:
        return masked_sum(batch["input_feature_length"]) * 0.060
    return 0.0


def evaluate(
    model, params, eval_batches: Iterable[Dict], mesh, eval_step=None,
) -> Dict[str, float]:
    """Mean loss/acc over an eval stream (deepspeed_utils.py:394-498)."""
    eval_step = eval_step or make_eval_step(model)
    tot_loss = tot_acc = 0.0
    n = 0
    for batch in eval_batches:
        m = eval_step(params, to_device_batch(batch, mesh))
        tot_loss += float(m["loss"])
        tot_acc += float(m["acc"])
        n += 1
    if n == 0:
        return {"eval_loss": float("nan"), "eval_acc": float("nan")}
    return {
        "eval_loss": tot_loss / n,
        "eval_acc": tot_acc / n,
        "eval_ppl": float(np.exp(min(tot_loss / n, 30.0))),
    }


def train(
    model,
    state,
    tx,
    train_config,
    log_config,
    train_batches_fn: Callable[[int], Iterable[Dict]],
    eval_batches_fn: Optional[Callable[[], Iterable[Dict]]] = None,
    mesh=None,
    trainable=None,
    logger=None,
    metric_logger=None,
    checkpoint_fn: Optional[Callable] = None,
):
    """Epoch loop. ``train_batches_fn(epoch)`` yields host batches;
    ``checkpoint_fn(state, tag)`` persists on eval improvement.

    Returns (state, history dict).
    """
    mesh = mesh or meshlib.build_mesh(train_config.mesh_shape)
    state_sh = None
    if mesh is not None and mesh.devices.size > 1:
        from ps_slm_tpu.training.step import canonical_state_shardings

        state_sh = canonical_state_shardings(state, mesh)
    step_fn = make_train_step(model, tx, trainable, state_shardings=state_sh)
    eval_step = make_eval_step(model) if eval_batches_fn else None
    timer = StepTimer()
    rng = jax.random.PRNGKey(train_config.seed)

    best_eval = float("inf")
    history = {"train_loss": [], "eval_loss": []}
    global_step = 0
    log = logger.info if logger else print

    # mid-epoch resume fast-forward: state.step > 0 means the optimizer
    # already consumed that many batches of the deterministic global stream
    # (GlobalBatcher + per-epoch seed), so skip them host-side — the resumed
    # run then sees exactly the data/LR alignment of an uninterrupted run.
    # Exceeds the reference, whose resume is weights-only and restarts the
    # stream (checkpoint_handler.py:169-182).
    resume_step = int(jax.device_get(state.step))
    if resume_step:
        log(f"resume fast-forward: skipping {resume_step} trained batches")

    with trace(log_config.profile_dir):
        for epoch in range(train_config.num_epochs):
            need_skip = max(resume_step - global_step, 0)
            src = None
            skip_capable = False
            if need_skip:
                import inspect

                try:
                    params = inspect.signature(train_batches_fn).parameters
                except (TypeError, ValueError):
                    params = {}
                if "skip_batches" in params:
                    # skip-capable sources are cheap here: header-only audio
                    # lengths + uncollated marker batches (data/dataset.py
                    # GlobalBatcher.skip_batches)
                    src = train_batches_fn(epoch, skip_batches=need_skip)
                    skip_capable = True
            if src is None:
                src = train_batches_fn(epoch)
            if need_skip:
                src = iter(src)
                first = None
                saw_any = False
                while global_step < resume_step:
                    try:
                        b = next(src)
                    except StopIteration:
                        src = None
                        break
                    saw_any = True
                    if skip_capable and not (
                        isinstance(b, dict) and b.get("batch_skipped")
                    ):
                        # a skip-capable source that skipped internally
                        # (no marker dicts): b is the first real post-skip
                        # batch — counting it as skipped would silently
                        # double-skip real data.  Its arrival also proves
                        # the source skipped exactly need_skip batches.
                        first = b
                        global_step = resume_step
                        break
                    global_step += 1  # marker, or slow-path decoded batch
                if src is None and skip_capable and not saw_any:
                    # internal-skip source that exhausted without yielding
                    # anything: zero information on how many batches this
                    # epoch held (markers would have said), so re-count the
                    # undoctored epoch stream — slow but exact, and only
                    # this epoch pays it
                    src = iter(train_batches_fn(epoch))
                    while global_step < resume_step:
                        try:
                            next(src)
                        except StopIteration:
                            src = None
                            break
                        global_step += 1
                if src is not None and first is None:
                    # peek: an epoch whose batches were ALL consumed before
                    # the checkpoint must not run (and log stats for) a
                    # zero-batch epoch
                    try:
                        first = next(src)
                    except StopIteration:
                        src = None
                if src is not None:
                    src = itertools.chain([first], src)
                if src is None:
                    continue  # epoch fully consumed before the checkpoint

            epoch_start = time.perf_counter()
            epoch_loss = epoch_acc = 0.0
            epoch_batches = 0
            with MemoryTrace() as mem:
                pending = []  # async metrics; synced at log points only
                from ps_slm_tpu.data.prefetch import device_prefetch

                for batch, gbatch in device_prefetch(
                    src,
                    lambda b: to_device_batch(b, mesh), depth=2,
                ):
                    timer.start()
                    state, metrics = step_fn(state, gbatch, rng)
                    # do NOT materialize metrics here: a device->host sync
                    # every step would serialize the pipeline
                    pending.append(metrics)
                    timer.stop(_batch_audio_seconds(batch))
                    epoch_batches += 1
                    global_step += 1

                    if global_step % log_config.log_interval == 0:
                        for m in pending:
                            epoch_loss += float(m["loss"])
                            epoch_acc += float(m["acc"])
                        loss = float(pending[-1]["loss"])
                        acc = float(pending[-1]["acc"])
                        pending = []
                        msg = (
                            f"step {global_step} loss {loss:.4f} "
                            f"acc {acc:.4f} "
                            f"{timer.steps_per_sec:.2f} it/s "
                            f"{timer.audio_sec_per_sec:.1f} audio-s/s"
                        )
                        log(msg)
                        if metric_logger:
                            metric_logger.log(
                                {
                                    "train/loss": loss,
                                    "train/acc": acc,
                                    "train/steps_per_sec": timer.steps_per_sec,
                                    "train/audio_sec_per_sec":
                                        timer.audio_sec_per_sec,
                                },
                                step=global_step,
                            )

                    if (
                        train_config.run_validation
                        and eval_batches_fn is not None
                        and global_step % train_config.validation_interval == 0
                    ):
                        ev = evaluate(
                            model, state.params, eval_batches_fn(), mesh,
                            eval_step,
                        )
                        log(f"eval @ {global_step}: {ev}")
                        if metric_logger:
                            metric_logger.log(ev, step=global_step)
                        history["eval_loss"].append(ev["eval_loss"])
                        if (
                            ev["eval_loss"] < best_eval
                            and checkpoint_fn is not None
                            and train_config.save_model
                        ):
                            best_eval = ev["eval_loss"]
                            checkpoint_fn(state, f"step_{global_step}")
                            log(
                                f"checkpoint saved (eval_loss {best_eval:.4f})"
                            )

                for m in pending:  # flush tail metrics
                    epoch_loss += float(m["loss"])
                    epoch_acc += float(m["acc"])

            epoch_time = time.perf_counter() - epoch_start
            denom = max(epoch_batches, 1)
            log(
                f"epoch {epoch}: loss {epoch_loss / denom:.4f} "
                f"acc {epoch_acc / denom:.4f} time {epoch_time:.1f}s; "
                f"{mem.report()}"
            )
            history["train_loss"].append(epoch_loss / denom)

    if getattr(train_config, "save_last", False) and checkpoint_fn is not None:
        checkpoint_fn(state, "last")
        log("final checkpoint saved (last/)")

    return state, history
