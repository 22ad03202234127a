"""jax.profiler hooks + step timing / throughput meters.

The reference had wall-clock timers only (``deepspeed_utils.py:179,315``,
``SenseVoice.py:805-822``); here profiling is first-class: a trace context
writing TensorBoard-compatible traces, and a StepTimer that reports
steps/sec and audio-sec/sec (the BASELINE.md headline metric).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(profile_dir: Optional[str]):
    """``with trace("/tmp/profile"):`` captures a jax.profiler trace."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timing + audio-seconds throughput."""

    def __init__(self, window: int = 50):
        self.window = window
        self.reset()

    def reset(self):
        self._times = []
        self._audio = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def stop(self, audio_seconds: float = 0.0):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            self._audio.append(audio_seconds)
            if len(self._times) > self.window:
                self._times.pop(0)
                self._audio.pop(0)
        self._last = None

    @property
    def steps_per_sec(self) -> float:
        t = sum(self._times)
        return len(self._times) / t if t else 0.0

    @property
    def audio_sec_per_sec(self) -> float:
        t = sum(self._times)
        return sum(self._audio) / t if t else 0.0
