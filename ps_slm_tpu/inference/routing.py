"""Serve-route dispatch: pool vs static batching by completion length.

Short-completion workloads are ~4x faster through static batching than the
continuous slot pool (docs/PERF.md pool-vs-static on the trained
short-answer checkpoint), while long ragged completions favor the pool.
``route_serve`` implements the ``serve_route=auto`` policy for
``cli/serve.py``:

* **cold start on the pool** — it serves unknown completion lengths best;
* **segmented serving** — requests are admitted to the current decoder in
  segments of ``probe`` completions, after which the decoder drains and the
  route is re-evaluated;
* **sliding-window re-probe** — the decision statistic is the median
  completion length of the LAST ``probe`` completions (not the first ever),
  so a workload that drifts from short answers to long-form output flips
  back to the pool instead of staying frozen on the first probe's verdict
  (and vice versa).

The reference has no serving router (its decode entry is a batch script,
``inference_batch.py``); this subsystem is beyond-reference.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Dict, Iterator, Optional, Tuple

import numpy as np


def _segment(it, n: int, state: Dict) -> Iterator:
    """Pass through at most ``n`` real admissions from ``it``.  ``None``
    items (live-source "nothing ready" signal) are forwarded without
    counting.  Sets ``state['exhausted']`` at source EOF."""
    taken = 0
    while taken < n:
        try:
            item = next(it)
        except StopIteration:
            state["exhausted"] = True
            return
        if item is not None:
            taken += 1
        yield item


def route_serve(
    req_iter: Iterator,
    make_pool: Callable,
    make_static: Callable,
    *,
    probe: int,
    static_below: int,
    on_partial=None,
    log: Optional[Callable[[str], None]] = None,
) -> Iterator[Tuple[str, np.ndarray]]:
    """Serve ``req_iter`` through pool/static decoders, re-choosing the
    route every ``probe`` completions from a sliding window of the last
    ``probe`` completion lengths (median < ``static_below`` -> static).

    Decoder instances are built lazily and REUSED across segments so route
    flips never recompile; the pool's slot state and the static server's
    jit caches are both drained (but kept) at each segment boundary.
    """
    probe = max(int(probe), 1)
    it = iter(req_iter)
    state = {"exhausted": False}
    window: deque = deque(maxlen=probe)
    current = "pool"  # cold start: unknown lengths are the pool's case
    decoders: Dict[str, object] = {}

    def _get(name: str):
        if name not in decoders:
            decoders[name] = make_pool() if name == "pool" else make_static()
        return decoders[name]

    while not state["exhausted"]:
        dec = _get(current)
        kw = {"on_partial": on_partial} if current == "pool" else {}
        for key, toks in dec.run(_segment(it, probe, state), **kw):
            window.append(len(toks))
            yield key, toks
        if state["exhausted"]:
            return
        median = sorted(window)[len(window) // 2] if window else 0
        want = "static" if median < static_below else "pool"
        if want != current and log is not None:
            log(
                f"serve_route=auto: median completion {median} tok over "
                f"last {len(window)} -> routing to "
                f"{'static batching' if want == 'static' else 'the slot pool'}"
            )
        current = want
