"""Serve-route dispatch: pool vs static batching, measured.

``route_serve`` implements the ``serve_route=auto`` policy for
``cli/serve.py``:

* **cold start on the pool** — it serves unknown completion lengths best;
* **segmented serving** — requests are admitted to the current decoder in
  segments of ``probe`` completions, after which the decoder drains and the
  route is re-evaluated;
* **length prior** — the median completion length of the LAST ``probe``
  completions (a sliding window, so a workload that drifts from short
  answers to long-form output re-routes instead of staying frozen on the
  first probe's verdict) picks the *prior* route: short (< ``static_below``)
  favors static batching (its ~4x short-answer win on the 1.5B model,
  docs/PERF.md), long ragged completions favor the pool;
* **measured override** — the prior encodes steady-state 1.5B numbers, and
  round 5 measured it WRONG on other operating points (a tiny relay-fronted
  model: static pays a fresh XLA compile per novel group shape, so the pool
  wins 5x wall-clock on the same short-answer workload the prior sends to
  static).  So every served segment also records its completions/sec, and
  once BOTH decoders carry a measurement from the current length regime the
  measured rates decide (ratio ≥ ``margin``); the prior only chooses which
  unmeasured decoder to explore and breaks near-ties.  Measurements are
  regime-tagged by their own segment's median length and invalidated when
  the workload drifts across ``static_below``, which re-triggers
  exploration under the new regime.  Segments shorter than
  ``min_measure_s`` of wall-clock (dispatch noise; also every unit-test
  fake) record nothing and leave the prior in charge.

Known bias, accepted: a decoder's first measured segment includes its jit
compile, understating its steady-state rate.  The current route's rate
refreshes every segment, so the *winner* is always current; only a losing
decoder's stale first-segment rate persists (until a regime flip clears
it).  A serving router that never revisits a measured-slower decoder is
the deliberate trade — re-measuring the loser costs real requests.

The reference has no serving router (its decode entry is a batch script,
``inference_batch.py``); this subsystem is beyond-reference.
"""

from __future__ import annotations

import time
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
    min_measure_s: float = 0.05,
    margin: float = 1.25,
) -> Iterator[Tuple[str, np.ndarray]]:
    """Serve ``req_iter`` through pool/static decoders, re-choosing the
    route every ``probe`` completions (see module docstring for the
    policy: measured same-regime rates when available, the sliding-window
    length prior otherwise).

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
    # name -> (completions/sec, regime_short) from its latest valid segment
    rate: Dict[str, Tuple[float, bool]] = {}

    def _get(name: str):
        if name not in decoders:
            decoders[name] = make_pool() if name == "pool" else make_static()
        return decoders[name]

    while not state["exhausted"]:
        dec = _get(current)
        kw = {"on_partial": on_partial} if current == "pool" else {}
        seg_lengths = []
        t0 = time.perf_counter()
        for key, toks in dec.run(_segment(it, probe, state), **kw):
            seg_lengths.append(len(toks))
            window.append(len(toks))
            yield key, toks
        dt = time.perf_counter() - t0
        if seg_lengths and dt >= min_measure_s:
            seg_median = sorted(seg_lengths)[len(seg_lengths) // 2]
            rate[current] = (len(seg_lengths) / dt, seg_median < static_below)
        if state["exhausted"]:
            return
        median = sorted(window)[len(window) // 2] if window else 0
        short = median < static_below
        prior = "static" if short else "pool"
        valid = {n: r for n, (r, reg) in rate.items() if reg == short}
        if len(valid) == 2 and (
            max(valid.values()) >= margin * min(valid.values())
        ):
            want = max(valid, key=valid.get)
            why = (f"measured {valid[want]:.1f} vs "
                   f"{min(valid.values()):.1f} completions/s")
        elif prior not in valid and valid:
            # the prior's pick is unmeasured in this regime: explore it
            want, why = prior, f"median completion {median} tok (exploring)"
        else:
            want, why = prior, f"median completion {median} tok"
        if want != current and log is not None:
            log(
                f"serve_route=auto: {why} over last {len(window)} -> "
                f"routing to "
                f"{'static batching' if want == 'static' else 'the slot pool'}"
            )
        current = want
