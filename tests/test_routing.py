"""Sliding-window serve routing (inference/routing.py): segment admission,
re-probe from the last-N completion window, route flips in BOTH directions
when the workload's completion-length profile drifts, and the measured
throughput override (round 5: the length prior picked static on a tiny
relay-fronted model where the pool measured 5x faster wall-clock)."""

import time

import numpy as np

from ps_slm_tpu.inference.routing import route_serve


class _FakeDecoder:
    """Records which route served which key; completion length comes from
    the request payload so tests control the workload profile exactly."""

    def __init__(self, name, served):
        self.name = name
        self.served = served

    def run(self, batches, on_partial=None):
        for item in batches:
            if item is None:
                continue
            key, length = item
            self.served.append((self.name, key))
            yield key, np.zeros(length, np.int32)


def _drive(lengths, probe=4, static_below=16):
    served = []
    logs = []
    reqs = [(f"r{i}", ln) for i, ln in enumerate(lengths)]
    out = list(route_serve(
        iter(reqs),
        lambda: _FakeDecoder("pool", served),
        lambda: _FakeDecoder("static", served),
        probe=probe, static_below=static_below, log=logs.append,
    ))
    assert [k for k, _ in out] == [k for k, _ in reqs]  # all answered once
    return served, logs


def test_short_workload_routes_to_static():
    served, logs = _drive([4] * 12, probe=4, static_below=16)
    # first segment (cold start) on the pool, rest on static
    assert [r for r, _ in served] == ["pool"] * 4 + ["static"] * 8
    assert any("routing to static" in m for m in logs)


def test_long_workload_stays_on_pool():
    served, logs = _drive([100] * 12, probe=4, static_below=16)
    assert all(r == "pool" for r, _ in served)
    assert logs == []  # no flips


def test_short_to_long_drift_reroutes_to_pool():
    """The round-4 gap: after a short-form probe froze the route on static,
    a workload drifting long was stuck there.  The sliding window must flip
    it back to the pool."""
    lengths = [4] * 4 + [100] * 12
    served, logs = _drive(lengths, probe=4, static_below=16)
    routes = [r for r, _ in served]
    assert routes[:4] == ["pool"] * 4          # cold-start probe
    assert routes[4:8] == ["static"] * 4       # short verdict
    assert routes[8:] == ["pool"] * 8          # window now long -> back
    assert any("routing to static" in m for m in logs)
    assert any("routing to the slot pool" in m for m in logs)


def test_window_is_sliding_not_cumulative():
    """A long early history must not outvote the recent window: 8 long
    completions followed by short ones re-route to static once the last
    `probe` completions are short."""
    lengths = [100] * 8 + [4] * 8
    served, _ = _drive(lengths, probe=4, static_below=16)
    routes = [r for r, _ in served]
    assert routes[:12] == ["pool"] * 12
    assert routes[12:] == ["static"] * 4


class _TimedDecoder(_FakeDecoder):
    """Fake decoder with a controlled per-request service time, so the
    router's measured-rate override sees real (deterministically ordered)
    throughput differences."""

    def __init__(self, name, served, per_req_s):
        super().__init__(name, served)
        self.per_req_s = per_req_s

    def run(self, batches, on_partial=None):
        for item in batches:
            if item is None:
                continue
            time.sleep(self.per_req_s)
            key, length = item
            self.served.append((self.name, key))
            yield key, np.zeros(length, np.int32)


def _drive_timed(lengths, pool_s, static_s, probe=4, static_below=16):
    served, logs = [], []
    reqs = [(f"r{i}", ln) for i, ln in enumerate(lengths)]
    out = list(route_serve(
        iter(reqs),
        lambda: _TimedDecoder("pool", served, pool_s),
        lambda: _TimedDecoder("static", served, static_s),
        probe=probe, static_below=static_below, log=logs.append,
    ))
    assert [k for k, _ in out] == [k for k, _ in reqs]
    return [r for r, _ in served], logs


def test_measured_override_beats_short_prior():
    """Short completions say static, but the pool measures 2.7x faster
    (the round-5 tiny-model TPU regime): after one exploration segment on
    static the router must settle on the pool."""
    routes, logs = _drive_timed([4] * 24, pool_s=0.015, static_s=0.040)
    assert routes[:4] == ["pool"] * 4       # cold start (measured)
    assert routes[4:8] == ["static"] * 4    # prior exploration
    assert routes[8:] == ["pool"] * 16      # measured verdict
    assert any("measured" in m and "slot pool" in m for m in logs)


def test_measured_confirms_static_prior():
    """When static really is faster on short answers (the 1.5B steady
    state), the measured verdict agrees with the prior and the route
    stays put after the same exploration step."""
    routes, _ = _drive_timed([4] * 24, pool_s=0.040, static_s=0.015)
    assert routes[:4] == ["pool"] * 4
    assert routes[4:] == ["static"] * 20


def test_none_passthrough_and_decoder_reuse():
    """Live-source ``None`` items are forwarded without counting toward the
    segment, and route flips reuse decoder instances (no rebuilds)."""
    built = {"pool": 0, "static": 0}
    served = []

    def make(name):
        def f():
            built[name] += 1
            return _FakeDecoder(name, served)
        return f

    reqs = [("a", 4), None, ("b", 4), ("c", 4), None, ("d", 4),
            ("e", 4), ("f", 4), ("g", 100), ("h", 100),
            ("i", 100), ("j", 100), ("k", 4), ("l", 4)]
    out = list(route_serve(
        iter(reqs), make("pool"), make("static"),
        probe=2, static_below=16,
    ))
    assert sorted(k for k, _ in out) == sorted(
        k for k in "abcdefghijkl"
    )
    assert built["pool"] == 1 and built["static"] == 1
