"""Posterior analysis metrics."""

import numpy as np
import pytest

from ps_slm_tpu.tools.posterior_analysis import (
    analyze_pair, collapse_ctc, edit_distance, interp_to_length,
    js_distance_frame_mean, top1_agreement,
)


def _dist(rng, t, v):
    p = rng.dirichlet(np.ones(v) * 0.3, size=t)
    return p.astype(np.float64)


def test_js_identity_zero():
    rng = np.random.default_rng(0)
    p = _dist(rng, 10, 6)
    assert js_distance_frame_mean(p, p) < 1e-6
    q = _dist(rng, 10, 6)
    d = js_distance_frame_mean(p, q)
    assert 0 < d <= 1.0  # JS distance (log2) bounded by 1


def test_interp_preserves_normalization():
    rng = np.random.default_rng(1)
    p = _dist(rng, 7, 5)
    q = interp_to_length(p, 13)
    np.testing.assert_allclose(q.sum(-1), 1.0, rtol=1e-6)
    # identity when lengths match
    np.testing.assert_allclose(interp_to_length(p, 7), p, rtol=1e-6)


def test_collapse_and_edit():
    v = 5
    post = np.zeros((6, v))
    for t, i in enumerate([1, 1, 0, 2, 2, 3]):
        post[t, i] = 1.0
    assert collapse_ctc(post) == [1, 2, 3]
    assert edit_distance([1, 2, 3], [1, 3]) == 1
    assert edit_distance([], [1, 2]) == 2
    assert edit_distance([1, 2], [1, 2]) == 0


def test_analyze_pair_self_agreement():
    rng = np.random.default_rng(2)
    p = _dist(rng, 12, 8)
    stats = analyze_pair(p, p)
    assert stats["js"] < 1e-6
    assert stats["top1"] == 1.0
    assert stats["edit"] == 0


def test_analyze_h5(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(3)
    path = tmp_path / "cache.h5"
    with h5py.File(path, "w") as f:
        for k in range(3):
            g = f.create_group(f"utt{k}")
            g["real"] = _dist(rng, 10, 6)
            g["sim"] = _dist(rng, 8, 6)
    from ps_slm_tpu.tools.posterior_analysis import analyze_h5

    agg = analyze_h5(str(path))
    assert agg["n_utts"] == 3
    assert 0 <= agg["top1"] <= 1
