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


def _triplet_cache(path, rng, n=4, v=6):
    """Reference layout: top-level ctc/clean/noise groups of logit sets."""
    import h5py

    with h5py.File(path, "w") as f:
        for g in ("ctc", "clean", "noise"):
            grp = f.create_group(g)
            for k in range(n):
                t = int(rng.integers(6, 14))
                grp[f"utt{k}"] = rng.normal(size=(t, v)).astype(np.float32)


def test_analyze_triplet_h5_fanout_and_plots(tmp_path):
    pytest.importorskip("h5py")
    pytest.importorskip("matplotlib")
    from ps_slm_tpu.tools.posterior_analysis import analyze_triplet_h5

    rng = np.random.default_rng(4)
    path = tmp_path / "triplet.h5"
    _triplet_cache(str(path), rng)
    out = tmp_path / "out"

    # serial and pool fan-out must agree exactly
    s1 = analyze_triplet_h5(str(path), str(out / "serial"), jobs=1)
    s2 = analyze_triplet_h5(str(path), str(out / "pool"), jobs=2)
    assert s1["n_utts"] == s2["n_utts"] == 4
    assert s1["delta_mean"] == pytest.approx(s2["delta_mean"])

    import csv as _csv
    import os

    with open(s1["csv"]) as f:
        rows = list(_csv.DictReader(f))
    assert len(rows) == 4
    for col in ("ctc_clean_js", "ctc_noise_js", "noise_clean_js", "delta",
                "ctc_clean_top1_acc", "ctc_clean_edit_norm"):
        assert col in rows[0]
    for p in s1["plots"]:
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_triplet_cli_dispatch(tmp_path, capsys):
    pytest.importorskip("h5py")
    pytest.importorskip("matplotlib")
    from ps_slm_tpu.tools.posterior_analysis import main

    rng = np.random.default_rng(5)
    path = tmp_path / "triplet.h5"
    _triplet_cache(str(path), rng, n=2)
    rc = main([str(path), str(tmp_path / "out"), "--jobs", "1"])
    assert rc == 0
    assert "delta mean" in capsys.readouterr().out


def test_interp_logits_then_softmax():
    from ps_slm_tpu.tools.posterior_analysis import interp_logits_then_softmax

    rng = np.random.default_rng(6)
    logits = rng.normal(size=(7, 5))
    p = interp_logits_then_softmax(logits, 11)
    assert p.shape == (11, 5)
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-6)
    # length-preserving call == plain softmax
    q = interp_logits_then_softmax(logits, 7)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    np.testing.assert_allclose(q, e / e.sum(-1, keepdims=True), rtol=1e-6)
