"""Offline CTC-posterior distribution analysis.

Re-implementation of ``Multitask/utils/distribution_analysis.py`` (the
research tool used to validate the TASU hypothesis): given pairs of real CTC
posteriors and simulated (clean / CPS-noised) pseudo-posteriors, compute

  * frame-mean Jensen-Shannon distance (after length interpolation)
  * symmetric cross-entropy
  * top-1 agreement rate
  * CTC-collapse edit distance (argmax -> collapse -> blank-drop)
  * blank fraction and mean entropy

Input: an HDF5 cache with groups per utterance containing datasets
``real`` [T1, V] and ``sim`` [T2, V] (the reference used the same layout),
or in-memory arrays via :func:`analyze_pair`.

CLI: ``python -m ps_slm_tpu.tools.posterior_analysis cache.h5 [out.json]``.
"""

from __future__ import annotations

import json
import sys
from typing import Dict, List

import numpy as np

EPS = 1e-10


def interp_to_length(post: np.ndarray, t_out: int) -> np.ndarray:
    """Linear time interpolation then renormalize (reference
    interp_logits_then_softmax semantics on probability inputs)."""
    t_in, v = post.shape
    if t_in == t_out:
        out = post
    else:
        x_out = np.linspace(0.0, 1.0, t_out)
        x_in = np.linspace(0.0, 1.0, t_in)
        out = np.stack([np.interp(x_out, x_in, post[:, j]) for j in range(v)], 1)
    s = out.sum(-1, keepdims=True)
    return out / np.maximum(s, EPS)


def js_distance_frame_mean(p: np.ndarray, q: np.ndarray) -> float:
    """Mean over frames of the JS distance (sqrt of JS divergence, log2)."""
    m = 0.5 * (p + q)

    def kl(a, b):
        return np.sum(a * (np.log2(a + EPS) - np.log2(b + EPS)), axis=-1)

    js = 0.5 * kl(p, m) + 0.5 * kl(q, m)
    return float(np.mean(np.sqrt(np.clip(js, 0, None))))


def symmetric_ce(p: np.ndarray, q: np.ndarray) -> float:
    ce_pq = -np.sum(p * np.log(q + EPS), axis=-1)
    ce_qp = -np.sum(q * np.log(p + EPS), axis=-1)
    return float(np.mean(0.5 * (ce_pq + ce_qp)))


def top1_agreement(p: np.ndarray, q: np.ndarray) -> float:
    return float(np.mean(p.argmax(-1) == q.argmax(-1)))


def collapse_ctc(post: np.ndarray, blank: int = 0) -> List[int]:
    ids = post.argmax(-1)
    out = []
    prev = None
    for i in ids:
        if i != prev and i != blank:
            out.append(int(i))
        prev = i
    return out


def edit_distance(a: List[int], b: List[int]) -> int:
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev = dp[0]
        dp[0] = i
        for j in range(1, lb + 1):
            cur = dp[j]
            dp[j] = min(
                dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
            prev = cur
    return dp[lb]


def blank_fraction(post: np.ndarray, blank: int = 0) -> float:
    return float(np.mean(post.argmax(-1) == blank))


def mean_entropy(post: np.ndarray) -> float:
    return float(np.mean(-np.sum(post * np.log(post + EPS), axis=-1)))


def analyze_pair(
    real: np.ndarray, sim: np.ndarray, blank: int = 0
) -> Dict[str, float]:
    """All metrics for one (real, simulated) posterior pair."""
    sim_i = interp_to_length(sim, real.shape[0])
    real_n = real / np.maximum(real.sum(-1, keepdims=True), EPS)
    c_real = collapse_ctc(real_n, blank)
    c_sim = collapse_ctc(sim / np.maximum(sim.sum(-1, keepdims=True), EPS),
                         blank)
    ed = edit_distance(c_real, c_sim)
    return {
        "js": js_distance_frame_mean(real_n, sim_i),
        "sce": symmetric_ce(real_n, sim_i),
        "top1": top1_agreement(real_n, sim_i),
        "edit": ed,
        "edit_norm": ed / max(len(c_real), 1),
        "blank_frac_real": blank_fraction(real_n, blank),
        "blank_frac_sim": blank_fraction(sim, blank),
        "entropy_real": mean_entropy(real_n),
        "entropy_sim": mean_entropy(sim),
    }


def analyze_h5(path: str, blank: int = 0) -> Dict[str, float]:
    import h5py

    per_utt = []
    with h5py.File(path, "r") as f:
        for key in f.keys():
            g = f[key]
            if "real" in g and "sim" in g:
                per_utt.append(
                    analyze_pair(np.asarray(g["real"]), np.asarray(g["sim"]),
                                 blank)
                )
    if not per_utt:
        raise ValueError(f"no (real, sim) pairs in {path}")
    agg = {k: float(np.mean([u[k] for u in per_utt])) for k in per_utt[0]}
    agg["n_utts"] = len(per_utt)
    return agg


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(
            "usage: python -m ps_slm_tpu.tools.posterior_analysis "
            "cache.h5 [out.json]"
        )
        return 2
    stats = analyze_h5(argv[0])
    text = json.dumps(stats, indent=2)
    print(text)
    if len(argv) > 1:
        with open(argv[1], "w") as f:
            f.write(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
