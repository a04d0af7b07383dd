"""Whitening PCA + retrieval mAP (reference ``utils.py:684-842``).

Off the main path in the reference (DINO's copy-detection utilities) —
provided for inventory completeness, numpy-only.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


class PCA:
    """Covariance-based whitening PCA (``utils.py:684-741``)."""

    def __init__(self, dim: int = 256, whit: float = 0.5):
        self.dim = dim
        self.whit = whit
        self.mean = None
        self.dvt = None

    def train_pca(self, cov: np.ndarray) -> None:
        d, v = np.linalg.eigh(cov)
        eps = d.max() * 1e-5
        d[d < eps] = eps
        idx = np.argsort(d)[::-1][: self.dim]
        d = d[idx]
        v = v[:, idx]
        self.dvt = np.dot(np.diag(1.0 / d ** self.whit), v.T)

    def apply(self, x: np.ndarray) -> np.ndarray:
        if self.mean is not None:
            x = x - self.mean
        return np.dot(self.dvt, x.T).T


def compute_ap(ranks: np.ndarray, nres: int) -> float:
    """Average precision from zero-based ranks of positives
    (``utils.py:744-775``, trapezoidal PR integration)."""
    ap = 0.0
    recall_step = 1.0 / nres
    for j, rank in enumerate(ranks):
        precision_0 = 1.0 if rank == 0 else float(j) / rank
        precision_1 = float(j + 1) / (rank + 1)
        ap += (precision_0 + precision_1) * recall_step / 2.0
    return ap


def compute_map(ranks: np.ndarray, gnd: Sequence[dict], kappas: Sequence[int] = ()):
    """mAP (+ optional precision@kappa) over queries (``utils.py:778-842``).

    ranks: (n_db, n_query) ranked db indices per query.
    gnd[i]: {'ok': positives, 'junk': ignored} index arrays.
    """
    n_q = len(gnd)
    aps = np.zeros(n_q)
    prs = np.zeros((n_q, len(kappas)))
    n_empty = 0
    for i in range(n_q):
        qgnd = np.asarray(gnd[i]["ok"])
        if qgnd.size == 0:
            aps[i] = float("nan")
            prs[i, :] = float("nan")
            n_empty += 1
            continue
        qgndj = np.asarray(gnd[i].get("junk", []))
        pos = np.arange(ranks.shape[0])[np.isin(ranks[:, i], qgnd)]
        junk = np.arange(ranks.shape[0])[np.isin(ranks[:, i], qgndj)]
        k = 0
        ij = 0
        if junk.size:
            ip = 0
            while ip < pos.size:
                while ij < junk.size and pos[ip] > junk[ij]:
                    k += 1
                    ij += 1
                pos[ip] -= k
                ip += 1
        aps[i] = compute_ap(pos, qgnd.size)
        for j, kappa in enumerate(kappas):
            prs[i, j] = (pos < kappa).sum() / min(kappa, qgnd.size)
    mAP = float(np.nansum(aps) / max(n_q - n_empty, 1))
    if kappas:
        pr = np.nansum(prs, axis=0) / max(n_q - n_empty, 1)
        return mAP, aps, pr, prs
    return mAP
