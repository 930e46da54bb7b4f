"""Alternative segmentation backends (host-side, scikit-learn).

The reference offers ``clustering_type: hdbscan`` for rgb_guided
(src/rgb_guided.py:889-931: StandardScaler + hdbscan.HDBSCAN with
min_cluster_size=10, min_samples=1000) and names dbscan/hdbscan hooks in
f2s3 (src/f2s3.py:194-211). These are host-side density clusterers over at
most ~1M tile points — no TPU value, so they stay on CPU via scikit-learn
(the standalone ``hdbscan`` package is not available in this environment;
sklearn.cluster.HDBSCAN implements the same algorithm).
"""

from __future__ import annotations

import numpy as np

__all__ = ["hdbscan_labels", "dbscan_labels"]


def hdbscan_labels(
    points: np.ndarray,
    *,
    min_cluster_size: int = 10,
    min_samples: int = 1000,
) -> np.ndarray:
    """(n,) cluster labels, -1 = noise (reference rgb_guided.py:889-895)."""
    from sklearn.cluster import HDBSCAN
    from sklearn.preprocessing import StandardScaler

    pts = StandardScaler().fit_transform(np.asarray(points))
    min_samples = min(int(min_samples), len(pts) - 1) if len(pts) > 1 else 1
    clus = HDBSCAN(
        min_cluster_size=int(min_cluster_size), min_samples=max(min_samples, 1)
    )
    return clus.fit(pts).labels_.astype(np.int64)


def dbscan_labels(
    points: np.ndarray, *, eps: float = 0.5, min_samples: int = 10
) -> np.ndarray:
    """(n,) DBSCAN cluster labels, -1 = noise (reference f2s3.py:194-211
    names the hook; parameters follow sklearn defaults scaled to metres)."""
    from sklearn.cluster import DBSCAN

    clus = DBSCAN(eps=float(eps), min_samples=int(min_samples))
    return clus.fit(np.asarray(points)).labels_.astype(np.int64)
