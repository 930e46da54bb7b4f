"""Supervoxel segmentation properties (vs reference semantics, not bytes:
label partitions are only consumed as groups; parity is structural)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fusion4landslide_tpu.ops.segments import bucket_size, label_members
from fusion4landslide_tpu.ops.supervoxel import supervoxel_segmentation


def test_partition_and_compactness(rng):
    pts = rng.uniform(0, 10, size=(2000, 3)).astype(np.float32)
    pts[:, 2] = 0.1 * pts[:, 2]
    res = supervoxel_segmentation(pts, 2.0)
    labels = np.asarray(res.labels)
    k = int(res.n_supervoxels)
    assert labels.min() >= 0 and labels.max() == k - 1
    # roughly one supervoxel per occupied 2m cell of a 10x10 footprint
    assert 15 <= k <= 40
    # spatial coherence: each supervoxel's diameter bounded by a few radii
    for lbl in range(k):
        sel = pts[labels == lbl]
        assert sel.shape[0] > 0
        if sel.shape[0] > 1:
            ext = sel.max(0) - sel.min(0)
            assert np.linalg.norm(ext) < 4 * 2.0


def test_boundary_respects_normals(rng):
    """Two orthogonal planes: supervoxels should rarely straddle the crease."""
    n = 900
    a = np.column_stack(
        [rng.uniform(0, 4, n), rng.uniform(0, 4, n), np.zeros(n)]
    )
    b = np.column_stack(
        [np.full(n, 4.0), rng.uniform(0, 4, n), rng.uniform(0, 4, n)]
    )
    # jitter so normals are well-defined but distinct
    a += rng.normal(scale=0.01, size=a.shape)
    b += rng.normal(scale=0.01, size=b.shape)
    pts = np.vstack([a, b]).astype(np.float32)
    res = supervoxel_segmentation(pts, 1.0)
    labels = np.asarray(res.labels)
    # Count labels that mix plane-a and plane-b points far from the crease.
    far_a = pts[:, 0] < 3.0
    far_b = pts[:, 2] > 1.0
    mixed = 0
    for lbl in range(int(res.n_supervoxels)):
        sel = labels == lbl
        if (sel & far_a).any() and (sel & far_b).any():
            mixed += 1
    assert mixed == 0


def test_masked_points_excluded(rng):
    pts = rng.uniform(0, 5, size=(500, 3)).astype(np.float32)
    mask = np.arange(500) < 400
    res = supervoxel_segmentation(pts, 1.5, mask=mask)
    labels = np.asarray(res.labels)
    assert (labels[400:] == -1).all()
    assert (labels[:400] >= 0).all()


def test_label_members_roundtrip(rng):
    labels = rng.integers(0, 7, size=100).astype(np.int32)
    labels[::13] = -1
    S, P = 8, 64
    idx, mask = label_members(labels, S, P)
    idx, mask = np.asarray(idx), np.asarray(mask)
    for lbl in range(7):
        want = set(np.where(labels == lbl)[0].tolist())
        got = set(idx[lbl][mask[lbl]].tolist())
        assert got == want


def test_bucket_size():
    assert bucket_size(5) == 64
    assert bucket_size(64) == 64
    assert bucket_size(65) == 128
    # Above the listed buckets the ladder continues at quarter-octave steps
    # ({1, 1.25, 1.5, 1.75} x 2^k) so production overlap tiles don't pad up
    # to the next power of two; every rung is a multiple of 2^13.
    assert bucket_size(40000) == 40960
    assert bucket_size(40960) == 40960
    assert bucket_size(40961) == 49152
    assert bucket_size(131072) == 131072
    assert bucket_size(131073) == 163840
    assert bucket_size(1_244_433) == 1_310_720  # 512k-core +-20 m overlap
    assert bucket_size(1_960_000) == 2_097_152  # 1M-core +-20 m overlap
    for n in range(33_000, 3_000_000, 13_771):
        b = bucket_size(n)
        assert b >= n and b % 8192 == 0 and b <= 2 * n


def _oracle_supervoxels(points, k_neighbors, resolution):
    """Faithful numpy port of the reference segmentation
    (cpp_core/supervoxel_segmentation/supervoxel.cpp:83-143 +
    codelibrary/geometry/point_cloud/supervoxel_segmentation.h:66-245):
    kNN graph (self included), PCA normals, VCCS metric, greedy disjoint-set
    fusion with doubling lambda until the grid-sample seed count, then
    queue-based boundary refinement and relabelling. O(n k) Python — oracle
    for small clouds only."""
    from scipy.spatial import cKDTree

    import math

    n = len(points)
    tree = cKDTree(points)
    _, neigh = tree.query(points, k=k_neighbors)

    normals = np.zeros((n, 3))
    for i in range(n):
        nb = points[neigh[i]]
        cov = np.cov((nb - nb.mean(0)).T)
        w, v = np.linalg.eigh(cov)
        normals[i] = v[:, 0]

    # Scalar-float metric (called millions of times; numpy scalars are 10x
    # slower).
    px, py, pz = (points[:, 0].tolist(), points[:, 1].tolist(),
                  points[:, 2].tolist())
    nx, ny, nz = (normals[:, 0].tolist(), normals[:, 1].tolist(),
                  normals[:, 2].tolist())
    inv_res = 0.4 / resolution

    def metric(i, j):
        dx = px[i] - px[j]
        dy = py[i] - py[j]
        dz = pz[i] - pz[j]
        dot = nx[i] * nx[j] + ny[i] * ny[j] + nz[i] * nz[j]
        return (1.0 - abs(dot)
                + math.sqrt(dx * dx + dy * dy + dz * dz) * inv_res)

    # Seed count = occupied grid cells at the resolution
    # (grid_sample.h:27-67).
    mins = points.min(0)
    cells = np.floor((points - mins) / resolution).astype(np.int64)
    n_supervoxels = len(np.unique(cells, axis=0))

    # Disjoint set.
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    supervoxels = list(range(n))
    sizes = np.ones(n, np.int64)
    adjacents = [list(nb) for nb in neigh]
    number = n
    visited = np.zeros(n, bool)

    dis = np.full(n, np.inf)
    for i in range(n):
        for j in adjacents[i]:
            if i != j:
                dis[i] = min(dis[i], metric(i, j))
    lam = max(np.finfo(float).eps, float(np.median(dis)))

    # Upper bound on any achievable fusion loss: sizes <= n and the VCCS
    # metric <= 2 + 0.4*diameter/resolution. Past this lambda, a no-merge
    # round means the remaining roots are in different kNN components and
    # lambda-doubling can never reach the seed-count target.
    diam = float(np.linalg.norm(points.max(0) - points.min(0)))
    loss_bound = n * (2.0 + 0.4 * diam / resolution)
    while True:  # doubling lambda (supervoxel_segmentation.h:117-175)
        if len(supervoxels) <= 1:
            break
        prev_number = number
        for i in supervoxels:
            if not adjacents[i]:
                continue
            visited[i] = True
            queue = [i]
            for j in adjacents[i]:
                j = find(j)
                if not visited[j]:
                    visited[j] = True
                    queue.append(j)
            adjacent = []
            front = 1  # queue[0] = i itself is never processed
            # (supervoxel_segmentation.h: front is post-incremented past it)
            while front < len(queue):
                j = queue[front]
                front += 1
                loss = sizes[j] * metric(i, j)
                if lam - loss > 0.0:
                    parent[find(j)] = find(i)
                    sizes[i] += sizes[j]
                    for k in adjacents[j]:
                        k = find(k)
                        if not visited[k]:
                            visited[k] = True
                            queue.append(k)
                    adjacents[j] = []
                    number -= 1
                    if number == n_supervoxels:
                        break
                else:
                    adjacent.append(j)
            adjacents[i] = adjacent
            for j in queue:
                visited[j] = False
            if number == n_supervoxels:
                break
        supervoxels = [i for i in supervoxels if find(i) == i]
        number = len(supervoxels)
        if number == n_supervoxels:
            break
        if number == prev_number and lam > loss_bound:
            break  # disconnected kNN components; no lambda can merge them
        lam *= 2.0

    labels = np.array([find(i) for i in range(n)])

    # Boundary refinement (supervoxel_segmentation.h:185-236).
    dis = np.array([metric(i, labels[i]) for i in range(n)])
    from collections import deque

    q = deque()
    in_q = np.zeros(n, bool)
    for i in range(n):
        for j in neigh[i]:
            if labels[i] != labels[j]:
                if not in_q[i]:
                    q.append(i)
                    in_q[i] = True
                if not in_q[j]:
                    q.append(j)
                    in_q[j] = True
    while q:
        i = q.popleft()
        in_q[i] = False
        change = False
        for j in neigh[i]:
            a, b = labels[i], labels[j]
            if a == b:
                continue
            d = metric(i, b)
            if d < dis[i]:
                labels[i] = b
                dis[i] = d
                change = True
        if change:
            for j in neigh[i]:
                if labels[i] != labels[j] and not in_q[j]:
                    q.append(j)
                    in_q[j] = True

    remap = {s: k for k, s in enumerate(supervoxels)}
    return np.array([remap[l] for l in labels]), len(supervoxels)


def _pairwise_comembership(labels_a, labels_b, rng, n_pairs=20000):
    n = len(labels_a)
    i = rng.integers(0, n, n_pairs)
    j = rng.integers(0, n, n_pairs)
    keep = i != j
    i, j = i[keep], j[keep]
    same_a = labels_a[i] == labels_a[j]
    same_b = labels_b[i] == labels_b[j]
    # Agreement over pairs that either partition groups together (the
    # informative pairs; almost all random pairs are trivially 'different').
    informative = same_a | same_b
    if informative.sum() == 0:
        return 1.0
    return float((same_a & same_b)[informative].sum() / informative.sum())


@pytest.mark.slow
def test_supervoxel_matches_reference_oracle(rng):
    """Agreement with the reference greedy-fusion + boundary-refinement
    algorithm where geometry CONSTRAINS the partition. On featureless
    surfaces the two algorithms produce different-but-equally-valid tilings
    (greedy fusion is iteration-order dependent; downstream consumers only
    need compact label groups), so parity is asserted where it is
    well-defined:

    1. separated clusters: both algorithms must put boundaries at the gaps
       (>90% pairwise co-membership),
    2. a sharp crease: both algorithms must (equally) avoid straddling it.
    """
    resolution = 1.2
    k = 10

    # --- 1. Separated clusters, each within ONE grid cell -> one seed each;
    # the correct partition is then fully geometry-determined (one
    # supervoxel per cluster) for both algorithms.
    centers = np.stack(
        np.meshgrid(np.arange(4) * 3.6 + 0.6, np.arange(4) * 3.6 + 0.6), -1
    ).reshape(-1, 2)
    blobs = []
    for c in centers:
        b = np.clip(rng.normal(scale=0.1, size=(35, 2)), -0.28, 0.28) + c
        blobs.append(np.column_stack([b, 0.01 * rng.normal(size=35)]))
    pts = np.concatenate(blobs).astype(np.float32)

    oracle_labels, oracle_k = _oracle_supervoxels(
        pts.astype(np.float64), k, resolution
    )
    seg = supervoxel_segmentation(jnp.asarray(pts), resolution, k_neighbors=k)
    ours = np.asarray(seg.labels)

    assert abs(int(seg.n_supervoxels) - oracle_k) <= max(3, oracle_k // 4)
    score = _pairwise_comembership(oracle_labels, ours, rng)
    assert score > 0.9, f"cluster-scene co-membership {score:.3f}"

    # --- 2. Crease scene: same *boundary behaviour* as the oracle.
    n = 600
    xy = rng.uniform(0, 6, size=(n, 2))
    z = np.where(xy[:, 0] < 3, 0.0, 1.5 * (xy[:, 0] - 3))  # sharp crease
    pts2 = np.column_stack([xy, z]).astype(np.float32)
    lab_o, _ = _oracle_supervoxels(pts2.astype(np.float64), k, resolution)
    seg2 = supervoxel_segmentation(jnp.asarray(pts2), resolution, k_neighbors=k)
    lab_u = np.asarray(seg2.labels)

    def crease_straddle(lab):
        i = rng.integers(0, n, 20000)
        j = rng.integers(0, n, 20000)
        across = (pts2[i, 0] < 2.8) != (pts2[j, 0] < 2.8)
        near = np.abs(pts2[i, 0] - pts2[j, 0]) < 2.0
        sel = across & near
        return float((lab[i] == lab[j])[sel].mean())

    s_o = crease_straddle(lab_o)
    s_u = crease_straddle(lab_u)
    # Both algorithms keep crease-straddling co-membership low and within
    # 5 percentage points of each other.
    assert s_u < 0.1, f"ours straddles the crease: {s_u:.3f}"
    assert abs(s_u - s_o) < 0.05, f"oracle {s_o:.3f} vs ours {s_u:.3f}"


def test_pair_segmentation_matches_sequential(rng):
    """supervoxel_segmentation_pair: extra sweeps past a cloud's fixed
    point are no-ops, so the batched result equals per-cloud calls."""
    import jax.numpy as jnp

    from fusion4landslide_tpu.ops.supervoxel import (
        supervoxel_graph,
        supervoxel_segmentation,
        supervoxel_segmentation_pair,
    )
    from fusion4landslide_tpu.ops.normals import pca_normals

    n = 600
    a = rng.uniform(0, 8, size=(n, 3)).astype(np.float32)
    b = rng.uniform(0, 8, size=(n, 3)).astype(np.float32)
    va = np.arange(n) < 550
    vb = np.ones(n, bool)
    r = jnp.asarray(1.2, jnp.float32)
    outs = []
    for p, v in ((a, va), (b, vb)):
        gi, gm = supervoxel_graph(jnp.asarray(p), r, jnp.asarray(v))
        nr = pca_normals(jnp.asarray(p), 15, jnp.asarray(v),
                         neigh_idx=gi, neigh_mask=gm)
        seq = supervoxel_segmentation(
            jnp.asarray(p), r, jnp.asarray(v),
            neigh_idx=gi, neigh_mask=gm, normals=nr,
        )
        outs.append((gi, gm, nr, seq))
    batched = supervoxel_segmentation_pair(
        jnp.stack([a, b]), r, jnp.stack([va, vb]),
        jnp.stack([outs[0][0], outs[1][0]]),
        jnp.stack([outs[0][1], outs[1][1]]),
        jnp.stack([outs[0][2], outs[1][2]]),
    )
    np.testing.assert_array_equal(
        np.asarray(batched.labels[0]), np.asarray(outs[0][3].labels)
    )
    np.testing.assert_array_equal(
        np.asarray(batched.labels[1]), np.asarray(outs[1][3].labels)
    )
