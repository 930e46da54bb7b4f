#!/usr/bin/env python
"""Headline benchmark.

Default mode (``BENCH_MODE=e2e``): the BASELINE.json headline metric —
epoch-pair end-to-end minutes. Runs the full fusion_3d per-tile pipeline
(median resolution → adaptive voxel subsample → DIPs descriptors → global
3D matches → multi-level supervoxel partition → attention aggregation →
coarse mutual matching → fine per-patch SVD+ICP → dense DVF) on a synthetic
``BENCH_N``-point tile, then extrapolates one 50M-point epoch pair sharded
over 8 chips (tiles are embarrassingly parallel; the sharded path is
validated on the virtual CPU mesh and by ``dryrun_multichip``):

    minutes_50M_v5e8 = tile_seconds * (50e6 / BENCH_N) / 8 / 60

``vs_baseline`` = north-star target (5 min, BASELINE.md "Rebuild targets")
divided by the extrapolated minutes — >1.0 means the target is beaten.

``BENCH_MODE=knn``: round-1's registration-core throughput (1M-point exact
radius-bounded 1-NN + piecewise displacement solve, Mpts/s; ``vs_baseline``
measured against scipy cKDTree on this host).

Timing note: results are synced by device→host transfer (``np.asarray``) —
on the tunnelled TPU backend ``block_until_ready`` returns at dispatch-ack,
not completion.

Prints exactly one JSON line.
Env: BENCH_MODE (e2e|knn), BENCH_N (points per epoch; default 100_000 e2e,
1_000_000 knn). The first e2e run is compile-dominated (minutes, persisted
to the on-disk XLA cache); the reported number is the best (warm) run.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def synth_epoch_pair(n: int, seed: int = 0):
    """Terrain-like epoch pair with a moving region (~100 pts/m^2)."""
    rng = np.random.default_rng(seed)
    extent = float(np.sqrt(n / 100.0))
    xy = rng.uniform(0, extent, size=(n, 2))
    z = (
        np.sin(xy[:, 0] * 0.31) * 2.0
        + np.cos(xy[:, 1] * 0.17) * 3.0
        + rng.normal(scale=0.02, size=n)
    )
    src = np.column_stack([xy, z]).astype(np.float32)
    shift = np.array([0.05, -0.02, 0.01], np.float32)
    moving = src[:, 0] > extent / 2
    tgt = src.copy()
    tgt[moving] += shift
    return src, tgt, extent


def bench_e2e(n: int) -> dict:
    import jax

    from fusion4landslide_tpu.models.aggregation import ClusterFeatureNet
    from fusion4landslide_tpu.models.dips import PointNetFeature
    from fusion4landslide_tpu.pipelines.fusion import run_fusion3d_tile

    src, tgt, extent = synth_epoch_pair(n)
    dips_params = PointNetFeature().init(
        jax.random.PRNGKey(0), np.zeros((2, 256, 3), np.float32)
    )
    agg_params = ClusterFeatureNet().init(
        jax.random.PRNGKey(1),
        np.zeros((2, 8, 64), np.float32),
        np.ones((2, 8), bool),
    )
    cfg = {
        "max_magnitude": 5.0,
        "icp_threshold": 0.1,
        "level_of_superpoint": [1, 2, 3],
        "num_min_fine_match": 10,
        "num_min_matches_for_quality_check": 10,
        "thres_dist_diff": 0.5,
        "thres_inlier_ratio": 0.15,
        "num_min_matches_for_small_patch": 10,
        "voxel_size_init": 0.1,
        "assign_type": "assign_then_nn",
        "output_tgt2src": False,
        "save_interim": False,
        # Recommended production precision: bf16 activations in the
        # descriptor net (fp32 accumulation + fp32-renormalised output;
        # match recovery verified identical on the synthetic drives).
        "feat_dtype": "bfloat16",
        "output_dir": "/tmp/f4l_bench",
        "output_folder": "run",
        "dataset": "brienz_tls",
    }

    # Warm-up on a small slice compiles the bucketed kernels; the timed run
    # below still includes any shape-specific compiles (reported warm by
    # taking the best of 2 full runs).
    best = float("inf")
    for k in range(2):
        t0 = time.perf_counter()
        out = run_fusion3d_tile(
            cfg, dips_params, agg_params, src, tgt, tile_id=f"bench{k}"
        )
        dt = time.perf_counter() - t0
        best = min(best, dt)
    assert out["assigned_fraction"] > 0.0
    minutes_50m_v5e8 = best * (50e6 / n) / 8.0 / 60.0
    target = 5.0
    return {
        "metric": "fusion3d_epoch_pair_50M_v5e8_extrapolated",
        "value": round(minutes_50m_v5e8, 2),
        "unit": "min",
        "vs_baseline": round(target / minutes_50m_v5e8, 3),
    }


def bench_knn(n: int) -> dict:
    import jax
    import jax.numpy as jnp

    from fusion4landslide_tpu.ops.hashgrid import build_hash_grid, hash_grid_knn
    from fusion4landslide_tpu.pipelines.piecewise_icp import (
        piecewise_icp_core,
        suggest_max_cells,
    )

    src, tgt, extent = synth_epoch_pair(n)
    s = jax.device_put(jnp.asarray(src))
    t = jax.device_put(jnp.asarray(tgt))
    ones = jnp.ones((n,), bool)
    smax = max(extent / 16.0, 1.0)
    max_cells = suggest_max_cells(extent, smax, n, 10)
    radius = 0.5

    def workload(q):
        grid = build_hash_grid(t, radius)
        d, idx, _ = hash_grid_knn(q, grid, radius, k=1, cap=64)
        res = piecewise_icp_core(q, t, ones, ones, smax, 10, max_cells=max_cells)
        return d, res.displacement

    d, disp = workload(s)
    np.asarray(d)
    np.asarray(disp[:1])

    best = float("inf")
    for k in range(3):
        q = s + np.float32(k) * np.float32(1e-7)
        t0 = time.perf_counter()
        d, disp = workload(q)
        np.asarray(d[-1:])
        np.asarray(disp[-1:])
        best = min(best, time.perf_counter() - t0)
    mpts = n / best / 1e6

    from scipy.spatial import cKDTree

    m = min(n, 200_000)
    tree_t0 = time.perf_counter()
    tree = cKDTree(tgt)
    tree_build = time.perf_counter() - tree_t0
    q0 = time.perf_counter()
    tree.query(src[:m], k=1)
    cpu_query = (time.perf_counter() - q0) * (n / m)
    cpu_mpts = n / (tree_build + cpu_query) / 1e6

    return {
        "metric": "knn_registration_throughput",
        "value": round(mpts, 3),
        "unit": "Mpts/s",
        "vs_baseline": round(mpts / cpu_mpts, 2),
    }


def main() -> None:
    from fusion4landslide_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    mode = os.environ.get("BENCH_MODE", "e2e")
    if mode == "knn":
        n = int(os.environ.get("BENCH_N", 1_000_000))
        result = bench_knn(n)
    else:
        n = int(os.environ.get("BENCH_N", 100_000))
        result = bench_e2e(n)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
