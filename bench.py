#!/usr/bin/env python
"""Headline benchmark.

Default mode (``BENCH_MODE=e2e``): the BASELINE.json headline metric —
epoch-pair end-to-end minutes for the FULL RGB+3D fusion method —
measured on the ACTUAL multi-chip execution path:
``parallel.pipeline.make_sharded_fusion3d_step`` with image inputs, the
jitted shard_map program that ``run_fusion3d_tiles_sharded`` dispatches
(median resolution → adaptive voxel subsample → DIPs descriptors → global
3D matches → 2D pixel channel [projection, pixel→voxel chaining,
magnitude gate] → multi-level supervoxel partition → attention
aggregation → coarse mutual matching unioned with 2D majority votes →
fine per-patch SVD+ICP over both correspondence channels → dense DVF +
sparse re-association), on a synthetic PRODUCTION-SHAPED tile: a core of
``BENCH_N`` points plus its fixed ±20 m halo ring at the same density —
the *overlap* cloud ``main_fusion.py:73`` (``list_tiles(overlap=True)``)
actually feeds the pipeline, matching the reference's unit of work
(/root/reference/main_fusion.py:128-144, halo pcd_tiling.cpp:297-301) —
padded to its bucket, with a 4K camera pair and a dense pixel-match
table covering half the tile points. ``BENCH_MODE=e2e3d`` measures the
3D-only method (use_2d_matches=False). The 50M-point epoch-pair
extrapolation is

    minutes_50M_v5e8 = tile_seconds * (50e6 / BENCH_N) / 8 / 60

i.e. the epoch splits into 50e6/BENCH_N core tiles, each paying the
halo-inclusive step cost; the ÷8 assumes the SAME sharded step running
data-parallel over a v5e-8 ``tiles`` mesh — the execution mode this
benchmark measures one shard of. Tiles are communication-free (±20 m
halo decomposition); the 8-device mesh execution of this exact program
is validated by ``__graft_entry__.dryrun_multichip`` and the
8-dev==1-dev parity tests (tests/test_parallel.py).

``BENCH_MODE=host``: the single-chip host-orchestrated tile path
(``pipelines.fusion.run_fusion3d_tile``) for comparison.

``BENCH_MODE=knn``: round-1's registration-core throughput (1M-point
exact radius-bounded 1-NN + piecewise displacement solve, Mpts/s).

Timing note: results are synced by device→host transfer (``np.asarray``)
— on the tunnelled TPU backend ``block_until_ready`` returns at
dispatch-ack, not completion. A keepalive thread pings the device during
the minutes-long cold Mosaic compiles so the tunnelled session cannot
idle out. The reported number is the best of 3 warm runs; the first run
of a process is compile-dominated (Mosaic kernels are not persistently
cached).

Prints exactly one JSON line.
Env: BENCH_MODE (e2e|e2e3d|host|knn), BENCH_N (e2e: CORE points per tile,
the halo ring is added on top — default 1_000_000, the reference's own
max_pts_per_tile bound (fusion_brienz.yaml:25) and the measured optimum of
the core-size curve (BASELINE.md r5: bigger cores amortise the fixed ±20 m
halo better); host: tile points; knn: epoch points, default 1_000_000).
BENCH_SPLIT=0 measures the reference's full-overlap redundancy instead of
the production core/halo query split; BENCH_SRC_MARGIN / BENCH_TGT_MARGIN
override the split margins (defaults 5 / 10 m = max_magnitude / 2x).
"""

from __future__ import annotations

import json
import os
import threading
import time

import numpy as np

TARGET_MINUTES = 5.0  # BASELINE.md "Rebuild targets": < 5 min on v5e-8
ASSUMED_CHIPS = 8


PLANTED_SHIFT = np.array([0.05, -0.02, 0.01], np.float32)


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
    moving = src[:, 0] > extent / 2
    tgt = src.copy()
    tgt[moving] += PLANTED_SHIFT
    return src, tgt, extent


def synth_overlap_tile(
    n_core: int, halo: float = 20.0, density: float = 100.0, seed: int = 0
):
    """Production-shaped tile: a core of ``n_core`` points plus its fixed
    +-``halo``-metre ring at the same density — the *overlap* cloud that
    ``list_tiles(cfg, overlap=True)`` feeds the pipeline at runtime
    (main_fusion.py:73), matching the reference's unit of work
    (/root/reference/main_fusion.py:128-144; halo from pcd_tiling.cpp:297-301).

    Returns (src, tgt, core_mask, moving_mask) — moving region is one half
    of the terrain (cuts through core and halo, as a real landslide would).
    """
    rng = np.random.default_rng(seed)
    side = float(np.sqrt(n_core / density))
    full = side + 2.0 * halo
    n_total = int(round(density * full * full))
    xy = rng.uniform(0, full, size=(n_total, 2))
    z = (
        np.sin(xy[:, 0] * 0.31) * 2.0
        + np.cos(xy[:, 1] * 0.17) * 3.0
        + rng.normal(scale=0.02, size=n_total)
    )
    src = np.column_stack([xy, z]).astype(np.float32)
    core = (
        (xy[:, 0] >= halo)
        & (xy[:, 0] < halo + side)
        & (xy[:, 1] >= halo)
        & (xy[:, 1] < halo + side)
    )
    moving = src[:, 0] > full / 2
    tgt = src.copy()
    tgt[moving] += PLANTED_SHIFT
    return src, tgt, core, moving


def synth_split_tile(
    n_core: int,
    src_margin: float,
    tgt_margin: float,
    halo: float = 20.0,
    density: float = 100.0,
    seed: int = 0,
):
    """The core/halo query-split tile the driver actually feeds when
    ``halo_query_split`` is on (the default — pipelines.driver.
    halo_split_spec): the full ±``halo`` overlap cloud cropped to the core
    bbox + ``src_margin`` for the source (query) side and + ``tgt_margin``
    for the target (support) side. Returns (src, tgt, core_mask_src,
    moving_mask_src)."""
    src, tgt, core, moving = synth_overlap_tile(
        n_core, halo=halo, density=density, seed=seed
    )
    side = float(np.sqrt(n_core / density))
    lo, hi = halo, halo + side

    def crop(m):
        xy = src[:, :2]
        return (
            (xy[:, 0] >= lo - m)
            & (xy[:, 0] < hi + m)
            & (xy[:, 1] >= lo - m)
            & (xy[:, 1] < hi + m)
        )

    ks = crop(src_margin)
    kt = crop(tgt_margin)
    return src[ks], tgt[kt], core[ks], moving[ks]


def _keepalive():
    import jax
    import jax.numpy as jnp

    stop = threading.Event()

    def loop():
        x = jnp.ones((8,))
        while not stop.is_set():
            try:
                float(jnp.sum(x))
            except Exception:
                pass
            stop.wait(20)

    threading.Thread(target=loop, daemon=True).start()
    return stop


def _models():
    import jax

    from fusion4landslide_tpu.models.aggregation import ClusterFeatureNet
    from fusion4landslide_tpu.models.dips import PointNetFeature

    dips_params = PointNetFeature(dtype="bfloat16").init(
        jax.random.PRNGKey(0), np.zeros((2, 256, 3), np.float32)
    )
    agg_params = ClusterFeatureNet().init(
        jax.random.PRNGKey(1),
        np.zeros((2, 8, 64), np.float32),
        np.ones((2, 8), bool),
    )
    return dips_params, agg_params


IMG_SIZE = (4096, 4096)  # 4K imagery per the BASELINE.json north star


def synth_image_channel(src: np.ndarray, tgt: np.ndarray, n_matches: int):
    """4K camera above the tile + dense pixel matches through it (the
    shape/scale of an EfficientLoFTR output on an embedded 4K image pair)."""
    import jax.numpy as jnp

    from fusion4landslide_tpu.image.geometry import project_points

    h, w = IMG_SIZE
    lo = src.min(axis=0)
    hi = src.max(axis=0)
    mid = (lo + hi) / 2
    span = float(max(hi[0] - lo[0], hi[1] - lo[1], 1.0))
    K = np.array(
        [[4000.0, 0, w / 2], [0, 4000.0, h / 2], [0, 0, 1.0]], np.float32
    )
    E = np.eye(4, dtype=np.float32)
    E[:3, 3] = [-mid[0], -mid[1], 1.2 * span - mid[2]]
    stride = max(1, src.shape[0] // n_matches)
    sub = np.arange(0, src.shape[0], stride)
    uv_s, _, ok_s = project_points(
        jnp.asarray(src[sub]), jnp.asarray(E), jnp.asarray(K), IMG_SIZE,
        v_flip=True,
    )
    uv_t, _, ok_t = project_points(
        jnp.asarray(tgt[sub]), jnp.asarray(E), jnp.asarray(K), IMG_SIZE,
        v_flip=True,
    )
    keep = np.asarray(ok_s & ok_t)
    pix = np.concatenate(
        [np.asarray(uv_s)[keep], np.asarray(uv_t)[keep]], axis=1
    ).astype(np.float32)
    m_per_px = float(E[2, 3] + mid[2]) / 4000.0  # depth / focal (nadir)
    return pix, K, E, m_per_px


def bench_e2e(n_core: int, with_rgb: bool) -> dict:
    """Warm per-tile seconds of the sharded fusion device step on a
    PRODUCTION-SHAPED tile — a core of ``n_core`` points plus its fixed
    +-20 m halo ring, i.e. the overlap cloud ``main_fusion.py`` actually
    feeds per tile — running the full RGB+3D method (in-step 2D pixel
    channel, ``with_rgb=True``) or the 3D-only method. The per-epoch
    dense image matcher runs once per image pair (a handful per epoch),
    not per tile, so it amortises to noise over the tile count; the
    per-tile 2D channel (projection, chaining, vote union, second fine
    channel) is IN the measured step. Extrapolation divides the epoch
    into 50e6/n_core tiles, each paying the halo-inclusive step cost."""
    import jax
    import jax.numpy as jnp

    from fusion4landslide_tpu.ops.segments import bucket_size
    from fusion4landslide_tpu.parallel import (
        make_sharded_fusion3d_step,
        tile_mesh,
    )

    stop = _keepalive()
    dips_params, agg_params = _models()
    halo = float(os.environ.get("BENCH_HALO", 20.0))
    density = float(os.environ.get("BENCH_DENSITY", 100.0))
    max_mag = 5.0  # Brienz max_magnitude (fusion_brienz.yaml:96)
    # Core/halo query split (the driver default, pipelines.driver.
    # halo_split_spec): the measured tile is the cropped pair the real
    # driver feeds per tile. BENCH_SPLIT=0 measures the reference's
    # full-overlap redundancy (halo_query_split: false) instead.
    split = os.environ.get("BENCH_SPLIT", "1") == "1"
    if split:
        # The 3D-only mode runs random-init descriptor weights, whose
        # exact-geometry matching needs identical src/tgt crops — use the
        # (conservative, more work) symmetric target margin on both sides
        # there. The RGB headline measures the production-default
        # asymmetric margins (halo_split_spec): its 2D vote channel, like
        # trained descriptors, is robust to differing crops.
        tgt_margin = float(os.environ.get("BENCH_TGT_MARGIN", 2 * max_mag))
        src_margin = float(
            os.environ.get(
                "BENCH_SRC_MARGIN", max_mag if with_rgb else tgt_margin
            )
        )
        src, tgt, core, moving = synth_split_tile(
            n_core, src_margin, tgt_margin, halo=halo, density=density
        )
    else:
        src, tgt, core, moving = synth_overlap_tile(
            n_core, halo=halo, density=density
        )
    n = len(src)  # source (query) points: core + margin ring
    mt = len(tgt)  # target (support) points
    N = bucket_size(n)
    M = bucket_size(mt)
    c = src.mean(axis=0)
    sb = np.zeros((1, N, 3), np.float32)
    sb[0, :n] = src - c
    tb = np.zeros((1, M, 3), np.float32)
    tb[0, :mt] = tgt - c
    m = np.zeros((1, N), bool)
    m[0, :n] = True
    mm = np.zeros((1, M), bool)
    mm[0, :mt] = True

    # Production statics (fusion_brienz-class config; bf16 descriptor
    # activations — recommended production precision, match recovery
    # verified identical on the synthetic drives).
    statics = dict(
        levels=(1, 2, 3),
        k_max=512,
        patch_points=256,
        chunk=2048,
        sv_cap=max(bucket_size(max(N // 16, 1)), 64),
        sv_cap_tgt=max(bucket_size(max(M // 16, 1)), 64),
        member_cap=512,
        agg_max_points=512,
        small_patch=10,
        with_sparse=True,
        with_tgt2src=False,
        feat_dtype="bfloat16",
    )
    if with_rgb:
        statics.update(image_size=IMG_SIZE, v_flip=True)
    step = make_sharded_fusion3d_step(
        tile_mesh(1),
        dips_params,
        agg_params,
        with_image_inputs=with_rgb,
        **statics,
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    scal = lambda v, dt=jnp.float32: jnp.full((1,), v, dt)
    args = (
        jnp.asarray(sb), jnp.asarray(m), jnp.asarray(tb), jnp.asarray(mm),
        keys,
        scal(max_mag), scal(0.1), scal(0.1),
        scal(10, jnp.int32), scal(10, jnp.int32), scal(0.5), scal(0.15),
    )
    m_per_px = 0.0
    if with_rgb:
        # Pixel matches are image-level; derive them from the source crop
        # and its true displaced positions (src/tgt crops are different
        # point subsets under the split, so pairing src[i]↔tgt[i] would be
        # wrong).
        tgt_of_src = src.copy()
        tgt_of_src[moving] += PLANTED_SHIFT
        pix, K, E, m_per_px = synth_image_channel(
            src, tgt_of_src, n_matches=n // 2
        )
        Pc = bucket_size(len(pix))
        pixb = np.zeros((1, 1, Pc, 4), np.float32)
        pixb[0, 0, : len(pix)] = pix
        args = args + (
            jnp.asarray(pixb),
            jnp.full((1, 1), len(pix), jnp.int32),
            jnp.asarray(K)[None],
            jnp.asarray(E)[None, None],
            jnp.asarray(E)[None, None],
            jnp.asarray(c, jnp.float32)[None],
            scal(5.0),
        )
    out = step(*args)
    np.asarray(out.valid[0, :8])  # cold (compile) run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = step(*args)
        v = np.asarray(out.valid)
        best = min(best, time.perf_counter() - t0)
    moved = np.asarray(out.moved[0, :n])
    stop.set()
    ok = v[0, :n].astype(bool)
    static = core & ~moving
    if with_rgb:
        # The 2D vote channel matches every patch on this scene.
        assert float(ok[core].mean()) > 0.9
    else:
        # 3D-only coarse matching runs with random-init descriptor weights
        # here; the exact-geometry (static) half must still fully resolve
        # — its descriptors are bit-identical across epochs.
        assert float(ok[static].mean()) > 0.9
    # Self-check: the step must recover the planted displacement field
    # (moving half shifted by PLANTED_SHIFT, static half zero). The 3D
    # channel's floor is ~voxel-quantisation noise (<2 mm at this
    # density); the RGB method adds the reference's pixel→voxel NN
    # chaining tolerance (pixel_thres=5 px, base:387-431), whose metric
    # error scales with metres-per-pixel — measured coefficient ~0.4,
    # asserted at 0.7 for headroom.
    tol = 2e-3 + 0.7 * m_per_px
    disp = moved - sb[0, :n]
    err_mov = np.linalg.norm(
        disp[core & moving & ok] - PLANTED_SHIFT, axis=1
    )
    err_sta = np.linalg.norm(disp[static & ok], axis=1)
    import sys

    print(
        f"# recovery: median err moving {np.median(err_mov):.2e} m, "
        f"static {np.median(err_sta):.2e} m (tol {tol:.2e}), core "
        f"assigned {ok[core].mean():.3f}, src {n} pts in bucket {N}, "
        f"tgt {mt} pts in bucket {M}, split={split}, best {best:.3f} s",
        file=sys.stderr,
    )
    if err_mov.size:
        assert float(np.median(err_mov)) < tol, np.median(err_mov)
    assert float(np.median(err_sta)) < tol, np.median(err_sta)
    minutes = best * (50e6 / n_core) / ASSUMED_CHIPS / 60.0
    return {
        "metric": (
            "fusion_rgb3d_epoch_pair_50M_v5e8_extrapolated"
            if with_rgb
            else "fusion3d_epoch_pair_50M_v5e8_extrapolated"
        ),
        "value": round(minutes, 2),
        "unit": "min",
        "vs_baseline": round(TARGET_MINUTES / minutes, 3),
    }


def bench_host(n: int) -> dict:
    """Single-chip host-orchestrated tile path (per-tile artifacts and
    caching included), for comparison with the sharded step."""
    from fusion4landslide_tpu.pipelines.fusion import run_fusion3d_tile

    stop = _keepalive()
    dips_params, agg_params = _models()
    src, tgt, extent = synth_epoch_pair(n)
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
        "feat_dtype": "bfloat16",
        "output_dir": "/tmp/f4l_bench",
        "output_folder": "run",
        "dataset": "brienz_tls",
    }
    best = float("inf")
    for k in range(2):
        t0 = time.perf_counter()
        out = run_fusion3d_tile(
            cfg, dips_params, agg_params, src, tgt, tile_id=f"bench{k}"
        )
        best = min(best, time.perf_counter() - t0)
    stop.set()
    assert out["assigned_fraction"] > 0.0
    minutes = best * (50e6 / n) / ASSUMED_CHIPS / 60.0
    return {
        "metric": "fusion3d_epoch_pair_50M_v5e8_host_path",
        "value": round(minutes, 2),
        "unit": "min",
        "vs_baseline": round(TARGET_MINUTES / minutes, 3),
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
    from fusion4landslide_tpu.utils.platform import (
        apply_platform_from_env,
        enable_compile_cache,
    )

    # Honour F4L_PLATFORM=cpu for smoke runs (the environment's site hook
    # force-selects the tunnelled TPU plugin otherwise).
    apply_platform_from_env()
    enable_compile_cache()
    mode = os.environ.get("BENCH_MODE", "e2e")
    if mode == "knn":
        result = bench_knn(int(os.environ.get("BENCH_N", 1_000_000)))
    elif mode == "host":
        result = bench_host(int(os.environ.get("BENCH_N", 100_000)))
    elif mode == "e2e3d":
        result = bench_e2e(
            int(os.environ.get("BENCH_N", 1_000_000)), with_rgb=False
        )
    else:
        # Headline: the full RGB+3D fusion method (the BASELINE.json
        # north-star workload), 2D pixel channel inside the device step.
        result = bench_e2e(
            int(os.environ.get("BENCH_N", 1_000_000)), with_rgb=True
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
