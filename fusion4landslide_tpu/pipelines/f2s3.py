"""F2S3 pipeline: learned per-point descriptors + feature-space kNN +
supervoxel-wise learned outlier filtering.

Capability parity with the reference ``Deformation_Analyze``
(src/f2s3.py:19-507, driven by main_f2s3.py:26-114):

1. ``compute_features`` (f2s3.py:91-154): DIPs descriptors over LRF patches,
   radius = sqrt(3)·10·median_resolution,
2. ``implement_segmentation`` (f2s3.py:166-238): supervoxels at radius
   max(sqrt(3)·10·res, voxel) (0.1 for the rockfall dataset), small patches
   (<= 10 points) removed,
3. ``correspondence_searching`` (f2s3.py:248-298): 1-NN in 64-d feature
   space (reference: hnswlib approximate; here exact blocked kNN on MXU),
4. ``correspondence_pruning`` (f2s3.py:321-479): per supervoxel, the
   FilteringNetwork scores correspondences; a robust Kabsch re-fit replaces
   target coordinates when it converges, else only scores > 0.99999 survive;
   then the max-magnitude gate, the 30x-median magnitude filter and the
   C2C gap fill.

TPU re-design highlights:
- features: one batched LRF + PointNet sweep (the reference uses 8 CPU
  DataLoader workers + per-batch GPU hops, f2s3.py:116-131),
- the per-supervoxel Python loop (f2s3.py:340-366) becomes a vmapped
  filter over a dense (S, P) member table; S is chunked via lax.map to
  bound memory,
- every stage is a pure function of padded fixed-shape arrays.
"""

from __future__ import annotations

import functools
import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from fusion4landslide_tpu.models.dips import PointNetFeature
from fusion4landslide_tpu.models.filtering import FilteringNetwork
from fusion4landslide_tpu.ops.knn import knn, median_nn_distance, nn1
from fusion4landslide_tpu.ops.lrf import extract_lrf_patches
from fusion4landslide_tpu.ops.kabsch import transform_points, weighted_kabsch
from fusion4landslide_tpu.ops.segments import bucket_size, label_members
from fusion4landslide_tpu.ops.supervoxel import supervoxel_segmentation

__all__ = [
    "compute_dips_features",
    "filter_supervoxel_buckets",
    "prune_supervoxel_correspondences",
    "run_f2s3_tile",
    "write_f2s3_outputs",
]


@functools.partial(jax.jit, static_argnames=("precision", "dtype"))
def _dips_chunk_sampled(dips_params, qc, xc, vc, radius, *, precision,
                        dtype=None):
    """One (chunk, P) pre-sampled LRF + PointNet chunk."""
    from fusion4landslide_tpu.ops.lrf import lrf_patches_from_neighbors

    patches = lrf_patches_from_neighbors(qc, xc, vc, radius)
    return PointNetFeature(precision=precision, dtype=dtype).apply(
        dips_params, patches
    )


@functools.partial(jax.jit, static_argnames=("precision", "dtype"))
def _dips_chunks_mapped(dips_params, qs, xs, vs, radius, *, precision,
                        dtype=None, n_valid=None):
    """All pre-sampled chunks in ONE dispatch (lax.map over the leading
    chunk axis). The caller buckets the point count, so the baked chunk
    count takes only a handful of values — one compile per bucket — while
    a host loop would pay a device-dispatch round trip per chunk (dozens
    of tunnel round trips per tile).

    ``n_valid`` (traced ok): exclusive upper bound on the valid row
    indices of the flattened query (every valid row must lie BEFORE it) —
    chunks that start at or past it skip the LRF + network entirely
    (lax.cond) and emit zeros. Bucket padding is 0-60% of the rows, all
    network FLOPs."""
    from fusion4landslide_tpu.ops.lrf import lrf_patches_from_neighbors

    model = PointNetFeature(precision=precision, dtype=dtype)

    def compute(args):
        qc, xc, vc = args
        patches = lrf_patches_from_neighbors(qc, xc, vc, radius)
        return model.apply(dips_params, patches)

    if n_valid is None:
        return jax.lax.map(compute, (qs, xs, vs))

    # Group the chunk axis into a handful of cond-gated lax.maps (one cond
    # per GROUP, not per chunk — a per-chunk cond inside the nested tile
    # maps blew XLA compile time up ~4x). Granularity: nc/4 chunks.
    nc, chunk = qs.shape[0], qs.shape[1]
    probe = jax.eval_shape(
        compute,
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype),
                     (qs, xs, vs)),
    )
    nv = jnp.asarray(n_valid, jnp.int32)
    # 16 cond groups (was 4): live labels are prefix-compacted, so the
    # real supervoxel count (~4-10x below the cap at production shapes)
    # occupies the first slots and finer groups skip more dead work —
    # measured fine 10.4 s -> see BASELINE r5. 32 groups were measured to
    # push the headline program 414 MB past HBM at the 1M-core buckets
    # (per-group cond branch buffers); 16 is the fitting optimum.
    gsize = -(-nc // min(16, nc))
    outs = []
    start = 0
    while start < nc:
        end = min(nc, start + gsize)
        sub = (qs[start:end], xs[start:end], vs[start:end])
        outs.append(
            jax.lax.cond(
                jnp.int32(start * chunk) < nv,
                lambda s: jax.lax.map(compute, s),
                lambda s: jnp.zeros(
                    (s[0].shape[0],) + probe.shape, probe.dtype
                ),
                sub,
            )
        )
        start = end
    return jnp.concatenate(outs, axis=0)


@functools.partial(
    jax.jit, static_argnames=("k_max", "patch_points", "precision", "dtype")
)
def _dips_chunk_knn(
    dips_params, qc, halo_pts, halo_mask, radius, key, *,
    k_max, patch_points, precision, dtype=None,
):
    """One kNN-based LRF + PointNet chunk (portable path)."""
    patches = extract_lrf_patches(
        qc, halo_pts, radius, key,
        k_max=k_max, num_points=patch_points, support_mask=halo_mask,
    )
    return PointNetFeature(precision=precision, dtype=dtype).apply(
        dips_params, patches
    )


def compute_dips_features(
    dips_params,
    core_pts: jax.Array,
    halo_pts: jax.Array,
    radius,
    key,
    *,
    k_max: int = 512,
    patch_points: int = 256,
    chunk: int = 2048,
    halo_mask: jax.Array | None = None,
    model: PointNetFeature | None = None,
    precision: str = "default",
    dtype: str | None = None,
    n_core: jax.Array | int | None = None,
) -> jax.Array:
    """(n, 64) DIPs descriptors for every core point.

    ``n_core``: exclusive upper bound on the valid row indices of
    ``core_pts`` when the caller passes a padded cloud (device tile
    steps); rows at or past it get zero descriptors without paying the
    network. Defaults to the input length (host callers pass exact-size
    clouds, so bucket padding always skips).

    Patches come from the halo cloud (f2s3.py:111-114 passes the overlap
    cloud as neighbourhood source). Work is chunked over query points with
    a HOST loop over one fixed-shape jitted chunk program, so tiles of any
    size share a single compilation.

    ``precision``: matmul precision for the descriptor network. 'default'
    (bf16-grade MXU rate) changes L2-normalised descriptors by < 2e-5
    cosine vs 'highest' and runs ~2x faster. ``dtype='bfloat16'``
    additionally keeps activations in bf16 (halves the network's HBM
    traffic; the descriptor is L2-normalised in f32 either way).
    """
    if model is not None:
        precision = model.precision
        dtype = model.dtype
    n = core_pts.shape[0]

    from fusion4landslide_tpu.ops.knn_pallas import pallas_available

    if pallas_available() and patch_points % 128 == 0:
        # TPU fast path: one grid-sampler sweep draws every patch's random
        # in-radius subset (no brute-force kNN, no top-k over k_max), then
        # the LRF math + network run chunked over fixed shapes.
        #
        # Compile stability: query/support counts are padded to
        # power-of-two buckets (the kernel compiles per shape); the radius
        # is a RUNTIME kernel payload (traced per-tile radii — including
        # the device tile steps' — share one compilation) and the sampling
        # seed is fixed (the per-candidate hash mixes point indices;
        # determinism matches the reference's setup_seed(0)).
        from fusion4landslide_tpu.ops.hashgrid import build_hash_grid
        from fusion4landslide_tpu.ops.hashgrid_pallas import (
            radius_sample_window,
        )
        from fusion4landslide_tpu.ops.segments import bucket_size

        nb = max(bucket_size(n), chunk)
        nb = -(-nb // chunk) * chunk
        q = jnp.pad(core_pts, ((0, nb - n), (0, 0)))
        n_chunks = nb // chunk
        m = halo_pts.shape[0]
        mb = bucket_size(m)
        halo_p = jnp.pad(halo_pts, ((0, mb - m), (0, 0)))
        hmask = (
            jnp.ones((m,), bool) if halo_mask is None
            else jnp.asarray(halo_mask).astype(bool)
        )
        hmask_p = jnp.pad(hmask, (0, mb - m))
        radius_q = jnp.asarray(radius, jnp.float32)

        grid = build_hash_grid(halo_p, radius_q, hmask_p)
        _, valid, xyz, _ = radius_sample_window(
            q, grid, radius_q, patch_points, 0
        )
        qs = q.reshape(n_chunks, chunk, 3)
        xs = xyz.reshape(n_chunks, chunk, patch_points, 3)
        vs = valid.reshape(n_chunks, chunk, patch_points)
        feats = _dips_chunks_mapped(
            dips_params, qs, xs, vs, radius_q,
            precision=precision, dtype=dtype,
            n_valid=n if n_core is None else n_core,
        )
        return feats.reshape(-1, feats.shape[-1])[:n]

    pad = (-n) % chunk
    q = jnp.pad(core_pts, ((0, pad), (0, 0)))
    n_chunks = q.shape[0] // chunk

    keys = jax.random.split(key, n_chunks)
    qs = q.reshape(n_chunks, chunk, 3)
    feats = [
        _dips_chunk_knn(
            dips_params, qs[i], halo_pts, halo_mask, radius, keys[i],
            k_max=k_max, patch_points=patch_points, precision=precision,
            dtype=dtype,
        )
        for i in range(n_chunks)
    ]
    return jnp.concatenate(feats, axis=0)[:n]


@functools.partial(
    jax.jit, static_argnames=("num_layers", "s_chunk", "rockfall")
)
def filter_supervoxel_buckets(
    filt_params,
    correspondences: jax.Array,  # (n, 6) flat point correspondences
    member_idx: jax.Array,  # (S, P) point index per supervoxel slot
    member_mask: jax.Array,  # (S, P)
    *,
    num_layers: int = 12,
    s_chunk: int = 64,
    rockfall: bool = False,
):
    """Vmapped FilteringNetwork + robust Kabsch re-fit over supervoxel
    buckets; chunked over S to bound the (S, P, 128) activations. The
    (chunk, P, 6) correspondence slab is gathered per chunk so the full
    (S, P, 6) table never materialises in HBM."""
    model = FilteringNetwork(num_layers=num_layers)
    S, P = member_idx.shape

    def one(args):
        mi, m = args  # (s_chunk, P), (s_chunk, P)
        c = jnp.take(correspondences, mi, axis=0)  # (s_chunk, P, 6)

        def single(ci, mi):
            scale = jnp.maximum(
                jnp.max(jnp.where(mi[:, None], jnp.abs(ci), 0.0)), 1e-12
            )
            scores = model.apply(filt_params, ci / scale, mi)
            x1, x2 = ci[:, :3], ci[:, 3:6]
            R, t, res, _ = weighted_kabsch(x1, x2, scores, mask=mi)
            coeff = 2.5 if rockfall else 1.0
            big = jnp.asarray(jnp.inf, res.dtype)
            rs = jnp.sort(jnp.where(mi, res, big))
            cnt = jnp.sum(mi)
            med = rs[jnp.maximum((cnt - 1) // 2, 0)]
            inlier = mi & (res < coeff * med)
            robust = (jnp.sum(inlier) >= 5) & (med < 0.5)
            R2, t2, _, _ = weighted_kabsch(
                x1, x2, inlier.astype(ci.dtype), mask=mi
            )
            R = jnp.where(robust, R2, R)
            t = jnp.where(robust, t2, t)
            # Robust path: replace target with the rigid prediction for all
            # points of the supervoxel and keep them all (f2s3.py:351-361);
            # else keep score > 0.99999 (f2s3.py:363).
            pred = transform_points(x1, R, t)
            new_tgt = jnp.where(robust, pred, x2)
            keep = jnp.where(robust, mi, mi & (scores > 0.99999))
            return new_tgt, keep, scores, robust

        return jax.vmap(single)(c, m)

    pad = (-S) % s_chunk
    idx_p = jnp.pad(member_idx, ((0, pad), (0, 0)))
    mask_p = jnp.pad(member_mask, ((0, pad), (0, 0)))
    nc = idx_p.shape[0] // s_chunk
    new_tgt, keep, scores, robust = jax.lax.map(
        one,
        (
            idx_p.reshape(nc, s_chunk, P),
            mask_p.reshape(nc, s_chunk, P),
        ),
    )
    return (
        new_tgt.reshape(-1, P, 3)[:S],
        keep.reshape(-1, P)[:S],
        scores.reshape(-1, P)[:S],
        robust.reshape(-1)[:S],
    )


def prune_supervoxel_correspondences(
    filt_params,
    correspondences: np.ndarray,  # (n, 6)
    labels: np.ndarray,  # (n,) supervoxel id, -1 = dropped
    *,
    rockfall: bool = False,
    refine_results: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Host orchestration of the per-supervoxel filter.

    Returns (updated correspondences (n, 6), keep mask (n,)).
    """
    n_labels = int(labels.max()) + 1 if labels.max() >= 0 else 0
    if n_labels == 0:
        return correspondences, np.zeros(len(labels), bool)
    num_layers = sum(
        1 for k in filt_params["params"] if str(k).startswith("block")
    )
    counts = np.bincount(labels[labels >= 0], minlength=n_labels)
    P = bucket_size(int(counts.max()))
    S = bucket_size(n_labels)
    member_idx, member_mask = label_members(
        jnp.asarray(labels, jnp.int32), S, P
    )
    corr_flat = jnp.asarray(correspondences, jnp.float32)
    new_tgt, keep, scores, robust = filter_supervoxel_buckets(
        filt_params, corr_flat, member_idx, member_mask,
        rockfall=rockfall, num_layers=num_layers,
    )
    if not refine_results:
        keep = member_mask & (scores > 0.99999)
        new_tgt = jnp.take(corr_flat, member_idx, axis=0)[..., 3:6]
    # Scatter back to per-point arrays.
    out = correspondences.copy()
    keep_pts = np.zeros(len(labels), bool)
    mi = np.asarray(member_idx)
    mm = np.asarray(member_mask)
    nt = np.asarray(new_tgt)
    kp = np.asarray(keep)
    flat_idx = mi[mm]
    out[flat_idx, 3:6] = nt[mm]
    keep_pts[flat_idx] = kp[mm]
    return out, keep_pts


def write_f2s3_outputs(
    cfg,
    tile_id,
    center: np.ndarray,
    s: np.ndarray,  # (n, 3) centred source points
    t: np.ndarray,  # (m, 3) centred target points
    pruned: np.ndarray,  # (n, 6) post-filter correspondences (centred)
    keep: np.ndarray,  # (n,) survived the learned pruning
    *,
    c2c: np.ndarray | None = None,  # (n,) spatial 1-NN distances (optional)
    logger=None,
) -> dict:
    """Write the f2s3 result tables for one tile (reference f2s3.py:369-477):
    max-magnitude gate, dvfs/dvfms (+CloudCompare visualization clamp),
    30x-median magnitude filter, C2C gap fill. Shared by the serial host
    path and the sharded multi-tile path."""
    from fusion4landslide_tpu.io.results import (
        save_txt,
        save_dvfms,
        visual_clamp_magnitude,
    )

    out_root = osp.join(
        str(cfg.get("output_dir", ".")), str(cfg.get("output_folder", "run"))
    )
    results_dir = osp.join(out_root, "results")
    os.makedirs(results_dir, exist_ok=True)

    filtered = pruned[keep]
    mags = np.linalg.norm(filtered[:, 3:6] - filtered[:, :3], axis=1)

    # Max-magnitude gate (f2s3.py:392-394).
    max_disp = float(cfg.get("max_disp_magnitude", 0) or 0)
    if max_disp > 0:
        sel = mags <= max_disp
        filtered, mags = filtered[sel], mags[sel]

    final = np.hstack([filtered[:, :3] + center, filtered[:, 3:6] + center])
    save_txt(osp.join(results_dir, f"f2s3_dvfs_of_tile_{tile_id}.txt"), final)
    dvfms = save_dvfms(
        osp.join(results_dir, f"f2s3_dvfms_of_tile_{tile_id}.txt"),
        final,
        mags,
    )
    if dvfms.shape[0] > 2:
        vis = visual_clamp_magnitude(dvfms, max_magnitude=5.0)
        save_txt(
            osp.join(
                results_dir, f"f2s3_dvfms_of_tile_{tile_id}_visualize_0_5.txt"
            ),
            vis,
        )

    # Median-magnitude filter: drop > 30x median (f2s3.py:427-449).
    if cfg.get("filter_median_magnitude", False) and mags.size:
        med = np.median(mags)
        sel = mags < 30 * med
        sub = np.hstack([final[sel][:, :3], mags[sel][:, None]])
        d = osp.join(results_dir, "filtered_by_magnitude")
        os.makedirs(d, exist_ok=True)
        save_txt(
            osp.join(d, f"f2s3_dvfms_filtered_by_median_mag_of_tile_{tile_id}.txt"),
            sub,
        )

    # C2C gap fill: C2C distance everywhere, learned magnitudes at kept
    # points (f2s3.py:452-477).
    if cfg.get("fill_gaps_c2c", False):
        if c2c is None:
            from fusion4landslide_tpu.ops.hashgrid import nn1_spatial

            c2c_sq, _ = nn1_spatial(jnp.asarray(s), jnp.asarray(t))
            c2c = np.sqrt(np.asarray(c2c_sq))
        else:
            c2c = np.asarray(c2c).copy()
        kept_idx = np.where(keep)[0]
        kmags = np.linalg.norm(
            pruned[kept_idx][:, 3:6] - pruned[kept_idx][:, :3], axis=1
        )
        if max_disp > 0:
            ksel = kmags <= max_disp
            kept_idx = kept_idx[ksel]
            kmags = kmags[ksel]
        c2c[kept_idx] = kmags
        d = osp.join(results_dir, "combined_with_c2c")
        os.makedirs(d, exist_ok=True)
        save_txt(
            osp.join(d, f"f2s3_dvfms_combined_with_c2c_of_tile_{tile_id}.txt"),
            np.hstack([s + center, c2c[:, None]]),
        )

    return {"dvfs": final, "magnitudes": mags}


def run_f2s3_tile(
    cfg,
    dips_params,
    filt_params,
    src_core: np.ndarray,
    tgt_core: np.ndarray,
    *,
    src_halo: np.ndarray | None = None,
    tgt_halo: np.ndarray | None = None,
    tile_id: int | str = 0,
    logger=None,
    rng_seed: int = 0,
) -> dict:
    """One tile of the F2S3 pipeline, host-orchestrated.

    ``cfg`` needs: voxel_size, max_disp_magnitude, filter_median_magnitude,
    fill_gaps_c2c, refine_results, n_normals, small_patch_removal,
    output_dir/output_folder (reference schema f2s3_brienz.yaml).
    Coordinates are centred here; outputs restore the original frame.
    """
    if src_halo is None:
        src_halo = src_core
    if tgt_halo is None:
        tgt_halo = tgt_core

    center = src_core.mean(axis=0)
    s = (src_core - center).astype(np.float32)
    t = (tgt_core - center).astype(np.float32)
    sh = (src_halo - center).astype(np.float32)
    th = (tgt_halo - center).astype(np.float32)

    key = jax.random.PRNGKey(rng_seed)
    k_feat_s, k_feat_t = jax.random.split(key)

    # 1. median resolution -> patch radius (f2s3.py:106, 481-507).
    res_s = float(median_nn_distance(jnp.asarray(s)))
    res_t = float(median_nn_distance(jnp.asarray(t)))
    median_res = max(res_s, res_t)
    radius = float(np.sqrt(3) * 10.0 * median_res)
    if logger:
        logger.info(
            "tile %s: median_res=%.4f, patch radius=%.4f", tile_id, median_res, radius
        )

    # 2. DIPs features — with the reference's artifact-level resume: cached
    # as features_tile_N.npz, recomputation skipped when feat_compute=False
    # (f2s3.py:97-101, 139-149).
    feat_cache = osp.join(
        str(cfg.get("output_dir", ".")),
        str(cfg.get("output_folder", "run")),
        "features",
        f"features_tile_{tile_id}.npz",
    )
    if not cfg.get("feat_compute", True) and osp.exists(feat_cache):
        cached = np.load(feat_cache)
        src_feat = cached["src_feat"]
        tgt_feat = cached["tgt_feat"]
        if logger:
            logger.info("tile %s: features loaded from %s", tile_id, feat_cache)
    else:
        feat_dtype = cfg.get("feat_dtype")
        src_feat = np.asarray(
            compute_dips_features(
                dips_params, jnp.asarray(s), jnp.asarray(sh), radius,
                k_feat_s, dtype=feat_dtype,
            )
        )
        tgt_feat = np.asarray(
            compute_dips_features(
                dips_params, jnp.asarray(t), jnp.asarray(th), radius,
                k_feat_t, dtype=feat_dtype,
            )
        )
        if cfg.get("save_interim", False):
            os.makedirs(osp.dirname(feat_cache), exist_ok=True)
            np.savez_compressed(feat_cache, src_feat=src_feat, tgt_feat=tgt_feat)

    # 3. Supervoxel segmentation of the source (f2s3.py:183-189).
    svl_radius = max(radius, float(cfg.get("voxel_size", 0.0)))
    if "rockfall" in str(cfg.get("output_dir", "")).lower() or str(
        cfg.get("dataset", "")
    ).lower().startswith("rockfall"):
        svl_radius = 0.1
    seg = supervoxel_segmentation(
        jnp.asarray(s), svl_radius, k_neighbors=int(cfg.get("n_normals", 30))
    )
    labels = np.asarray(seg.labels)
    # Small-patch removal (f2s3.py:222-225).
    min_count = 10 if cfg.get("small_patch_removal", True) else 1
    counts = np.bincount(labels[labels >= 0], minlength=int(seg.n_supervoxels))
    small = counts <= min_count
    labels = np.where((labels >= 0) & ~small[np.clip(labels, 0, None)], labels, -1)
    # compact labels
    uniq = np.unique(labels[labels >= 0])
    remap = np.full(int(labels.max()) + 1 if labels.max() >= 0 else 1, -1)
    remap[uniq] = np.arange(uniq.size)
    labels = np.where(labels >= 0, remap[np.clip(labels, 0, None)], -1)
    if logger:
        logger.info("tile %s: %d supervoxels kept", tile_id, uniq.size)

    # 4. Feature-space 1-NN correspondences (f2s3.py:273-285).
    _, nn_idx = nn1(jnp.asarray(src_feat), jnp.asarray(tgt_feat))
    nn_idx = np.asarray(nn_idx)
    correspondences = np.hstack([s, t[nn_idx]])

    from fusion4landslide_tpu.io.results import save_txt

    out_root = osp.join(
        str(cfg.get("output_dir", ".")), str(cfg.get("output_folder", "run"))
    )
    results_dir = osp.join(out_root, "results")
    os.makedirs(results_dir, exist_ok=True)

    # Pre-pruning interim dvfms (f2s3.py:286-294).
    mag0 = np.linalg.norm(correspondences[:, 3:6] - correspondences[:, :3], axis=1)
    interim = np.hstack([correspondences[:, :3] + center, mag0[:, None]])
    save_txt(
        osp.join(results_dir, f"f2s3_dvfms_without_pruning_of_tile_{tile_id}.txt"),
        interim,
    )

    # 5. Per-supervoxel pruning (f2s3.py:321-366).
    rockfall = svl_radius == 0.1
    pruned, keep = prune_supervoxel_correspondences(
        filt_params,
        correspondences,
        labels,
        rockfall=rockfall,
        refine_results=bool(cfg.get("refine_results", True)),
    )

    # 6.-8. Result tables: gates, dvf(m)s, median filter, C2C fill.
    written = write_f2s3_outputs(
        cfg, tile_id, center, s, t, pruned, keep, logger=logger
    )

    return {
        "dvfs": written["dvfs"],
        "magnitudes": written["magnitudes"],
        "keep": keep,
        "labels": labels,
        "src_feat": src_feat,
        "tgt_feat": tgt_feat,
    }
