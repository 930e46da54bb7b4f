"""Device-resident F2S3 tile step: the full per-tile pipeline (median
resolution → DIPs features → supervoxel segmentation → feature-space 1-NN →
learned per-supervoxel pruning → magnitude gates) as ONE pure, fixed-shape,
jittable function of padded tile tensors.

This is the multi-chip execution path for the real pipeline (the reference
runs a serial Python loop over tiles, main_f2s3.py:66-89; the host path here
is ``pipelines.f2s3.run_f2s3_tile``). Because every stage is traced, a batch
of padded tiles ``(T, N, 3)`` can be vmapped and shard_mapped over a device
mesh — see ``parallel.pipeline.make_sharded_f2s3_step`` — with tiles as
embarrassingly parallel shards (the ±20 m tiling halo makes per-tile matching
exact with zero cross-tile communication,
cpp_core/pcd_tiling/pcd_tiling.cpp:295-330).

Differences from the host path, by construction of fixed shapes:
- neighbour search uses the portable blocked-kNN primitives (traced per-tile
  radii; the Pallas grid kernels need concrete cell sizes and stay on the
  single-chip host path),
- supervoxel buckets use static caps ``(sv_cap, member_cap)``; supervoxels
  past the cap, or members past ``member_cap`` within one supervoxel, are
  dropped from the learned filter (their points report ``keep=False``). The
  returned ``n_dropped`` counts such points so the host can warn. Size the
  caps from the tile budget: with the reference radius sqrt(3)·10·res a
  supervoxel holds hundreds of points, so ``sv_cap = N // 16`` and
  ``member_cap = 1024`` lose nothing in practice.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fusion4landslide_tpu.models.dips import PointNetFeature
from fusion4landslide_tpu.ops.knn import nn1
from fusion4landslide_tpu.ops.segments import label_members
from fusion4landslide_tpu.ops.supervoxel import supervoxel_segmentation
from fusion4landslide_tpu.pipelines.f2s3 import filter_supervoxel_buckets

__all__ = [
    "F2S3TileResult",
    "f2s3_tile_step",
    "dips_features_device",
    "masked_median",
    "drop_small_and_compact",
]


def masked_median(vals: jax.Array, valid: jax.Array) -> jax.Array:
    """Median of ``vals`` over ``valid`` rows with a traced count."""
    s = jnp.sort(jnp.where(valid, vals, jnp.inf))
    cnt = jnp.sum(valid)
    lo = jnp.maximum((cnt - 1) // 2, 0)
    hi = jnp.maximum(cnt // 2, 0)
    return 0.5 * (jnp.take(s, lo) + jnp.take(s, hi))


def dips_features_device(
    dips_params,
    query: jax.Array,  # (n, 3)
    support: jax.Array,  # (m, 3)
    support_mask: jax.Array | None,
    radius: jax.Array,
    key: jax.Array,
    *,
    k_max: int = 512,
    patch_points: int = 256,
    chunk: int = 2048,
    sample_cap: int = 48,
    sample_priority: str = "knn",
    precision: str = "default",
    dtype: str | None = None,
    query_count: jax.Array | None = None,
) -> jax.Array:
    """(n, 64) DIPs descriptors, fully traceable (traced ``radius``).

    ``query_count``: exclusive upper bound on the valid row indices of a
    padded ``query`` cloud (last valid index + 1 — NOT the mask sum, which
    undercounts when the mask has interior holes); chunks at or past it
    are all-padding and skip the network (see ``compute_dips_features``).

    Same math as ``pipelines.f2s3.compute_dips_features`` (reference
    src/f2s3.py:91-154 + src/data_loader.py:42-106). This replaces the
    round-2 blocked O(n·m) kNN that capped sharded tiles at ~64k points
    with radius-growing grid searches (``ops.hashgrid``).

    ``sample_priority``:

    - ``'knn'`` (default): the ``k_max`` *nearest* in-radius neighbours
      (exact, grid-accelerated) with a random ``patch_points`` subsample —
      the same semantics as the round-2 device path. Deterministic support
      sets keep descriptors repeatable across the two epochs' clouds.
    - ``'random'``: a uniform random ball subsample via the traced grid
      sampler — the reference's ``np.random.choice`` over the full ball
      (data_loader.py:104) and the host TPU Pallas path. Statistically
      sound at the production ``patch_points=256``; noisier for tiny test
      patches, and per-cloud sampling noise decorrelates the two epochs'
      descriptors slightly.
    """
    from fusion4landslide_tpu.ops.knn_pallas import pallas_available

    if pallas_available() and patch_points % 128 == 0:
        # TPU: the Pallas window sampler (runtime radius) — identical to
        # the host fast path, one Mosaic compile per shape bucket.
        from fusion4landslide_tpu.pipelines.f2s3 import compute_dips_features

        return compute_dips_features(
            dips_params, query, support, radius, key,
            k_max=k_max, patch_points=patch_points, chunk=chunk,
            halo_mask=support_mask, precision=precision, dtype=dtype,
            n_core=query_count,
        )

    model = PointNetFeature(precision=precision, dtype=dtype)
    n = query.shape[0]
    m = support.shape[0]
    chunk = min(chunk, n)

    def _zero_past_bound(feats):
        # Backend-identical ``query_count`` semantics: the TPU branch above
        # SKIPS all-padding chunks (zero descriptors); the XLA grid
        # branches compute everything in one map (cond-gating here only
        # bloats the already-slow CPU-mesh compile), so zero the same rows
        # after the fact.
        if query_count is None:
            return feats
        keep = jnp.arange(feats.shape[0]) < query_count
        return jnp.where(keep[:, None], feats, jnp.zeros((), feats.dtype))
    pad = (-n) % chunk
    q = jnp.pad(query, ((0, pad), (0, 0)))
    n_chunks = q.shape[0] // chunk

    from fusion4landslide_tpu.ops.hashgrid import (
        build_hash_grid,
        knn_grid_traced,
        radius_sample_grid,
    )
    from fusion4landslide_tpu.ops.lrf import (
        lrf_patches_from_neighbors,
        lrf_patches_from_knn,
    )

    if sample_priority == "random":
        k_perm, k_seed = jax.random.split(key)
        perm = jax.random.permutation(k_perm, m)
        sup_p = jnp.take(support, perm, axis=0)
        msk_p = (
            None
            if support_mask is None
            else jnp.take(jnp.asarray(support_mask).astype(bool), perm)
        )
        grid = build_hash_grid(sup_p, radius, msk_p)
        seed = jax.random.randint(
            k_seed, (), 0, jnp.iinfo(jnp.int32).max
        ).astype(jnp.uint32)

        def one_rand(qc):
            coords, valid = radius_sample_grid(
                qc, grid, radius, seed,
                num_samples=patch_points, cap=sample_cap, query_block=chunk,
            )
            patches = lrf_patches_from_neighbors(qc, coords, valid, radius)
            return model.apply(dips_params, patches)

        feats = jax.lax.map(one_rand, q.reshape(n_chunks, chunk, 3))
        return _zero_past_bound(feats.reshape(-1, feats.shape[-1])[:n])

    # 'knn': exact nearest-k_max within the radius, one growing-grid search
    # over ALL queries (the (n, k_max) neighbour table lives in HBM once),
    # then LRF + network chunked.
    cap = max(sample_cap, -(-k_max // 27))
    sqd, idx = knn_grid_traced(
        q, support, k_max, ref_mask=support_mask, r_max=radius, cap=cap,
    )
    keys = jax.random.split(key, n_chunks)

    def one(args):
        qc, dc, ic, kc = args
        patches = lrf_patches_from_knn(
            qc, support, dc, ic, radius, kc, num_points=patch_points
        )
        return model.apply(dips_params, patches)

    feats = jax.lax.map(
        one,
        (
            q.reshape(n_chunks, chunk, 3),
            sqd.reshape(n_chunks, chunk, k_max),
            idx.reshape(n_chunks, chunk, k_max),
            keys,
        ),
    )
    return _zero_past_bound(feats.reshape(-1, feats.shape[-1])[:n])


def drop_small_and_compact(
    labels: jax.Array, valid: jax.Array, min_count: int | jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Small-patch removal + label compaction, on device.

    Labels with <= min_count valid members become -1; survivors are
    renumbered 0..K-1 preserving order (reference small-patch removal,
    src/f2s3.py:222-225 / base:1309-1321).

    Returns (new_labels (n,), n_labels ()).
    """
    n = labels.shape[0]
    has = valid & (labels >= 0)
    lab0 = jnp.where(has, labels, 0)
    counts = jax.ops.segment_sum(
        has.astype(jnp.int32), lab0, num_segments=n
    )
    ok = has & (jnp.take(counts, lab0) > min_count)
    used = jnp.zeros((n,), jnp.int32).at[lab0].max(
        ok.astype(jnp.int32), mode="drop"
    )
    remap = jnp.cumsum(used) - 1
    new = jnp.where(ok, jnp.take(remap, lab0), -1)
    return new.astype(jnp.int32), jnp.sum(used)


class F2S3TileResult(NamedTuple):
    new_tgt: jax.Array  # (N, 3) matched/rigid-predicted target per src point
    keep: jax.Array  # (N,) survived learned pruning + max-magnitude gate
    mag: jax.Array  # (N,) |new_tgt - src| (0 where not kept)
    nn_tgt: jax.Array  # (N, 3) pre-pruning 1-NN target (interim artifact)
    labels: jax.Array  # (N,) supervoxel label per src point (-1 dropped)
    median_res: jax.Array  # () max(src, tgt) median resolution
    c2c: jax.Array  # (N,) spatial 1-NN distance src->tgt (inf if disabled)
    n_dropped: jax.Array  # () points lost to the static supervoxel caps


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_max",
        "patch_points",
        "chunk",
        "k_neighbors",
        "sv_cap",
        "member_cap",
        "rockfall",
        "refine_results",
        "small_patch_removal",
        "num_layers",
        "with_c2c",
        "precision",
        "feat_dtype",
        "sample_cap",
        "sample_priority",
    ),
)
def f2s3_tile_step(
    dips_params,
    filt_params,
    src: jax.Array,  # (N, 3) centred, padded
    smask: jax.Array,  # (N,)
    tgt: jax.Array,  # (M, 3) centred, padded
    tmask: jax.Array,  # (M,)
    key: jax.Array,
    max_disp: jax.Array | float = 0.0,
    voxel_size: jax.Array | float = 0.0,
    *,
    k_max: int = 512,
    patch_points: int = 256,
    chunk: int = 2048,
    k_neighbors: int = 30,
    sv_cap: int = 1024,
    member_cap: int = 512,
    rockfall: bool = False,
    refine_results: bool = True,
    small_patch_removal: bool = True,
    num_layers: int = 12,
    with_c2c: bool = True,
    precision: str = "default",
    feat_dtype: str | None = None,
    sample_cap: int = 48,
    sample_priority: str = "knn",
) -> F2S3TileResult:
    """One F2S3 tile, entirely on device (reference stage map in the module
    docstring of ``pipelines.f2s3``; per-stage citations there).

    ``max_disp`` <= 0 disables the magnitude gate. ``rockfall`` pins the
    supervoxel radius to 0.1 (f2s3.py:185-186).
    """
    f32 = src.dtype
    smask = smask.astype(bool)
    tmask = tmask.astype(bool)
    k1, k2 = jax.random.split(key)

    # 1. median resolution -> patch radius (f2s3.py:106, 481-507) — traced
    # grid search (the blocked O(N·M) kNN capped sharded tiles at ~64k).
    from fusion4landslide_tpu.ops.hashgrid import median_nn_distance_traced

    res_s = median_nn_distance_traced(src, smask)
    res_t = median_nn_distance_traced(tgt, tmask)
    median_res = jnp.maximum(res_s, res_t)
    radius = jnp.sqrt(3.0) * 10.0 * median_res

    # 2. DIPs descriptors (f2s3.py:91-154).
    feat_kw = dict(
        k_max=k_max, patch_points=patch_points, chunk=chunk,
        precision=precision, dtype=feat_dtype,
        sample_cap=sample_cap, sample_priority=sample_priority,
    )
    # Chunks past the LAST valid row skip the descriptor network. Using
    # last-valid-index+1 (not sum) keeps this correct for masks with
    # interior holes; for the sharded batches' end-padded masks the two
    # coincide and every all-padding chunk is skipped.
    idx_s = jnp.arange(src.shape[0], dtype=jnp.int32)
    idx_t = jnp.arange(tgt.shape[0], dtype=jnp.int32)
    src_feat = dips_features_device(
        dips_params, src, src, smask, radius, k1,
        query_count=jnp.max(jnp.where(smask, idx_s + 1, 0)), **feat_kw
    )
    tgt_feat = dips_features_device(
        dips_params, tgt, tgt, tmask, radius, k2,
        query_count=jnp.max(jnp.where(tmask, idx_t + 1, 0)), **feat_kw
    )

    # 3. Supervoxel segmentation of the source (f2s3.py:183-189).
    if rockfall:
        svl_radius = jnp.asarray(0.1, f32)
    else:
        svl_radius = jnp.maximum(radius, jnp.asarray(voxel_size, f32))
    seg = supervoxel_segmentation(
        src, svl_radius, smask, k_neighbors=k_neighbors
    )
    min_count = 10 if small_patch_removal else 1
    labels, _ = drop_small_and_compact(seg.labels, smask, min_count)

    # 4. Feature-space 1-NN (f2s3.py:273-285); padded target rows masked.
    nn_sq, nn_idx = nn1(src_feat, tgt_feat, tmask)
    nn_tgt = jnp.take(tgt, nn_idx, axis=0)
    nn_ok = smask & jnp.isfinite(nn_sq)
    correspondences = jnp.concatenate([src, nn_tgt], axis=1)

    # 5. Per-supervoxel learned pruning (f2s3.py:321-366). Supervoxels past
    # sv_cap / members past member_cap fall out of the filter (keep=False).
    member_idx, member_mask = label_members(labels, sv_cap, member_cap)
    new_tgt_b, keep_b, scores_b, _ = filter_supervoxel_buckets(
        filt_params,
        correspondences,
        member_idx,
        member_mask,
        num_layers=num_layers,
        rockfall=rockfall,
    )
    if not refine_results:
        keep_b = member_mask & (scores_b > 0.99999)
        new_tgt_b = jnp.take(correspondences, member_idx, axis=0)[..., 3:6]

    n = src.shape[0]
    scatter_idx = jnp.where(member_mask, member_idx, n)
    new_tgt = nn_tgt.at[scatter_idx].set(new_tgt_b, mode="drop")
    keep = (
        jnp.zeros((n,), bool).at[scatter_idx].set(keep_b, mode="drop")
    )
    keep = keep & nn_ok
    in_filter = (
        jnp.zeros((n,), bool).at[scatter_idx].set(member_mask, mode="drop")
    )
    n_dropped = jnp.sum(smask & (labels >= 0) & ~in_filter)

    # 6. Max-magnitude gate (f2s3.py:392-394).
    mag = jnp.linalg.norm(new_tgt - src, axis=-1)
    max_disp = jnp.asarray(max_disp, f32)
    keep = keep & ((max_disp <= 0) | (mag <= max_disp))
    mag = jnp.where(keep, mag, 0.0)

    # 7. C2C spatial 1-NN for the gap fill (f2s3.py:452-477) — traced
    # radius-growing grid search (unbounded distances reached by doubling).
    if with_c2c:
        from fusion4landslide_tpu.ops.hashgrid import knn_grid_traced

        c2c_sq, _ = knn_grid_traced(
            src, tgt, 1, r0=4.0 * median_res, ref_mask=tmask,
            query_mask=smask, max_doublings=10,
        )
        c2c = jnp.sqrt(c2c_sq[:, 0])
    else:
        c2c = jnp.full((n,), jnp.inf, f32)

    return F2S3TileResult(
        new_tgt=new_tgt,
        keep=keep,
        mag=mag,
        nn_tgt=nn_tgt,
        labels=labels,
        median_res=median_res,
        c2c=c2c,
        n_dropped=n_dropped,
    )
