"""Partition-file IO: supervoxel/superpoint label tables.

Capability parity with the reference's partition artifacts:

- supervoxel segmentation writes ``x y z r g b label`` text
  (cpp_core/supervoxel_segmentation/supervoxel.cpp:45-64),
- the SuperPoint-Transformer bridge writes 15-column multi-level tables
  ``xyz + (r g b label) x 3 levels`` named
  ``partition_of_input_{src,tgt}_tile_N.txt``
  (src/superpoint_partition.py:139-162), consumed by ``load_partition``
  with the column rule ``label_col = 2 + 4*level``
  (src/coarse_to_fine_matching_base.py:1261-1276).

The reference's SPT stack itself (hydra + FRNN + cut-pursuit submodule)
is not ported; these readers/writers make precomputed superpoint partitions
usable by the fusion pipeline (``partition_type: superpoint``) and make our
supervoxel output inspectable by the same tools.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "write_supervoxel_txt",
    "read_supervoxel_txt",
    "write_superpoint_partition",
    "read_superpoint_partition",
    "load_or_generate_partition_labels",
]


def write_supervoxel_txt(
    path: str,
    points: np.ndarray,
    labels: np.ndarray,
    colors: np.ndarray | None = None,
    seed: int = 0,
) -> None:
    """``x y z r g b label`` rows; colours are random per label when not
    given (matching the C++ WritePoints visualisation colouring)."""
    labels = np.asarray(labels).astype(np.int64)
    if colors is None:
        rng = np.random.default_rng(seed)
        n_lab = int(labels.max()) + 1 if labels.size and labels.max() >= 0 else 1
        palette = rng.integers(0, 256, size=(max(n_lab, 1), 3))
        colors = palette[np.clip(labels, 0, None)]
        colors[labels < 0] = 0
    table = np.column_stack([points, colors, labels])
    np.savetxt(path, table, fmt="%.6f %.6f %.6f %d %d %d %d")


def read_supervoxel_txt(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Returns (points (n, 3), labels (n,))."""
    data = np.loadtxt(path, ndmin=2)
    return data[:, :3], data[:, -1].astype(np.int64)


def write_superpoint_partition(
    path: str,
    points: np.ndarray,
    level_labels: list[np.ndarray],
    seed: int = 0,
) -> None:
    """15-column table: xyz + (r g b label) per level (3 levels).

    Fewer than 3 levels are repeated to fill the layout, mirroring the
    fixed-width format the reference's ``load_partition`` indexes into.
    """
    rng = np.random.default_rng(seed)
    levels = list(level_labels)
    while len(levels) < 3:
        levels.append(levels[-1])
    cols = [points]
    for lab in levels[:3]:
        lab = np.asarray(lab).astype(np.int64)
        n_lab = int(lab.max()) + 1 if lab.size and lab.max() >= 0 else 1
        palette = rng.integers(0, 256, size=(max(n_lab, 1), 3))
        rgb = palette[np.clip(lab, 0, None)]
        rgb[lab < 0] = 0
        cols += [rgb, lab[:, None]]
    table = np.hstack(cols)
    fmt = "%.6f %.6f %.6f" + " %d %d %d %d" * 3
    np.savetxt(path, table, fmt=fmt)


def read_superpoint_partition(path: str, level: int) -> tuple[np.ndarray, np.ndarray]:
    """Read level ``1..3`` labels: column ``2 + 4*level``
    (base:1261-1276). Returns (points (n, 3), labels (n,))."""
    data = np.loadtxt(path, ndmin=2)
    col = 2 + 4 * int(level)
    if col >= data.shape[1]:
        raise ValueError(
            f"partition file has {data.shape[1]} columns; level {level} "
            f"needs column {col}"
        )
    return data[:, :3], data[:, col].astype(np.int64)


def load_or_generate_partition_labels(
    out_root: str,
    partition_type: str,
    tile_id,
    which: str,
    points: np.ndarray,
    levels,
    logger=None,
) -> list[np.ndarray]:
    """Per-point labels for each requested partition level of one tile
    cloud, from the reference 15-column artifact
    (``{partition_type}_partition/partition_of_input_{which}_tile_N.txt``).

    Single source of truth for both the host tile loop
    (``pipelines.fusion``) and the sharded runner (``parallel.pipeline``),
    so mesh on/off always read/generate identical partition files. When
    the artifact is absent, the native superpoint hierarchy is generated
    (``ops.superpoint``), the 3-level table is written for resume, and the
    freshly computed labels are returned directly; when present, the table
    is parsed ONCE and every requested level sliced from it (the artifact
    format carries exactly 3 levels — ``base:1261-1276`` — so levels
    outside 1..3 are rejected up front)."""
    import os
    import os.path as osp

    lv = [int(level) for level in levels]
    bad = [level for level in lv if not 1 <= level <= 3]
    if bad:
        raise ValueError(
            f"partition levels {bad} out of range: the superpoint artifact "
            "format carries exactly 3 levels (15 columns, base:1261-1276)"
        )
    path = osp.join(
        out_root,
        f"{partition_type}_partition",
        f"partition_of_input_{which}_tile_{tile_id}.txt",
    )
    if not osp.exists(path):
        from fusion4landslide_tpu.ops.superpoint import (
            generate_superpoint_partition,
        )

        if logger:
            logger.info(
                "partition_type=%s: generating native partition for "
                "tile %s (%s)", partition_type, tile_id, which,
            )
        os.makedirs(osp.dirname(path), exist_ok=True)
        labs = generate_superpoint_partition(
            np.asarray(points), path, levels=3
        )
        return [np.asarray(labs[level - 1]).astype(np.int64) for level in lv]
    data = np.loadtxt(path, ndmin=2)
    out = []
    for level in lv:
        col = 2 + 4 * level
        if col >= data.shape[1]:
            raise ValueError(
                f"partition file has {data.shape[1]} columns; level "
                f"{level} needs column {col}"
            )
        out.append(data[:, col].astype(np.int64))
    return out
