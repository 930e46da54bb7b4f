"""Camera metadata IO: intrinsics + dataset-specific extrinsic chains.

Capability parity with the reference's camera loading
(src/coarse_to_fine_matching_base.py:918-998):

- ``camera_intrinsic.txt`` — 3x3 K, space-delimited (base:920),
- ``rockfall_simulator``: per-epoch ``camera_extrinsic_epoch_{1,2}.txt``
  holding quaternion (w x y z? — the reference uses the first four values
  via its own quaternion_to_rotation_matrix, base:217-235) + translation;
  the world→camera extrinsic is the *inverse* of that pose (base:949-955),
- ``brienz``: SOP/COP/mounting transform chains, PRCS or SOCS coordinate
  frames (base:957-982),
- ``brienz_tls``: a single 4x4 camera pose per epoch, world→camera =
  inverse(pose) (base:984-993).
"""

from __future__ import annotations

import os.path as osp

import numpy as np

__all__ = [
    "quaternion_to_rotation_matrix",
    "load_intrinsic",
    "load_extrinsics",
]


def quaternion_to_rotation_matrix(q: np.ndarray) -> np.ndarray:
    """(w, x, y, z) quaternion → 3x3 rotation (base:217-235 convention)."""
    w, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def load_intrinsic(input_root: str) -> np.ndarray:
    return np.loadtxt(
        osp.join(input_root, "image", "camera_intrinsic.txt"), delimiter=" "
    )


def _pose_to_extrinsic(pose: np.ndarray) -> np.ndarray:
    return np.linalg.inv(pose)


def load_extrinsics(
    input_root: str,
    dataset: str,
    *,
    coord_type: str = "PRCS",
    src_pose: str | None = None,
    tgt_pose: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(src_extrinsic, tgt_extrinsic) 4x4 world→camera transforms."""
    tdir = osp.join(input_root, "image", "transformations")
    dataset = (dataset or "").lower()
    if dataset == "rockfall_simulator":
        out = []
        for epoch in (1, 2):
            q = np.loadtxt(osp.join(tdir, f"camera_extrinsic_epoch_{epoch}.txt"))
            pose = np.eye(4)
            pose[:3, :3] = quaternion_to_rotation_matrix(q[:4])
            pose[:3, 3] = q[4:7]
            out.append(_pose_to_extrinsic(pose))
        return out[0], out[1]
    if dataset == "brienz":
        sop_s = np.loadtxt(osp.join(tdir, "sop_transformation_200221.txt"), delimiter=" ")
        cop_s = np.loadtxt(osp.join(tdir, "cop_transformation_10_1_200221.txt"), delimiter=" ")
        sop_t = np.loadtxt(osp.join(tdir, "sop_transformation_201130.txt"), delimiter=" ")
        cop_t = np.loadtxt(osp.join(tdir, "cop_transformation_9_1_201130.txt"), delimiter=" ")
        mount = np.loadtxt(osp.join(tdir, "mounting_transformation.txt"), delimiter=",")
        if coord_type == "PRCS":
            e_s = mount @ np.linalg.inv(cop_s) @ np.linalg.inv(sop_s)
            e_t = mount @ np.linalg.inv(cop_t) @ np.linalg.inv(sop_t)
        elif coord_type == "SOCS":
            e_s = cop_s @ np.linalg.inv(mount)
            e_t = cop_t @ np.linalg.inv(mount)
        else:
            raise NotImplementedError(f"coord_type {coord_type}")
        return e_s, e_t
    if dataset == "brienz_tls":
        pose_s = np.loadtxt(osp.join(tdir, src_pose), delimiter=" ")
        pose_t = np.loadtxt(osp.join(tdir, tgt_pose), delimiter=" ")
        return _pose_to_extrinsic(pose_s), _pose_to_extrinsic(pose_t)
    raise NotImplementedError(f"dataset '{dataset}' camera extrinsics")
