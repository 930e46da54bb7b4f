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
    "load_intrinsic_pair",
    "load_extrinsics",
    "load_images_used",
    "count_in_frame",
    "select_best_images",
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


def load_intrinsic_pair(input_root: str) -> tuple[np.ndarray, np.ndarray]:
    """(K_src, K_tgt). The reference supports separate per-epoch intrinsics
    via ``camera_intrinsic_{src,tgt}.txt`` when ``camera_intrinsic.txt`` is
    absent (src/rgb_guided.py:1928-1935); with the single file both epochs
    share one K."""
    single = osp.join(input_root, "image", "camera_intrinsic.txt")
    if osp.exists(single):
        K = np.loadtxt(single, delimiter=" ")
        return K, K
    K_src = np.loadtxt(
        osp.join(input_root, "image", "camera_intrinsic_src.txt"), delimiter=" "
    )
    K_tgt = np.loadtxt(
        osp.join(input_root, "image", "camera_intrinsic_tgt.txt"), delimiter=" "
    )
    return K_src, K_tgt


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


def load_images_used(input_root: str) -> list[tuple[str, np.ndarray]]:
    """Parse ``image/transformations/Images_used.txt`` (base:774-811): per
    camera, one name line, one translation line, three rotation rows. The
    stored matrix is the camera pose; the world→camera extrinsic is its
    inverse.

    Returns a list of (image_name, extrinsic 4x4).
    """
    path = osp.join(input_root, "image", "transformations", "Images_used.txt")
    entries = []
    with open(path) as fh:
        while True:
            name = fh.readline().strip()
            if not name:
                break
            translation = np.fromstring(fh.readline().strip(), sep=" ")
            rotation = np.array(
                [np.fromstring(fh.readline().strip(), sep=" ") for _ in range(3)]
            )
            pose = np.eye(4)
            pose[:3, :3] = rotation
            pose[:3, 3] = translation
            entries.append((name, np.linalg.inv(pose)))
    return entries


def count_in_frame(
    points: np.ndarray,
    extrinsics: np.ndarray,  # (C, 4, 4)
    intrinsic: np.ndarray,
    image_size: tuple[int, int],
    *,
    v_flip: bool = True,
) -> np.ndarray:
    """(C,) number of points projecting inside the image for each candidate
    camera (``_get_the_most_matched_idx``, base:730-758)."""
    import jax
    import jax.numpy as jnp

    from fusion4landslide_tpu.image.geometry import project_points

    pts = jnp.asarray(points, jnp.float32)
    K = jnp.asarray(intrinsic, jnp.float32)

    def one(ext):
        _, _, valid = project_points(pts, ext, K, image_size, v_flip=v_flip)
        return jnp.sum(valid)

    counts = jax.lax.map(one, jnp.asarray(extrinsics, jnp.float32))
    return np.asarray(counts)


def select_best_images(
    points: np.ndarray,
    entries: list[tuple[str, np.ndarray]],
    intrinsic: np.ndarray,
    image_size: tuple[int, int],
    *,
    num: int = 1,
    v_flip: bool = True,
) -> list[tuple[str, np.ndarray]]:
    """Top-``num`` candidate cameras by in-frame point count, best first
    (``_find_the_most_matched_image``, base:760-858)."""
    if not entries:
        return []
    exts = np.stack([e for _, e in entries])
    counts = count_in_frame(
        points, exts, intrinsic, image_size, v_flip=v_flip
    )
    order = np.argsort(counts)[::-1][:num]
    return [entries[i] for i in order]
