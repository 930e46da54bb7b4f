#!/usr/bin/env python
"""Evaluate the learned image matchers at PRODUCTION crop size.

Renders a realistic textured synthetic epoch-image pair (tools/synth_scene:
procedural terrain texture, nadir camera, known planted world shift → known
dense pixel flow), then runs ``match_epoch_images`` exactly as
``main_fusion.py`` does — reference image/crop/overlap sizes
(fusion_brienz.yaml:33-36: image [1920, 2560], crop [960, 1280], overlap
[480, 640]) — and reports, per matcher:

- EPE: median / mean endpoint error of the produced matches against the
  analytic ground-truth flow (px);
- precision@3px / @5px: fraction of matches within that radius of GT;
- n_matches and seconds per crop pair on the current backend (warm).

Usage::

    python tools/matcher_eval.py [--image-size 1920 2560]
        [--crop 960 1280] [--overlap 480 640] [--shift-px 25]
        [--matchers eloftr roma zncc]

The per-pair seconds number backs BASELINE.md's "the dense matcher runs
once per image pair and amortises over tiles" claim with a measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, nargs=2, default=[1920, 2560])
    ap.add_argument("--crop", type=int, nargs=2, default=[960, 1280])
    ap.add_argument("--overlap", type=int, nargs=2, default=[480, 640])
    ap.add_argument("--shift-px", type=float, default=25.0)
    ap.add_argument(
        "--matchers", nargs="+", default=["eloftr", "roma", "zncc"]
    )
    ap.add_argument("--extent", type=float, default=150.0)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from fusion4landslide_tpu.utils.platform import apply_platform_from_env

    apply_platform_from_env()

    from synth_scene import nadir_camera, planted_flow, render_image

    from fusion4landslide_tpu.image.matching import match_epoch_images

    h, w = args.image_size
    extent = args.extent
    K, E, _ = nadir_camera(extent, (h, w))
    px_per_m = float(K[0, 0] / np.linalg.inv(E)[2, 3])  # f / altitude
    shift_m = args.shift_px / px_per_m
    shift = (shift_m, -0.4 * shift_m, 0.05 * shift_m)
    print(
        f"# scene: {h}x{w}, {px_per_m:.2f} px/m, planted shift "
        f"{shift_m:.2f} m (~{args.shift_px:.0f} px)",
        file=sys.stderr,
    )
    img0 = render_image((h, w), K, E, extent)
    img1 = render_image((h, w), K, E, extent, shift=shift)

    ch, cw = args.crop
    oh, ow = args.overlap
    n_crops = max(1, int(np.ceil((h - oh) / (ch - oh)))) * max(
        1, int(np.ceil((w - ow) / (cw - ow)))
    )

    results = []
    for matcher in args.matchers:
        kw = dict(
            matcher=matcher,
            crop_size=(ch, cw),
            overlap_size=(oh, ow),
            max_flow_px=2.0 * args.shift_px,
        )
        try:
            t0 = time.perf_counter()
            m = match_epoch_images(img0, img1, **kw)
            cold = time.perf_counter() - t0
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                m = match_epoch_images(img0, img1, **kw)
                best = min(best, time.perf_counter() - t0)
        except Exception as e:  # pragma: no cover - report and continue
            print(f"{matcher}: FAILED: {e}", file=sys.stderr)
            results.append({"matcher": matcher, "error": str(e)})
            continue
        m = np.asarray(m, np.float32).reshape(-1, 4)
        if len(m):
            gt = planted_flow(m[:, :2], (h, w), K, E, extent, shift)
            epe = np.linalg.norm(m[:, 2:4] - gt, axis=1)
            row = {
                "matcher": matcher,
                "n_matches": int(len(m)),
                "epe_median_px": round(float(np.median(epe)), 3),
                "epe_mean_px": round(float(epe.mean()), 3),
                "precision_3px": round(float((epe < 3).mean()), 4),
                "precision_5px": round(float((epe < 5).mean()), 4),
            }
        else:
            row = {"matcher": matcher, "n_matches": 0}
        row.update(
            {
                "pair_seconds_warm": round(best, 3),
                "pair_seconds_cold": round(cold, 3),
                "seconds_per_crop_pair": round(best / n_crops, 4),
                "n_crop_pairs": n_crops,
            }
        )
        results.append(row)
        print(json.dumps(row), file=sys.stderr)

    print(json.dumps({"image_size": [h, w], "crop": [ch, cw],
                      "overlap": [oh, ow], "shift_px": args.shift_px,
                      "results": results}))


if __name__ == "__main__":
    main()
