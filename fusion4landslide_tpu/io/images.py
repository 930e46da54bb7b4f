"""Image loading (reference: cv2.imread at base:839-841; PIL here — the
only consumer-facing difference is RGB vs BGR channel order, irrelevant to
the grayscale matchers)."""

from __future__ import annotations

import numpy as np

__all__ = ["load_image"]


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))
