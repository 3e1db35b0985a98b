"""Output encoding: display-referred float planes -> 8/16-bit images.

Reference: `/root/reference/src/imageio/imageio_core.c:897-928` (float ->
uint8/16 conversion) + format plugins (`src/imageio/format/`).  JPEG/PNG/
TIFF writing goes through PIL here; a native encoder stage is a later
milestone for batch-export throughput.
"""

from __future__ import annotations

import numpy as np


def to_uint8(img_chw: np.ndarray) -> np.ndarray:
    """(3,H,W) display-referred [0,1] -> (H,W,3) uint8 with rounding."""
    x = np.clip(np.asarray(img_chw), 0.0, 1.0)
    return (x * 255.0 + 0.5).astype(np.uint8).transpose(1, 2, 0)


def to_uint16(img_chw: np.ndarray) -> np.ndarray:
    x = np.clip(np.asarray(img_chw), 0.0, 1.0)
    return (x * 65535.0 + 0.5).astype(np.uint16).transpose(1, 2, 0)


def write_image(path: str, img_chw: np.ndarray, quality: int = 92) -> None:
    from PIL import Image

    arr = to_uint8(img_chw)
    im = Image.fromarray(arr)
    if path.lower().endswith((".jpg", ".jpeg")):
        im.save(path, quality=quality, subsampling=0)
    else:
        im.save(path)
