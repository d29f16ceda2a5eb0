"""Host-side image IO.

The reference shells out to ImageMagick `convert` to turn arbitrary formats
into PNG before reading (/root/reference/pflib.py:55-90, 714-746). We read
TIFF/PNG/etc. directly with imageio/PIL — pure host-side IO, no external
binary — while keeping the reference's path conventions (a non-PNG target
with an existing sibling ``<path>.png`` uses the sibling).
"""

from __future__ import annotations

import os

import numpy as np


def read_image_array(image_path: str) -> np.ndarray:
    import imageio.v2 as iio
    arr = np.asarray(iio.imread(image_path))
    if arr.ndim == 3:
        # Collapse RGB(A) sanity-check images to grayscale (first channel).
        arr = arr[..., 0]
    return arr


def read_image(image_path: str):
    """(converted_path, image) — parity with pflib.read_image (pflib.py:714).

    If the target is not a PNG and ``<path>.png`` exists, the sibling PNG is
    read (the reference's convert-once convention). Otherwise the file is
    read directly — no conversion subprocess is needed.
    """
    converted_path = image_path = os.path.abspath(image_path)
    if not image_path.endswith(".png") and os.path.exists(image_path + ".png"):
        converted_path = image_path + ".png"
    return converted_path, read_image_array(converted_path)


def convert_image(input_path, output_path=None, output_format="png",
                  convert_command=None):
    """Convert an image by decoding + re-encoding in-process.

    API parity with pflib.convert_image (pflib.py:55-90); the
    convert_command argument is accepted for compatibility and ignored
    (no subprocess is spawned).
    """
    import imageio.v2 as iio
    if output_path is None:
        output_path = ".".join((input_path, output_format))
    try:
        arr = read_image_array(input_path)
        iio.imwrite(output_path, arr)
    except Exception:
        import logging
        logging.getLogger(__name__).exception("convert_image failed")
        return None
    return output_path
