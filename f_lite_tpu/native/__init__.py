"""ctypes bindings for the native host-side data-path kernels.

Builds `libimage_ops.so` on first use if a C++ toolchain is present;
everything degrades to numpy when it isn't (`available()` -> False).
`python -m f_lite_tpu.native` builds explicitly.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libimage_ops.so"
_lib = None
_tried = False


def build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_DIR)], check=True, capture_output=True
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.debug("native build failed: %s", e)
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.normalize_u8_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t
        ]
        lib.normalize_batch_u8_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_size_t, ctypes.c_void_p,
        ]
        lib.denormalize_f32_to_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t
        ]
        _lib = lib
    except OSError as e:  # pragma: no cover
        logger.debug("native load failed: %s", e)
    return _lib


def available() -> bool:
    return _load() is not None


def normalize_u8(img: np.ndarray) -> np.ndarray:
    """uint8 (..., C) -> float32 in [-1, 1]; native if available."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    if lib is None:
        return (img.astype(np.float32) / 255.0 - 0.5) / 0.5
    out = np.empty(img.shape, np.float32)
    lib.normalize_u8_to_f32(
        img.ctypes.data, out.ctypes.data, img.size
    )
    return out


def normalize_batch_u8(
    imgs: np.ndarray, flip: np.ndarray | None = None
) -> np.ndarray:
    """uint8 (B, H, W, C) -> float32 [-1, 1], optional per-image h-flip."""
    lib = _load()
    imgs = np.ascontiguousarray(imgs, np.uint8)
    b, h, w, c = imgs.shape
    if lib is None:
        out = (imgs.astype(np.float32) / 255.0 - 0.5) / 0.5
        if flip is not None:
            for i in np.nonzero(flip)[0]:
                out[i] = out[i, :, ::-1]
        return out
    out = np.empty(imgs.shape, np.float32)
    fptr = None
    if flip is not None:
        flip = np.ascontiguousarray(flip, np.uint8)
        fptr = flip.ctypes.data
    lib.normalize_batch_u8_to_f32(
        imgs.ctypes.data, out.ctypes.data, b, h, w, c, fptr
    )
    return out


def denormalize_to_u8(x: np.ndarray) -> np.ndarray:
    """float32 [-1, 1] -> uint8 (postprocess path)."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        return np.clip(
            np.round((x * 0.5 + 0.5) * 255.0), 0, 255
        ).astype(np.uint8)
    out = np.empty(x.shape, np.uint8)
    lib.denormalize_f32_to_u8(x.ctypes.data, out.ctypes.data, x.size)
    return out
