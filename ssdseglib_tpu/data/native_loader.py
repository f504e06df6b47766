"""ctypes bindings for the native C++ data-loader runtime (native/).

Provides PNG decode, CSV parse, and whole-batch assembly backed by the C++
worker pool (`ssdseg_loader_load_batch`), with build-on-demand via the
Makefile.  Falls back cleanly: callers should catch `NativeLoaderError` /
`OSError` and use the PIL path (datacoder.py) when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libssdseg_native.so")

_lib = None
_lib_lock = threading.Lock()


class NativeLoaderError(RuntimeError):
    """Failure reported by the C++ loader.  `code` is the native error
    code (dataloader.cpp return conventions): -10..-22 PNG format /
    decode-capability limits, -30/-31 file IO, -40..-42 CSV parse,
    -50/-51 image-shape mismatch, -60 native exception."""

    def __init__(self, message: str, code: "int | None" = None) -> None:
        super().__init__(message)
        self.code = code

    @property
    def is_io_error(self) -> bool:
        """True for plain file-IO failures (missing/unreadable file) —
        cases a different decoder cannot fix, as opposed to
        decode-capability limits (16-bit, interlaced, ...) where a PIL
        fallback is the right move."""
        return self.code in (-30, -31)


def _build_library() -> None:
    subprocess.run(
        ["make", "-s", "libssdseg_native.so"],
        cwd=_NATIVE_DIR,
        check=True,
        capture_output=True,
    )


def _needs_build() -> bool:
    """True when the .so is absent or older than its sources (so edits to
    dataloader.cpp take effect instead of silently loading a stale binary)."""
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    for src in ("dataloader.cpp", "decode_core.h", "Makefile"):
        path = os.path.join(_NATIVE_DIR, src)
        if os.path.exists(path) and os.path.getmtime(path) > lib_mtime:
            return True
    return False


def get_library() -> ctypes.CDLL:
    """Load (building if needed) the native library, configure signatures."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _needs_build():
            _build_library()
        lib = ctypes.CDLL(_LIB_PATH)

        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)

        lib.ssdseg_png_info.argtypes = [u8p, ctypes.c_size_t, u32p, u32p, u32p]
        lib.ssdseg_png_info.restype = ctypes.c_int
        lib.ssdseg_png_decode_rgb.argtypes = [u8p, ctypes.c_size_t, u8p]
        lib.ssdseg_png_decode_rgb.restype = ctypes.c_int
        lib.ssdseg_png_decode_gray.argtypes = [u8p, ctypes.c_size_t, u8p]
        lib.ssdseg_png_decode_gray.restype = ctypes.c_int
        lib.ssdseg_csv_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, i32p, f32p, ctypes.c_int
        ]
        lib.ssdseg_csv_parse.restype = ctypes.c_int
        lib.ssdseg_loader_create.argtypes = [ctypes.c_int]
        lib.ssdseg_loader_create.restype = ctypes.c_void_p
        lib.ssdseg_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.ssdseg_loader_load_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_uint32, ctypes.c_uint32,
            u8p, u8p, i32p, f32p, u8p, ctypes.c_int,
        ]
        lib.ssdseg_loader_load_batch.restype = ctypes.c_int

        _lib = lib
        return lib


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def png_info(data: bytes) -> Tuple[int, int, int]:
    lib = get_library()
    buf = np.frombuffer(data, dtype=np.uint8)
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    c = ctypes.c_uint32()
    ret = lib.ssdseg_png_info(
        _u8ptr(buf), len(data), ctypes.byref(w), ctypes.byref(h), ctypes.byref(c)
    )
    if ret != 0:
        raise NativeLoaderError(f"png_info failed: {ret}", code=ret)
    return h.value, w.value, c.value


def decode_png_rgb(data: bytes) -> np.ndarray:
    h, w, _ = png_info(data)
    out = np.empty((h, w, 3), dtype=np.uint8)
    buf = np.frombuffer(data, dtype=np.uint8)
    ret = get_library().ssdseg_png_decode_rgb(_u8ptr(buf), len(data), _u8ptr(out))
    if ret != 0:
        raise NativeLoaderError(f"png_decode_rgb failed: {ret}", code=ret)
    return out


def decode_png_gray(data: bytes) -> np.ndarray:
    h, w, _ = png_info(data)
    out = np.empty((h, w), dtype=np.uint8)
    buf = np.frombuffer(data, dtype=np.uint8)
    ret = get_library().ssdseg_png_decode_gray(_u8ptr(buf), len(data), _u8ptr(out))
    if ret != 0:
        raise NativeLoaderError(f"png_decode_gray failed: {ret}", code=ret)
    return out


def parse_csv(text: bytes, max_rows: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    lib = get_library()
    labels = np.zeros((max_rows,), dtype=np.int32)
    boxes = np.zeros((max_rows, 4), dtype=np.float32)
    rows = lib.ssdseg_csv_parse(
        text, len(text),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_rows,
    )
    if rows < 0:
        raise NativeLoaderError(f"csv_parse failed: {rows}", code=rows)
    return labels[:rows].copy(), boxes[:rows].copy()


class NativeBatchLoader:
    """C++-worker-pool batch assembler for on-disk datasets.

    `load_batch(triples)` decodes and pads a whole batch inside the native
    pool (the GIL is released for the duration of the call) and returns the
    same fixed-shape arrays as the Python HostBatcher.
    """

    def __init__(
        self,
        image_shape: Tuple[int, int],
        max_ground_truth_boxes: int = 32,
        num_workers: int = 8,
    ) -> None:
        self._lib = get_library()
        self._handle = self._lib.ssdseg_loader_create(num_workers)
        if not self._handle:
            raise NativeLoaderError("loader_create failed")
        self.image_shape = image_shape
        self.max_gt = max_ground_truth_boxes

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.ssdseg_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def load_batch(self, triples: Sequence[Tuple[str, str, str]]):
        batch = len(triples)
        h, w = self.image_shape
        images = np.empty((batch, h, w, 3), dtype=np.uint8)
        masks = np.empty((batch, h, w), dtype=np.uint8)
        labels = np.zeros((batch, self.max_gt), dtype=np.int32)
        boxes = np.zeros((batch, self.max_gt, 4), dtype=np.float32)
        valid = np.zeros((batch, self.max_gt), dtype=np.uint8)

        def paths(idx):
            arr = (ctypes.c_char_p * batch)()
            for i, t in enumerate(triples):
                arr[i] = t[idx].encode()
            return arr

        img_paths, mask_paths, csv_paths = paths(0), paths(1), paths(2)
        ret = self._lib.ssdseg_loader_load_batch(
            self._handle, img_paths, mask_paths, csv_paths,
            batch, h, w,
            _u8ptr(images), _u8ptr(masks),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            _u8ptr(valid), self.max_gt,
        )
        if ret != 0:
            raise NativeLoaderError(f"load_batch failed: {ret}", code=ret)
        return images, masks, labels, boxes, valid.astype(bool)


def available() -> bool:
    try:
        get_library()
        return True
    except Exception:
        return False
