"""ctypes bindings to the native data-loading core (csrc/data_core.cpp).

The reference decodes and resizes images with PIL inside DataLoader worker
processes (effdet/data/dataset.py:46, dataloader.py:112, preloader.py:133 —
SURVEY §2.3). This module is the TPU build's native host pipeline: libjpeg
decode + PIL-BILINEAR-compatible letterbox resize + a C++ thread pool that
fills a fixed [B, TH, TW, 3] uint8 canvas batch, GIL-free, ready for the
fused on-device normalize (data/device_preproc.py).

All callers fall back to the PIL path when the toolchain or the .so is
unavailable — the native core is an accelerator, never a requirement.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libdatacore.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    _src = os.path.join(_CSRC, "data_core.cpp")
    stale = os.path.exists(_LIB_PATH) and os.path.exists(_src) \
        and os.path.getmtime(_src) > os.path.getmtime(_LIB_PATH)
    if not os.path.exists(_LIB_PATH) or stale:
        try:
            subprocess.run(["make", "-C", _CSRC, "libdatacore.so"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_long)

    lib.dc_jpeg_dims.argtypes = [u8p, ctypes.c_long, i32p, i32p]
    lib.dc_jpeg_dims.restype = ctypes.c_int
    lib.dc_jpeg_decode.argtypes = [u8p, ctypes.c_long, u8p,
                                   ctypes.c_int, ctypes.c_int]
    lib.dc_jpeg_decode.restype = ctypes.c_int
    lib.dc_resize_bilinear.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                       u8p, ctypes.c_int, ctypes.c_int]
    lib.dc_resize_bilinear.restype = None
    lib.dc_decode_letterbox.argtypes = [u8p, ctypes.c_long, u8p,
                                        ctypes.c_int, ctypes.c_int,
                                        f32p, i32p, i32p]
    lib.dc_decode_letterbox.restype = ctypes.c_int
    lib.dc_load_letterbox_batch.argtypes = [
        ctypes.c_char_p, i64p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, f32p, i32p, i32p, ctypes.c_int]
    lib.dc_load_letterbox_batch.restype = ctypes.c_int

    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _bytes_ptr(b: bytes):
    return ctypes.cast(ctypes.c_char_p(b), ctypes.POINTER(ctypes.c_uint8))


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """Decode JPEG bytes to an RGB uint8 [H, W, 3] array (None on failure)."""
    lib = _load()
    assert lib is not None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.dc_jpeg_dims(_bytes_ptr(data), len(data),
                        ctypes.byref(h), ctypes.byref(w)):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.dc_jpeg_decode(_bytes_ptr(data), len(data), _u8(out),
                          h.value, w.value):
        return None
    return out


def resize_bilinear(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """PIL-BILINEAR-compatible resize of an RGB uint8 image."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    dh, dw = out_hw
    out = np.empty((dh, dw, 3), np.uint8)
    lib.dc_resize_bilinear(_u8(img), img.shape[0], img.shape[1],
                           _u8(out), dh, dw)
    return out


def decode_letterbox(data: bytes, target_hw: Tuple[int, int]
                     ) -> Optional[Tuple[np.ndarray, float, Tuple[int, int]]]:
    """JPEG bytes -> (letterboxed uint8 [TH, TW, 3], scale original/target,
    original (h, w)). Top-left placement, zero fill — the reference
    ResizePad semantics (transforms.py:75-107)."""
    lib = _load()
    assert lib is not None
    th, tw = target_hw
    out = np.empty((th, tw, 3), np.uint8)
    scale = ctypes.c_float()
    oh = ctypes.c_int()
    ow = ctypes.c_int()
    if lib.dc_decode_letterbox(_bytes_ptr(data), len(data), _u8(out), th, tw,
                               ctypes.byref(scale), ctypes.byref(oh),
                               ctypes.byref(ow)):
        return None
    return out, scale.value, (oh.value, ow.value)


def load_letterbox_batch(
        paths: Sequence[str], target_hw: Tuple[int, int],
        n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Threaded native batch load: decode + letterbox every path.

    Returns (images [N, TH, TW, 3] uint8, scales [N] f32 original/target,
    sizes [N, 2] int32 original (h, w), rc [N] int32 — nonzero marks a
    failed item whose canvas is zeroed; callers may PIL-fallback those).
    """
    lib = _load()
    assert lib is not None
    th, tw = target_hw
    n = len(paths)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    offsets = np.zeros(n, np.int64)
    pos = 0
    for i, p in enumerate(paths):
        offsets[i] = pos
        pos += len(p.encode()) + 1
    out = np.zeros((n, th, tw, 3), np.uint8)
    scales = np.ones(n, np.float32)
    sizes = np.zeros((n, 2), np.int32)
    rc = np.zeros(n, np.int32)
    lib.dc_load_letterbox_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n, th, tw, _u8(out),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rc.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads)
    return out, scales, sizes, rc


class NativeEvalLoader:
    """Deployment/eval loader over image files: the C++ core decodes and
    letterboxes each batch in a thread pool while the previous batch is on
    device (double buffering happens naturally via jax async dispatch).

    Yields {'image' uint8 [B, TH, TW, 3], 'img_scale' f32 [B],
    'img_size' f32 [B, 2] (w, h), 'path': list[str]} — the predict-bench
    input contract. Non-JPEG / corrupt items fall back to PIL.
    """

    def __init__(self, paths: Sequence[str], target_hw: Tuple[int, int],
                 batch_size: int, n_threads: int = 0,
                 drop_last: bool = False):
        if not available():
            raise RuntimeError("native data core unavailable; "
                               "use data.create_loader instead")
        self.paths = list(paths)
        self.target_hw = target_hw
        self.batch_size = batch_size
        self.n_threads = n_threads
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = len(self.paths)
        b = self.batch_size
        return n // b if self.drop_last else (n + b - 1) // b

    def _pil_fallback(self, path: str) -> Tuple[np.ndarray, float,
                                                Tuple[int, int]]:
        from PIL import Image

        from .transforms import ResizePad
        img = Image.open(path).convert("RGB")
        w, h = img.size
        out, anno = ResizePad(self.target_hw)(img, {})
        return np.asarray(out, np.uint8), float(anno["img_scale"]), (h, w)

    def __iter__(self) -> Iterator[dict]:
        b = self.batch_size
        for start in range(0, len(self.paths), b):
            chunk = self.paths[start:start + b]
            if self.drop_last and len(chunk) < b:
                return
            imgs, scales, sizes, rc = load_letterbox_batch(
                chunk, self.target_hw, self.n_threads)
            for i in np.nonzero(rc)[0]:
                try:
                    imgs[i], scales[i], sizes[i] = self._pil_fallback(chunk[i])
                except Exception:
                    pass  # keep the zeroed canvas
            if len(chunk) < b:  # pad the tail batch to the fixed size
                pad = b - len(chunk)
                imgs = np.concatenate(
                    [imgs, np.zeros((pad,) + imgs.shape[1:], np.uint8)])
                scales = np.concatenate([scales, np.ones(pad, np.float32)])
                sizes = np.concatenate([sizes, np.zeros((pad, 2), np.int32)])
            yield {
                "image": imgs,
                "img_scale": scales,
                # (w, h) in original coordinates, the reference img_info
                "img_size": sizes[:, ::-1].astype(np.float32),
                "path": list(chunk),
            }
