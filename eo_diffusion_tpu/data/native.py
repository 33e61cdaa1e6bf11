"""ctypes bindings for the native C++ data library (``native/libeodata.so``).

Two components:

* **patch sampler** (``native/patch_sampler.cc``): fuses patch-window
  copy, uint8->float32 conversion, range scaling and flip augmentation
  into one GIL-free multithreaded pass -- the production host path for
  feeding a pod slice (the reference's python/patchify path holds the
  GIL per patch, ``data_load.py:159-207``).
* **GeoTIFF reader** (``native/tiff_reader.cc``): dependency-free decode
  of the multi-band uint16 rasters SEN12MS-CR/Inria ship as. The
  reference reads them via rasterio/GDAL
  (``sen12ms_cr_dataLoader.py:118-136``) which this image doesn't have,
  and PIL cannot decode >4-band rasters at all -- so this IS the
  real-data input path. Strips/tiles, chunky/planar, none/LZW/deflate,
  horizontal predictor, little/big endian.

Falls back to a numpy implementation transparently when the .so hasn't been
built (``make -C native``); :func:`have_native` reports which path is live.
"""

from __future__ import annotations

import ctypes
import os
import numpy as np

__all__ = ["have_native", "extract_patches", "build_native",
           "read_tiff", "tiff_info"]

_LIB = None
_TRIED = False

_SO_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libeodata.so",
)


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for name, src_ptr in (("eo_extract_patches_u8", u8p), ("eo_extract_patches_f32", f32p)):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [
            src_ptr, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, ctypes.c_int64, f32p, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ]
    lib.eo_version.restype = ctypes.c_int
    if hasattr(lib, "eo_tiff_info"):  # present since the r3 rebuild
        lib.eo_tiff_info.restype = ctypes.c_int
        lib.eo_tiff_info.argtypes = [ctypes.c_char_p, i64p]
        lib.eo_tiff_read.restype = ctypes.c_int
        lib.eo_tiff_read.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int64]
    _LIB = lib
    return lib


def build_native() -> bool:
    """Compile the shared library in place (requires g++); returns success."""
    import subprocess

    global _TRIED, _LIB
    res = subprocess.run(
        ["make", "-C", os.path.dirname(_SO_PATH)], capture_output=True, text=True
    )
    _TRIED = False
    _LIB = None
    return res.returncode == 0 and _load() is not None


def have_native() -> bool:
    return _load() is not None


_TIFF_ERRORS = {
    -1: "cannot open/read file",
    -2: "not a classic TIFF",
    -3: "unsupported TIFF feature (compression/bits/planar/predictor)",
    -4: "corrupt TIFF structure",
    -5: "output buffer size mismatch",
    -6: "decompression failed",
}


def tiff_info(path: str) -> dict:
    """Parse the first IFD of a (Geo)TIFF without decoding pixel data.

    Returns ``{width, height, samples, bits, sample_format, compression,
    planar}``. Raises on unsupported/corrupt files; requires the native
    library (``have_native()``).
    """
    lib = _load()
    assert lib is not None and hasattr(lib, "eo_tiff_info"), (
        "native TIFF reader unavailable -- run make -C native")
    info = np.zeros(8, np.int64)
    rc = lib.eo_tiff_info(
        os.fsencode(path),
        info.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        raise ValueError(
            f"{path}: {_TIFF_ERRORS.get(rc, f'error {rc}')}")
    return {"width": int(info[0]), "height": int(info[1]),
            "samples": int(info[2]), "bits": int(info[3]),
            "sample_format": int(info[4]), "compression": int(info[5]),
            "planar": int(info[6])}


def read_tiff(path: str) -> np.ndarray:
    """Decode a (Geo)TIFF to ``[H, W, S]`` float32 (exact for <=24-bit
    integer samples and float32). The native decoder covers the EO corpus
    PIL cannot touch: >4-band uint16 rasters, planar layout, tiled
    organization, LZW/deflate compression, horizontal predictor."""
    meta = tiff_info(path)
    lib = _load()
    out = np.empty((meta["height"], meta["width"], meta["samples"]),
                   np.float32)
    rc = lib.eo_tiff_read(
        os.fsencode(path),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size)
    if rc != 0:
        raise ValueError(
            f"{path}: {_TIFF_ERRORS.get(rc, f'error {rc}')}")
    return out


def _extract_numpy(tiles, jobs, size, scale, bias):
    n = jobs.shape[0]
    ch = tiles.shape[-1]
    out = np.empty((n, size, size, ch), np.float32)
    for p in range(n):
        ti, r, c, flip = jobs[p]
        patch = tiles[ti, r : r + size, c : c + size].astype(np.float32)
        if flip & 2:
            patch = patch[::-1]
        if flip & 1:
            patch = patch[:, ::-1]
        out[p] = patch * scale + bias
    return out


def extract_patches(
    tiles: np.ndarray,
    jobs: np.ndarray,
    size: int,
    scale: float = 1.0,
    bias: float = 0.0,
    n_threads: int = 0,
    force_numpy: bool = False,
) -> np.ndarray:
    """Extract float32 patches from a tile stack.

    :param tiles: [n_tiles, H, W, C] uint8 or float32, C-contiguous.
    :param jobs:  [n_patches, 4] int64 rows (tile_idx, row_off, col_off,
                  flip_bits) with flip bit0=horizontal, bit1=vertical.
    :param size:  square patch size.
    :returns: [n_patches, size, size, C] float32 = src * scale + bias.
    """
    tiles = np.ascontiguousarray(tiles)
    jobs = np.ascontiguousarray(jobs, np.int64)
    assert jobs.ndim == 2 and jobs.shape[1] == 4, jobs.shape
    n_tiles, th, tw, ch = tiles.shape
    assert (jobs[:, 0] < n_tiles).all() and (jobs[:, 0] >= 0).all()
    assert (jobs[:, 1] + size <= th).all() and (jobs[:, 2] + size <= tw).all()

    lib = None if force_numpy else _load()
    if lib is None:
        return _extract_numpy(tiles, jobs, size, scale, bias)

    out = np.empty((jobs.shape[0], size, size, ch), np.float32)
    i64p = jobs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    f32p = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    if tiles.dtype == np.uint8:
        lib.eo_extract_patches_u8(
            tiles.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_tiles, th, tw, ch, i64p, jobs.shape[0], f32p, size,
            ctypes.c_float(scale), ctypes.c_float(bias), n_threads,
        )
    elif tiles.dtype == np.float32:
        lib.eo_extract_patches_f32(
            tiles.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n_tiles, th, tw, ch, i64p, jobs.shape[0], f32p, size,
            ctypes.c_float(scale), ctypes.c_float(bias), n_threads,
        )
    else:
        return _extract_numpy(tiles, jobs, size, scale, bias)
    return out
