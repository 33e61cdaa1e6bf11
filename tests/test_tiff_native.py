"""Native GeoTIFF reader tests (native/tiff_reader.cc via data/native.py).

The fixtures are written by a minimal in-test TIFF writer (strips/tiles,
chunky/planar, little/big endian, deflate, horizontal predictor), so
every decode path is checked against the exact source array. LZW is
cross-checked against PIL's encoder. The load-bearing case is the one no
python library in this image can read: 13-band uint16 rasters
(SEN12MS-CR's S2 layout, reference sen12ms_cr_dataLoader.py:118-136).
"""

import struct
import zlib

import numpy as np
import pytest

from eo_diffusion_tpu.data.native import have_native, read_tiff, tiff_info

pytestmark = pytest.mark.skipif(
    not have_native(), reason="native library not built (make -C native)")


# ---------------------------------------------------------------------------
# minimal TIFF writer (test fixture generator)
# ---------------------------------------------------------------------------

_DTYPES = {
    np.dtype(np.uint8): (8, 1),
    np.dtype(np.uint16): (16, 1),
    np.dtype(np.int16): (16, 2),
    np.dtype(np.int32): (32, 2),
    np.dtype(np.float32): (32, 3),
}


def write_tiff(path, arr, *, big_endian=False, tile=None, planar=1,
               compression=1, predictor=1, rows_per_strip=None):
    """Write [H, W, S] ``arr`` as a classic TIFF exercising the requested
    layout. compression: 1 none, 8 deflate. predictor: 1 none, 2 hdiff."""
    H, W, S = arr.shape
    bits, fmt = _DTYPES[arr.dtype]
    en = ">" if big_endian else "<"
    arr = arr.astype(arr.dtype.newbyteorder(en))

    def seg_bytes(seg):  # [rows, cols, chans]
        if predictor == 2:
            seg = seg.copy()
            native = seg.astype(seg.dtype.newbyteorder("="))
            d = np.diff(native, axis=1)
            native[:, 1:] = d
            seg = native.astype(native.dtype.newbyteorder(en))
        raw = seg.tobytes()
        return zlib.compress(raw) if compression == 8 else raw

    planes = S if planar == 2 else 1
    chans = 1 if planar == 2 else S
    segments = []
    if tile is None:
        rps = rows_per_strip or H
        for pl in range(planes):
            view = arr[..., pl:pl + 1] if planar == 2 else arr
            for r0 in range(0, H, rps):
                segments.append(seg_bytes(view[r0:r0 + rps]))
    else:
        tw, th = tile
        for pl in range(planes):
            view = arr[..., pl:pl + 1] if planar == 2 else arr
            for r0 in range(0, H, th):
                for c0 in range(0, W, tw):
                    block = np.zeros((th, tw, chans), arr.dtype)
                    sub = view[r0:r0 + th, c0:c0 + tw]
                    block[:sub.shape[0], :sub.shape[1]] = sub
                    segments.append(seg_bytes(block))

    data_start = 8
    offsets, counts, pos = [], [], data_start
    for s in segments:
        offsets.append(pos)
        counts.append(len(s))
        pos += len(s) + (len(s) & 1)  # word-align
    extra_start = pos

    # tag values too big for the inline 4 bytes live in an extra area
    extra = b""

    def arr_tag(tag, typ, values):
        nonlocal extra
        size = {3: 2, 4: 4}[typ]
        fmtc = {3: "H", 4: "I"}[typ]
        if len(values) * size <= 4:
            packed = struct.pack(f"{en}{len(values)}{fmtc}", *values)
            packed += b"\0" * (4 - len(packed))
            return struct.pack(f"{en}HHI", tag, typ, len(values)) + packed
        off = extra_start + len(extra)
        extra += struct.pack(f"{en}{len(values)}{fmtc}", *values)
        if len(extra) & 1:
            extra += b"\0"
        return struct.pack(f"{en}HHII", tag, typ, len(values), off)

    tags = [
        arr_tag(256, 4, [W]),
        arr_tag(257, 4, [H]),
        arr_tag(258, 3, [bits] * S),
        arr_tag(259, 3, [compression]),
        arr_tag(262, 3, [1]),
        arr_tag(277, 3, [S]),
        arr_tag(284, 3, [planar]),
        arr_tag(339, 3, [fmt] * S),
    ]
    if predictor != 1:
        tags.append(arr_tag(317, 3, [predictor]))
    if tile is None:
        tags += [arr_tag(273, 4, offsets),
                 arr_tag(278, 4, [rows_per_strip or H]),
                 arr_tag(279, 4, counts)]
    else:
        tags += [arr_tag(322, 4, [tile[0]]), arr_tag(323, 4, [tile[1]]),
                 arr_tag(324, 4, offsets), arr_tag(325, 4, counts)]
    tags.sort(key=lambda t: struct.unpack(f"{en}H", t[:2])[0])

    ifd_start = extra_start + len(extra)
    with open(path, "wb") as f:
        f.write((b"MM" if big_endian else b"II")
                + struct.pack(f"{en}H", 42)
                + struct.pack(f"{en}I", ifd_start))
        pos = data_start
        for s in segments:
            f.write(s)
            pos += len(s)
            if len(s) & 1:
                f.write(b"\0")
                pos += 1
        f.write(extra)
        f.write(struct.pack(f"{en}H", len(tags)))
        for t in tags:
            f.write(t)
        f.write(struct.pack(f"{en}I", 0))


def _rand(shape, dtype, seed=0):
    rng = np.random.default_rng(seed)
    if dtype == np.float32:
        return rng.normal(size=shape).astype(np.float32)
    info = np.iinfo(dtype)
    return rng.integers(info.min, info.max, size=shape).astype(dtype)


# ---------------------------------------------------------------------------


class TestDecode:
    def test_13band_uint16_strips(self, tmp_path):
        """The SEN12MS-CR S2 layout no python reader in this image can
        decode: 13-band uint16, stripped, uncompressed."""
        a = _rand((21, 17, 13), np.uint16)
        p = str(tmp_path / "s2.tif")
        write_tiff(p, a, rows_per_strip=5)
        meta = tiff_info(p)
        assert (meta["width"], meta["height"], meta["samples"],
                meta["bits"]) == (17, 21, 13, 16)
        np.testing.assert_array_equal(read_tiff(p), a.astype(np.float32))

    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16,
                                       np.float32])
    def test_dtypes(self, tmp_path, dtype):
        a = _rand((9, 7, 3), dtype, seed=3)
        p = str(tmp_path / "d.tif")
        write_tiff(p, a)
        np.testing.assert_array_equal(read_tiff(p), a.astype(np.float32))

    def test_deflate(self, tmp_path):
        a = _rand((16, 16, 4), np.uint16, seed=1)
        p = str(tmp_path / "z.tif")
        write_tiff(p, a, compression=8, rows_per_strip=6)
        np.testing.assert_array_equal(read_tiff(p), a.astype(np.float32))

    def test_deflate_predictor2(self, tmp_path):
        a = _rand((12, 11, 2), np.uint16, seed=2)
        p = str(tmp_path / "zp.tif")
        write_tiff(p, a, compression=8, predictor=2, rows_per_strip=4)
        np.testing.assert_array_equal(read_tiff(p), a.astype(np.float32))

    def test_planar(self, tmp_path):
        a = _rand((10, 8, 5), np.uint16, seed=4)
        p = str(tmp_path / "pl.tif")
        write_tiff(p, a, planar=2, rows_per_strip=3, compression=8)
        np.testing.assert_array_equal(read_tiff(p), a.astype(np.float32))

    def test_tiled(self, tmp_path):
        a = _rand((20, 30, 3), np.uint16, seed=5)
        p = str(tmp_path / "t.tif")
        write_tiff(p, a, tile=(16, 16), compression=8)
        np.testing.assert_array_equal(read_tiff(p), a.astype(np.float32))

    def test_tiled_planar_bigendian(self, tmp_path):
        a = _rand((17, 19, 4), np.uint16, seed=6)
        p = str(tmp_path / "tpb.tif")
        write_tiff(p, a, tile=(16, 16), planar=2, big_endian=True)
        np.testing.assert_array_equal(read_tiff(p), a.astype(np.float32))

    def test_bigendian_strips(self, tmp_path):
        a = _rand((6, 5, 13), np.uint16, seed=7)
        p = str(tmp_path / "be.tif")
        write_tiff(p, a, big_endian=True, rows_per_strip=2)
        np.testing.assert_array_equal(read_tiff(p), a.astype(np.float32))

    def test_lzw_vs_pil(self, tmp_path):
        """PIL encodes LZW; our decoder must agree with PIL's own decode."""
        from PIL import Image

        rng = np.random.default_rng(8)
        # mix of smooth + noise so LZW actually builds a dictionary
        base = np.linspace(0, 255, 24 * 32 * 3).reshape(24, 32, 3)
        a = (base + rng.integers(0, 8, (24, 32, 3))).clip(0, 255).astype(np.uint8)
        p = str(tmp_path / "lzw.tif")
        Image.fromarray(a).save(p, compression="tiff_lzw")
        meta = tiff_info(p)
        assert meta["compression"] == 5
        ours = read_tiff(p)
        theirs = np.asarray(Image.open(p)).astype(np.float32)
        np.testing.assert_array_equal(ours, theirs)
        np.testing.assert_array_equal(ours, a.astype(np.float32))

    def test_lzw_16bit_vs_pil(self, tmp_path):
        from PIL import Image

        a = _rand((14, 9, 1), np.uint16, seed=9)
        p = str(tmp_path / "lzw16.tif")
        try:
            Image.fromarray(a[..., 0]).convert("I;16").save(
                p, compression="tiff_lzw")
        except OSError:
            pytest.skip("PIL lacks 16-bit LZW TIFF write support")
        ours = read_tiff(p)
        theirs = np.asarray(Image.open(p)).astype(np.float32)[..., None]
        np.testing.assert_array_equal(ours, theirs)

    @pytest.mark.parametrize("dtype", [np.float32, np.int32])
    def test_predictor2_wide_samples_rejected(self, tmp_path, dtype):
        """Predictor-2 undo is only implemented for 8/16-bit samples; wider
        samples must be REJECTED (-3), not silently returned differenced
        (the rc=0 corruption path the line-358 comment assumed away)."""
        a = np.arange(6 * 6 * 2, dtype=dtype).reshape(6, 6, 2)
        p = str(tmp_path / "p2wide.tif")
        write_tiff(p, a, compression=8, predictor=2, rows_per_strip=3)
        with pytest.raises(ValueError, match="unsupported"):
            read_tiff(p)

    def test_int64_rejected(self, tmp_path):
        """64-bit integer samples would be reinterpreted as IEEE doubles by
        sample_to_float; the support matrix must return -3 instead."""
        a = np.arange(4 * 4, dtype=np.uint8).reshape(4, 4, 1)
        p = str(tmp_path / "i64.tif")
        write_tiff(p, a)
        raw = bytearray(open(p, "rb").read())
        # patch BitsPerSample (tag 258, SHORT) from 8 to 64 in place
        idx = raw.find((258).to_bytes(2, "little"))
        assert idx > 0
        val_off = idx + 8
        assert raw[val_off] == 8
        raw[val_off] = 64
        open(p, "wb").write(bytes(raw))
        with pytest.raises(ValueError, match="unsupported"):
            read_tiff(p)

    def test_not_a_tiff(self, tmp_path):
        p = str(tmp_path / "x.tif")
        with open(p, "wb") as f:
            f.write(b"PNG whatever")
        with pytest.raises(ValueError, match="not a classic TIFF"):
            tiff_info(p)

    def test_missing_file(self, tmp_path):
        with pytest.raises(ValueError, match="cannot open"):
            tiff_info(str(tmp_path / "nope.tif"))


class TestSen12msIntegration:
    def test_default_reader_uses_native_for_13band(self, tmp_path):
        """sen12ms_cr._default_reader must decode the 13-band S2 raster
        (and slice the requested 1-indexed bands) without rasterio."""
        from eo_diffusion_tpu.data.sen12ms_cr import S2Bands, _default_reader

        a = _rand((8, 8, 13), np.uint16, seed=10)
        p = str(tmp_path / "roi.tif")
        write_tiff(p, a, compression=8)
        rgb = _default_reader(p, [b for b in S2Bands.RGB.value])
        np.testing.assert_array_equal(
            rgb, a.astype(np.float32)[:, :, [3, 2, 1]])
