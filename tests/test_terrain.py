"""Terrain-tile elevation producer tests (TerrainTileElevationSource.ts
parity: tile math, PNG decode, bilinear interpolation, zoom fallback,
missing-vs-error caching)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from openskidata_processor_spark.pipeline.enrichment import geohash_encode
from openskidata_processor_spark.sources import terrain as tr


def encode_png(arr: np.ndarray, color_type: int = 2,
               filters: list[int] | None = None) -> bytes:
    """Minimal PNG encoder for tests (8-bit RGB/RGBA, chosen per-row
    filters) — lets the decoder be exercised on real PNG bytes without an
    image library."""
    h, w, nch = arr.shape
    raw = bytearray()
    prev = np.zeros(w * nch, dtype=np.int16)
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int16)
        f = (filters or [0] * h)[y]
        raw.append(f)
        if f == 0:
            raw.extend(line.astype(np.uint8).tobytes())
        elif f == 2:  # Up
            raw.extend(((line - prev) & 0xFF).astype(np.uint8).tobytes())
        elif f == 1:  # Sub
            shifted = np.concatenate([np.zeros(nch, np.int16), line[:-nch]])
            raw.extend(((line - shifted) & 0xFF).astype(np.uint8).tobytes())
        else:
            raise ValueError(f)
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def mapbox_rgb(elevation: float) -> tuple[int, int, int]:
    """Inverse of decodeMapboxElevation for building test tiles."""
    v = round((elevation + 10000.0) / 0.1)
    return (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF


def constant_tile(elevation: float, size: int = 256,
                  **png_kwargs) -> bytes:
    arr = np.zeros((size, size, 3), dtype=np.uint8)
    arr[:, :] = mapbox_rgb(elevation)
    return encode_png(arr, **png_kwargs)


def test_png_decode_roundtrip_all_filters():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for filters in ([0] * 6, [0, 1, 2, 1, 2, 0], [0, 2, 2, 2, 2, 2]):
        assert np.array_equal(
            tr.decode_png_rgb(encode_png(arr, filters=filters)), arr)
    # RGBA input: alpha dropped, RGB preserved
    rgba = np.dstack([arr, np.full((6, 5), 128, np.uint8)])
    assert np.array_equal(
        tr.decode_png_rgb(encode_png(rgba, color_type=6)), arr)


def test_decode_png_rejects_paeth_correctness():
    """Paeth (filter 4) decodes through the slow path — verify against a
    hand-filtered row."""
    arr = np.array([[[10, 20, 30], [13, 22, 28]],
                    [[50, 60, 70], [55, 63, 69]]], dtype=np.uint8)
    # build Paeth-filtered bytes manually via the spec predictor
    nch, stride = 3, 6
    rows = arr.reshape(2, stride).astype(np.int16)
    raw = bytearray()
    prev = np.zeros(stride, np.int16)
    for y in range(2):
        raw.append(4)
        line = rows[y]
        for i in range(stride):
            a = line[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append(int(line[i] - pred) & 0xFF)
        prev = line

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    assert np.array_equal(tr.decode_png_rgb(png), arr)


def test_tile_pixel_math_matches_reference():
    # zoom 0: the world is one tile; (0, 0) lands at its center
    tx, ty, px, py = tr.lonlat_to_tile_pixel(0.0, 0.0, 0, 256)
    assert (tx, ty) == (0, 0)
    assert abs(px - 128.0) < 1e-9 and abs(py - 128.0) < 1e-9
    # positive lon → east half, positive lat → top half (y smaller)
    tx, ty, px, py = tr.lonlat_to_tile_pixel(90.0, 45.0, 1, 256)
    assert (tx, ty) == (1, 0)
    # latitude clamp: siny truncates at ±0.9999 (≈±89.189°)
    _, ty_hi, _, _ = tr.lonlat_to_tile_pixel(0.0, 89.99, 4, 256)
    _, ty_clamp, _, _ = tr.lonlat_to_tile_pixel(0.0, 89.189, 4, 256)
    assert ty_hi == ty_clamp


def test_interpolation_setup_boundaries():
    # interior pixel: all 4 corners in the same tile
    corners, fx, fy = tr.interpolation_setup(5, 5, 10.5, 20.25, 6, 256)
    assert [c[:2] for c in corners] == [(5, 5)] * 4
    assert abs(fx - 0.5) < 1e-12 and abs(fy - 0.25) < 1e-12
    # right edge: x0+1 wraps into the next tile (antimeridian modulo)
    corners, _, _ = tr.interpolation_setup(63, 5, 255.5, 10.0, 6, 256)
    assert corners[1][:2] == (0, 5) and corners[0][:2] == (63, 5)
    # bottom edge of the world: returns None
    assert tr.interpolation_setup(5, 63, 10.0, 255.5, 6, 256) is None


def test_fetch_elevation_tiles_end_to_end(spark):
    """Constant-valued tiles make bilinear exact; zoom fallback, 404
    caching, and error suppression all observable."""
    z12 = constant_tile(1234.5)
    z11 = constant_tile(987.6)

    def fetch(z, x, y):
        if z == 12:
            return None  # 404 at the preferred zoom → fall to 11
        if z == 11:
            return z11
        raise AssertionError("zoom 10 never needed")

    keys = [geohash_encode(11.1, 47.1, 10), geohash_encode(11.2, 47.2, 10)]
    misses = spark.createDataFrame([(k,) for k in keys], "key string")
    out = {r.key: r.elevation
           for r in tr.fetch_elevation_tiles(
               misses, fetch, zooms=[12, 11]).collect()}
    assert set(out) == set(keys)
    for v in out.values():
        assert abs(v - 987.6) < 1e-6

    # all zooms 404 → null elevation row (knowledge, cached)
    out2 = tr.fetch_elevation_tiles(
        misses, lambda z, x, y: None, zooms=[12, 11]).collect()
    assert len(out2) == 2 and all(r.elevation is None for r in out2)

    # fetch error → NO row (never cached; surfaces as a miss next run)
    def broken(z, x, y):
        raise RuntimeError("server down")
    assert tr.fetch_elevation_tiles(misses, broken, zooms=[12]).count() == 0

    # direct decode parity: the preferred zoom when present wins
    out3 = {r.key: r.elevation
            for r in tr.fetch_elevation_tiles(
                misses, lambda z, x, y: z12, zooms=[12, 11]).collect()}
    for v in out3.values():
        assert abs(v - 1234.5) < 1e-6


def test_tile_disk_cache(spark, tmp_path):
    """Fetched tiles and 404s persist in the disk cache (TileDiskCache
    analogue): a second run with a dead fetcher still resolves."""
    calls_file = tmp_path / "calls"
    cache_dir = str(tmp_path / "tiles")
    tile = constant_tile(555.0)

    def counting_fetch(z, x, y):
        with open(calls_file, "a") as f:
            f.write("x")
        return tile

    keys = [geohash_encode(11.1, 47.1, 10)]
    misses = spark.createDataFrame([(k,) for k in keys], "key string")
    r1 = tr.fetch_elevation_tiles(misses, counting_fetch, zooms=[12],
                                  cache_dir=cache_dir).collect()
    assert abs(r1[0].elevation - 555.0) < 1e-6
    n_fetches = calls_file.stat().st_size
    assert n_fetches >= 1

    def dead_fetch(z, x, y):
        raise RuntimeError("offline")

    r2 = tr.fetch_elevation_tiles(misses, dead_fetch, zooms=[12],
                                  cache_dir=cache_dir).collect()
    assert abs(r2[0].elevation - 555.0) < 1e-6  # resolved from disk


def test_corrupt_tile_bytes_surface_as_miss(spark, tmp_path):
    """A corrupt/truncated PNG (bad server bytes, or a partially-written
    disk-cache file from a crashed task) must NOT fail the stage: the
    point errors out (no row, never cached) and a poisoned cache file is
    deleted so the next run refetches — 'errors are never cached and
    surface as misses'."""
    keys = [geohash_encode(11.1, 47.1, 10)]
    misses = spark.createDataFrame([(k,) for k in keys], "key string")

    # 1) server returns garbage bytes → no row, no crash
    out = tr.fetch_elevation_tiles(
        misses, lambda z, x, y: b"\x89PNG garbage", zooms=[12]).collect()
    assert out == []

    # 2) truncated disk-cache file poisons nothing: first run writes a
    # good tile, we corrupt it on disk, the next run deletes it and
    # refetches through a live fetcher.
    cache_dir = str(tmp_path / "tiles")
    tile = constant_tile(777.0)
    r1 = tr.fetch_elevation_tiles(misses, lambda z, x, y: tile, zooms=[12],
                                  cache_dir=cache_dir).collect()
    assert abs(r1[0].elevation - 777.0) < 1e-6
    import glob, os
    cached = glob.glob(os.path.join(cache_dir, "*.png"))
    assert cached
    for p in cached:
        with open(p, "wb") as f:
            f.write(b"truncated")
    # corrupt cache + dead fetcher → miss (no row), bad file removed
    r2 = tr.fetch_elevation_tiles(
        misses, lambda z, x, y: (_ for _ in ()).throw(RuntimeError("down")),
        zooms=[12], cache_dir=cache_dir).collect()
    assert r2 == []
    assert not any(os.path.exists(p) for p in cached)
    # next run refetches and resolves
    r3 = tr.fetch_elevation_tiles(misses, lambda z, x, y: tile, zooms=[12],
                                  cache_dir=cache_dir).collect()
    assert abs(r3[0].elevation - 777.0) < 1e-6


# ---------------------------------------------------------------------------
# ElevationDecoder.unit.test.ts — all 16 reference vectors
# ---------------------------------------------------------------------------

class TestDecodeMapboxElevation:
    @pytest.mark.parametrize("rgb,expected", [
        ((1, 134, 160), 0.0),        # sea level
        ((0, 0, 0), -10000.0),       # encoding floor
        ((1, 135, 0), 9.6),          # known value
        ((2, 224, 74), 8849.0),      # Mount Everest
    ])
    def test_vectors(self, rgb, expected):
        assert tr.decode_elevation(*rgb, "mapbox") == pytest.approx(
            expected, abs=0.05)


class TestDecodeTerrariumElevation:
    @pytest.mark.parametrize("rgb,expected", [
        ((128, 0, 0), 0.0),          # sea level
        ((0, 0, 0), -32768.0),       # encoding floor
        ((128, 10, 0), 10.0),        # known value
        ((162, 145, 0), 8849.0),     # Mount Everest
    ])
    def test_vectors(self, rgb, expected):
        assert tr.decode_elevation(*rgb, "terrarium") == pytest.approx(
            expected, abs=0.05)


def test_elevation_at_pixel_2x2():
    """elevationAtPixel over a 2x2 buffer (ElevationDecoder.unit.test.ts):
    columns alternate sea level / 9.6 m."""
    sea, high = (1, 134, 160), (1, 135, 0)
    arr = np.array([[sea, high], [sea, high]], dtype=np.uint8)
    for (x, y), want in {(0, 0): 0.0, (1, 0): 9.6,
                         (0, 1): 0.0, (1, 1): 9.6}.items():
        r, g, b = (int(v) for v in arr[y, x])
        assert tr.decode_elevation(r, g, b, "mapbox") == pytest.approx(
            want, abs=0.05)


class TestBilinearInterpolate:
    @pytest.mark.parametrize("corners,fx,fy,expected", [
        ((100, 200, 300, 400), 0, 0, 100),   # e00
        ((100, 200, 300, 400), 1, 0, 200),   # e10
        ((100, 200, 300, 400), 0, 1, 300),   # e01
        ((100, 200, 300, 400), 1, 1, 400),   # e11
        ((0, 10, 0, 10), 0.5, 0, 5),         # horizontal midpoint
        ((0, 10, 20, 30), 0, 0.5, 10),       # vertical midpoint
        ((50, 50, 50, 50), 0.3, 0.7, 50),    # constant field
        ((0, 10, 20, 30), 0.5, 0.5, 15),     # both directions
    ])
    def test_vectors(self, corners, fx, fy, expected):
        assert tr.bilinear(*corners, fx, fy) == pytest.approx(expected)


# ---------------------------------------------------------------------------
# TileCoordinates.unit.test.ts — all 14 reference vectors
# ---------------------------------------------------------------------------

class TestLonLatToTilePixel:
    def test_origin_zoom0_512(self):
        tx, ty, px, py = tr.lonlat_to_tile_pixel(0, 0, 0, 512)
        assert (tx, ty) == (0, 0)
        assert px == pytest.approx(256, abs=0.5)
        assert py == pytest.approx(256, abs=0.5)

    def test_known_location_zoom12_512(self):
        tx, ty, px, py = tr.lonlat_to_tile_pixel(-84.8866, 39.1453, 12, 512)
        assert (tx, ty) == (1082, 1563)
        assert 0 <= px < 512 and 0 <= py < 512

    def test_antimeridian_zoom1_256(self):
        tx, ty, px, py = tr.lonlat_to_tile_pixel(180, 0, 1, 256)
        assert tx == 2
        assert px == pytest.approx(0, abs=0.5)

    def test_extreme_latitude_clamped(self):
        tx, ty, px, py = tr.lonlat_to_tile_pixel(0, 85, 2, 512)
        assert (tx, ty) == (2, 0)
        assert py >= 0

    def test_fractional_pixels(self):
        _, _, px, py = tr.lonlat_to_tile_pixel(-84.5, 39.0, 12, 512)
        assert 0 <= px < 512 and 0 <= py < 512


class TestInterpolationSetup:
    def test_interior_pixel_same_tile(self):
        corners, fx, fy = tr.interpolation_setup(1, 1, 100.3, 200.7, 2, 512)
        assert fx == pytest.approx(0.3)
        assert fy == pytest.approx(0.7)
        assert corners == [(1, 1, 100, 200), (1, 1, 101, 200),
                           (1, 1, 100, 201), (1, 1, 101, 201)]

    def test_right_edge_wraps_to_next_tile(self):
        corners, fx, fy = tr.interpolation_setup(1, 1, 511.5, 100.0, 2, 512)
        assert fx == pytest.approx(0.5)
        assert fy == pytest.approx(0.0)
        assert corners == [(1, 1, 511, 100), (2, 1, 0, 100),
                           (1, 1, 511, 101), (2, 1, 0, 101)]

    def test_bottom_edge_wraps_to_next_tile(self):
        corners, fx, fy = tr.interpolation_setup(1, 1, 100.0, 511.5, 2, 512)
        assert fx == pytest.approx(0.0)
        assert fy == pytest.approx(0.5)
        assert corners == [(1, 1, 100, 511), (1, 1, 101, 511),
                           (1, 2, 100, 0), (1, 2, 101, 0)]

    def test_bottom_right_wraps_both_axes(self):
        corners, _, _ = tr.interpolation_setup(1, 1, 511.5, 511.5, 2, 512)
        assert corners == [(1, 1, 511, 511), (2, 1, 0, 511),
                           (1, 2, 511, 0), (2, 2, 0, 0)]

    def test_integer_pixels_zero_fractions(self):
        _, fx, fy = tr.interpolation_setup(1, 1, 100, 200, 2, 512)
        assert fx == 0 and fy == 0

    def test_antimeridian_right_edge_wraps_to_tile0(self):
        corners, _, _ = tr.interpolation_setup(3, 1, 511.5, 100.0, 2, 512)
        assert corners[1][0] == 0 and corners[3][0] == 0
        assert corners[1][2] == 0

    def test_left_tile_edge_normal_operation(self):
        corners, _, _ = tr.interpolation_setup(0, 1, 0.0, 100.0, 2, 512)
        assert corners[0][:1] == (0,) and corners[0][2] == 0
        assert corners[1][0] == 0 and corners[1][2] == 1

    def test_null_below_world_bottom(self):
        assert tr.interpolation_setup(1, 3, 100.0, 511.5, 2, 512) is None

    def test_top_row_in_bounds(self):
        assert tr.interpolation_setup(1, 0, 100.0, 0.0, 2, 512) is not None
