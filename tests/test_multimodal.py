"""Multimodal plumbing tests: the decode/frame-sample stubs are
deterministic, so their distributed output is pinned exactly against a
driver-side recomputation over the same payloads."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from pyspark_streaming_base_spark.functions.multimodal import (
    _decode_payload,
    decode_features,
    sample_frames,
)
from pyspark_streaming_base_spark.queries._tables import t

from tests.conftest import SF_SMALL


def _payloads(spark):
    d = t(spark, SF_SMALL, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return d, {r["doc_id"]: bytes(r["payload"]) for r in d.collect()}


def test_decode_features_matches_stub(spark):
    d, raw = _payloads(spark)
    rows = {r["doc_id"]: r.asDict() for r in decode_features(d, "payload", "doc_id").collect()}
    assert set(rows) == set(raw)
    for doc_id, payload in raw.items():
        expect = _decode_payload(payload)
        got = rows[doc_id]
        for k, v in expect.items():
            assert got[k] == v, (doc_id, k)


def test_null_payloads_dead_letter_not_crash(spark):
    df = spark.createDataFrame(
        [(1, b"abc"), (2, None), (3, b"xy")], "doc_id long, payload binary"
    )
    feats = {r["doc_id"]: r for r in decode_features(df, "payload", "doc_id").collect()}
    assert feats[2]["digest"] is None and feats[2]["payload_bytes"] is None
    assert feats[1]["digest"] == _decode_payload(b"abc")["digest"]
    frames = sample_frames(df, "payload", "doc_id").collect()
    assert {r["doc_id"] for r in frames} == {1, 3}  # NULL row yields no frames


def test_pluggable_decoder_is_used_and_dead_letters(spark):
    # defined inside the test so cloudpickle ships it by value (test
    # modules are not importable on executors)
    class _FixedDecoder:
        """Injectable test backend: fixed geometry, fails on payloads
        containing 'bad' (exercises the dead-letter path)."""

        name = "fixed-test"

        def decode(self, payload: bytes) -> dict:
            if b"bad" in payload:
                raise ValueError("undecodable")
            return {"width": 640, "height": 480, "n_frames": 25}

    df = spark.createDataFrame(
        [(1, b"ok"), (2, b"bad-bytes")], "doc_id long, payload binary"
    )
    feats = {
        r["doc_id"]: r
        for r in decode_features(
            df, "payload", "doc_id", decoder=_FixedDecoder()
        ).collect()
    }
    assert (feats[1]["width"], feats[1]["height"], feats[1]["n_frames"]) == (640, 480, 25)
    assert feats[1]["decoder"] == "fixed-test"
    # framework fields are decoder-independent
    assert feats[1]["digest"] == hashlib.md5(b"ok").hexdigest()
    # decode failure → null features, stage survives, digest retained
    assert feats[2]["width"] is None and feats[2]["n_frames"] is None
    assert feats[2]["digest"] == hashlib.md5(b"bad-bytes").hexdigest()

    frames = sample_frames(
        df, "payload", "doc_id", every_k=10, decoder=_FixedDecoder()
    ).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert sorted(f["frame_idx"] for f in by_doc[1]) == [0, 10, 20]
    assert (by_doc[1][0]["out_width"], by_doc[1][0]["out_height"]) == (256, 192)
    assert 2 not in by_doc  # undecodable → zero frames, not a crash


def test_default_decoder_feature_detection():
    from pyspark_streaming_base_spark.functions.multimodal import (
        PILImageDecoder,
        StubDecoder,
        default_decoder,
    )

    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    dec = default_decoder()
    if has_pil:
        assert isinstance(dec, PILImageDecoder)
    else:
        assert isinstance(dec, StubDecoder)


def test_pil_decoder_real_image():
    """Runs only where Pillow exists (env-skips here): a real PNG decode
    through the same protocol."""
    import pytest

    pytest.importorskip("PIL", reason="Pillow not installed")
    from PIL import Image
    import io as _io

    from pyspark_streaming_base_spark.functions.multimodal import PILImageDecoder

    buf = _io.BytesIO()
    Image.new("RGB", (20, 10)).save(buf, format="PNG")
    meta = PILImageDecoder().decode(buf.getvalue())
    assert (meta["width"], meta["height"], meta["n_frames"]) == (20, 10, 1)


def test_sample_frames_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, b"a")], "doc_id long, payload binary")
    import pytest

    with pytest.raises(ValueError):
        sample_frames(df, "payload", "doc_id", every_k=0)
    with pytest.raises(ValueError):
        sample_frames(df, "payload", "doc_id", max_side=0)


def test_sample_frames_fanout_and_geometry(spark):
    d, raw = _payloads(spark)
    out = sample_frames(d, "payload", "doc_id", every_k=10, max_side=256).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(raw)
    for doc_id, payload in raw.items():
        meta = _decode_payload(payload)
        frames = sorted(by_doc[doc_id], key=lambda r: r["frame_idx"])
        # exact fan-out: ceil(n_frames / 10) sampled frames at indices 0,10,...
        assert [f["frame_idx"] for f in frames] == list(range(0, meta["n_frames"], 10))
        w, h = meta["width"], meta["height"]
        scale = 256 / max(w, h)
        ow, oh = (w, h) if scale >= 1 else (int(w * scale), int(h * scale))
        for f in frames:
            assert (f["out_width"], f["out_height"]) == (ow, oh)
            assert max(f["out_width"], f["out_height"]) <= 256
            fp = hashlib.md5(f"{meta['digest']}:{f['frame_idx']}".encode()).hexdigest()[:16]
            assert f["frame_fp"] == fp


# -- real decode without any media library (BMP header parse) ---------------

def _bmp(width: int, height: int) -> bytes:
    """A real, valid 24-bit BMP built with struct alone."""
    import struct

    row = (width * 3 + 3) // 4 * 4  # rows pad to 4 bytes
    pixel_bytes = row * height
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    return header + bytes(pixel_bytes)


def test_bmp_decoder_parses_real_payloads():
    from pyspark_streaming_base_spark.functions.multimodal import BMPDecoder

    d = BMPDecoder()
    assert d.decode(_bmp(3, 2)) == {"width": 3, "height": 2, "n_frames": 1}
    assert d.decode(_bmp(640, 480))["width"] == 640
    import pytest as _pt

    with _pt.raises(ValueError):
        d.decode(b"not a bitmap")
    with _pt.raises(ValueError):
        d.decode(b"BM" + b"\x00" * 10)  # truncated header


def test_decode_features_with_real_bmp_backend(spark):
    """The SAME Arrow plumbing that runs the stub decodes REAL media:
    genuine BMP payloads report their true dimensions; a corrupt payload
    dead-letters to a null feature row without failing the batch."""
    from pyspark_streaming_base_spark.functions.multimodal import (
        BMPDecoder,
        decode_features,
    )

    rows = [
        (1, _bmp(3, 2)),
        (2, _bmp(640, 480)),
        (3, b"corrupt payload"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.doc_id: r
        for r in decode_features(
            df, id_col="media_id", payload_col="payload", decoder=BMPDecoder()
        ).collect()
    }
    assert (got[1].width, got[1].height, got[1].n_frames) == (3, 2, 1)
    assert (got[2].width, got[2].height) == (640, 480)
    assert got[3].width is None and got[3].height is None  # dead-lettered
    assert got[1].decoder == "bmp-header-v1"


PNG_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_4x3.png")


def test_png_fixture_is_structurally_valid():
    """The committed PNG fixture (hand-crafted via zlib/struct, no
    Pillow needed to build or check it) parses as a spec-valid PNG:
    signature, IHDR geometry, per-chunk CRCs, and decompressed scanline
    length. Runs EVERYWHERE, so the fixture can't rot while the PIL
    decode test below env-skips."""
    import struct
    import zlib

    data = open(PNG_FIXTURE, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks, idat = 8, [], b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        assert crc == zlib.crc32(typ + payload) & 0xFFFFFFFF, typ
        chunks.append(typ)
        if typ == b"IDAT":
            idat += payload
        pos += 12 + ln
    assert chunks == [b"IHDR", b"IDAT", b"IEND"]
    w, h, depth, ctype = struct.unpack(">IIBB", data[16:26])
    assert (w, h, depth, ctype) == (4, 3, 8, 2)  # 8-bit RGB
    raw = zlib.decompress(idat)
    assert len(raw) == h * (1 + 3 * w)  # filter byte + RGB per scanline


def test_pil_decoder_committed_fixture():
    """PILImageDecoder on the COMMITTED fixture — the real-backend path
    executes wherever Pillow exists (env-skips here; the structural test
    above keeps the fixture honest regardless)."""
    import pytest

    pytest.importorskip("PIL", reason="Pillow not installed")
    from pyspark_streaming_base_spark.functions.multimodal import PILImageDecoder

    meta = PILImageDecoder().decode(open(PNG_FIXTURE, "rb").read())
    assert (meta["width"], meta["height"], meta["n_frames"]) == (4, 3, 1)


def test_decode_features_with_pil_backend_on_fixture(spark):
    """decode_features through the REAL Pillow backend over a Spark
    frame built from the committed fixture (env-skips without Pillow):
    proves the mapInPandas plumbing works with a non-stub decoder."""
    import pytest

    pytest.importorskip("PIL", reason="Pillow not installed")
    from pyspark_streaming_base_spark.functions.multimodal import (
        PILImageDecoder,
        decode_features,
    )

    payload = open(PNG_FIXTURE, "rb").read()
    df = spark.createDataFrame(
        [(1, payload), (2, b"not an image")], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in decode_features(
        df, "payload", "doc_id", decoder=PILImageDecoder()
    ).collect()}
    assert (rows[1].width, rows[1].height) == (4, 3)
    assert rows[2].width is None  # dead-letter, not a crash


# -- perceptual image near-dup (REAL pixel decode + aHash, no deps) ----------

def _bmp_px(px) -> bytes:
    """A real 24-bit BMP around an (h, w, 3) BGR uint8 array — rows
    padded to 4 bytes and stored bottom-up, per the public format."""
    import struct

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in px[::-1]:  # bottom-up
        body += row.tobytes() + b"\x00" * (stride - w * 3)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + bytes(body)


def test_bmp_gray_pixels_exact_decode():
    import numpy as np

    from pyspark_streaming_base_spark.functions.multimodal import bmp_gray_pixels

    # 2x3 image with distinct corner values; stride padding exercised
    px = np.zeros((2, 3, 3), dtype=np.uint8)
    px[0, 0] = (255, 0, 0)   # blue  -> luma 0.114*255
    px[0, 2] = (0, 255, 0)   # green -> luma 0.587*255
    px[1, 0] = (0, 0, 255)   # red   -> luma 0.299*255
    px[1, 2] = (255, 255, 255)
    g = bmp_gray_pixels(_bmp_px(px))
    assert g.shape == (2, 3)
    assert abs(g[0, 0] - 0.114 * 255) < 1e-9
    assert abs(g[0, 2] - 0.587 * 255) < 1e-9
    assert abs(g[1, 0] - 0.299 * 255) < 1e-9
    assert abs(g[1, 2] - 255.0) < 1e-9
    assert g[0, 1] == 0.0


def test_ahash64_separates_structure_from_noise():
    import numpy as np

    from pyspark_streaming_base_spark.functions.multimodal import ahash64

    rng = np.random.RandomState(7)
    grad = np.tile(np.linspace(0, 255, 32), (32, 1))  # left-dark gradient
    noisy = np.clip(grad + rng.normal(0, 4, grad.shape), 0, 255)
    inverted = 255.0 - grad

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    a, a2, inv = ahash64(grad), ahash64(noisy), ahash64(inverted)
    assert ham(a, a2) <= 6          # near-dup: light noise
    assert ham(a, inv) >= 50        # structural opposite
    # bit layout: a gradient dark on the left has its HIGH (left) cells
    # below the mean -> leading bits 0, trailing bits 1
    assert (np.uint64(a) >> np.uint64(63)) & np.uint64(1) == 0


def test_image_near_dup_pairs_end_to_end(spark):
    import numpy as np

    from pyspark_streaming_base_spark.operators.imagededup import (
        image_near_dup_pairs,
    )

    rng = np.random.RandomState(42)
    base = rng.randint(0, 256, (24, 24, 3)).astype("uint8")
    near = base.copy()
    near[10:12, 10:12] = 0  # small edit
    other = rng.randint(0, 256, (24, 24, 3)).astype("uint8")
    rows = [
        (1, _bmp_px(base)),
        (2, _bmp_px(near)),
        (3, _bmp_px(other)),
        (4, b"not an image"),  # dead-letters, never pairs
        (5, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = image_near_dup_pairs(
        df, payload_col="payload", id_col="media_id", max_dist=10
    )
    got = {(r.id_a, r.id_b): r.dist for r in pairs.collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] <= 10


def test_image_near_dup_max_dist_zero_exact_duplicates(spark):
    """ADVICE r13: max_dist=0 means ONE 64-bit segment, whose mask
    (1 << 64) - 1 overflowed a JVM long at plan build — the whole-word
    segment must skip the mask. Semantics: exact-hash duplicates only."""
    import numpy as np

    from pyspark_streaming_base_spark.operators.imagededup import (
        image_near_dup_pairs,
    )

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, (24, 24, 3)).astype("uint8")
    other = rng.randint(0, 256, (24, 24, 3)).astype("uint8")
    rows = [
        (1, _bmp_px(base)),
        (2, _bmp_px(base)),   # byte-identical → same hash → dist 0
        (3, _bmp_px(other)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = image_near_dup_pairs(
        df, payload_col="payload", id_col="media_id", max_dist=0
    )
    got = {(r.id_a, r.id_b): r.dist for r in pairs.collect()}
    assert got == {(1, 2): 0}


def test_image_ahash_matches_driver_recompute(spark):
    import numpy as np

    from pyspark_streaming_base_spark.functions.multimodal import (
        ahash64,
        bmp_gray_pixels,
        image_ahash,
    )

    rng = np.random.RandomState(3)
    payloads = [
        (i, _bmp_px(rng.randint(0, 256, (16, 16, 3)).astype("uint8")))
        for i in range(6)
    ]
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    got = {
        r.doc_id: (r.ahash, r.hasher)
        for r in image_ahash(df, payload_col="payload", id_col="media_id").collect()
    }
    want = {i: ahash64(bmp_gray_pixels(p)) for i, p in payloads}
    assert {k: v[0] for k, v in got.items()} == want
    assert all(v[1] == "ahash64/bmp_gray_pixels" for v in got.values())


def test_image_near_dup_rejects_out_of_range_max_dist(spark):
    """ADVICE r6: max_dist >= 64 used to silently return ZERO pairs (the
    pigeonhole blocking needs max_dist+1 segments of a 64-char string) —
    now an explicit ValueError, as is a negative distance."""
    import pytest as _pytest

    from pyspark_streaming_base_spark.operators.imagededup import (
        image_near_dup_pairs,
    )

    df = spark.createDataFrame([(1, b"x")], "media_id long, payload binary")
    for bad in (-1, 64, 100):
        with _pytest.raises(ValueError, match="max_dist"):
            image_near_dup_pairs(
                df, payload_col="payload", id_col="media_id", max_dist=bad
            )


def test_q130_image_neardup_matches_bruteforce_twin(spark):
    """Exactness oracle for q130 (rows-only at the driver — DuckDB cannot
    decode BMP): a numpy twin recomputes every aHash from the SAME
    synthetic BMP bytes driver-side and brute-forces ALL pairs at
    dist <= 8. The blocked join must match pair-for-pair and
    distance-for-distance (pigeonhole blocking is exact)."""
    import duckdb

    from pyspark_streaming_base_spark.functions.multimodal import (
        ahash64,
        bmp_encode_gray,
        synth_gray_pixels,
    )
    from pyspark_streaming_base_spark.queries import load_all

    sf_dir = "/root/testdata/sf0.001"
    ids = [
        r[0]
        for r in duckdb.sql(
            f"select doc_id from '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    import numpy as np

    hashes = {}
    for d in ids:
        px = synth_gray_pixels(d)
        hashes[d * 2] = ahash64(px.astype(float))
        if d % 25 == 0:
            near = px.copy()
            patch = near[6:8, 6:8]
            np.copyto(
                patch,
                np.maximum(patch.astype(np.int16) - 24, 0).astype(np.uint8),
            )
            # the operator hashes the decoded BMP bytes; round-trip is
            # exact for gray BMPs, so hashing pixels directly is the same
            hashes[d * 2 + 1] = ahash64(near.astype(float))
    mids = sorted(hashes)
    want = {
        (a, b): bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
        for i, a in enumerate(mids)
        for b in mids[i + 1 :]
        if bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1") <= 4
    }
    got = {
        (r.id_a, r.id_b): r.dist
        for r in load_all()["q130_image_neardup"].fn(spark, sf_dir).collect()
    }
    assert got == want
    assert len(want) >= len([d for d in ids if d % 25 == 0])  # planted pairs


# ---------------------------------------------------------------------------
# Dependency-free PNG PIXEL decode (r9): the committed fixtures are
# decode-tested in-sandbox — the real-format path no longer hides behind
# the PILImageDecoder env-skip.
# ---------------------------------------------------------------------------

GRAD_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "grad_16x12.png")


def test_png_pixel_decode_committed_tiny_fixture():
    """png_rgb_pixels decodes the committed 4x3 fixture to its exact
    generator formula: pixel (x, y) = (60x, 80y, 40(x+y)) — a full
    pixel-value pin, stronger than any metadata check."""
    import numpy as np

    from pyspark_streaming_base_spark.functions.multimodal import png_rgb_pixels

    px = png_rgb_pixels(open(PNG_FIXTURE, "rb").read())
    assert px.shape == (3, 4, 3)
    y, x = np.mgrid[0:3, 0:4]
    want = np.stack([60 * x, 80 * y, 40 * (x + y)], axis=-1).astype(np.float64)
    assert np.array_equal(px, want)


def test_png_pixel_decode_grad_fixture_pins_ahash():
    """The committed 16x12 fixture (big enough for the 8x8 aHash grid)
    decodes to its integer-mix generator and pins the perceptual hash —
    through png_gray_pixels AND the magic-sniffing gray_pixels
    dispatcher image_ahash can use on mixed corpora."""
    import numpy as np

    from pyspark_streaming_base_spark.functions.multimodal import (
        ahash64,
        gray_pixels,
        png_gray_pixels,
        png_rgb_pixels,
    )

    data = open(GRAD_FIXTURE, "rb").read()
    px = png_rgb_pixels(data)
    assert px.shape == (12, 16, 3)
    y, x = np.mgrid[0:12, 0:16]
    want = np.stack(
        [(x * 16) % 256, (y * 21) % 256, ((x * x + 3 * y * x + 7 * y) * 5) % 256],
        axis=-1,
    ).astype(np.float64)
    assert np.array_equal(px, want)
    assert ahash64(png_gray_pixels(data)) == 3329128136703
    assert ahash64(gray_pixels(data)) == 3329128136703


def test_png_roundtrip_rgb_and_rgba_exact():
    """png_encode_rgb / png_rgb_pixels are exact inverses for 8-bit RGB
    and RGBA (the bmp_encode_gray/bmp_gray_pixels contract), and the
    gray reduction ignores alpha."""
    import numpy as np

    from pyspark_streaming_base_spark.functions.multimodal import (
        png_encode_rgb,
        png_gray_pixels,
        png_rgb_pixels,
    )

    a = ((np.arange(16 * 12 * 3).reshape(16, 12, 3) * 37) % 256).astype(np.uint8)
    assert np.array_equal(png_rgb_pixels(png_encode_rgb(a)).astype(np.uint8), a)
    a4 = ((np.arange(9 * 8 * 4).reshape(9, 8, 4) * 53) % 256).astype(np.uint8)
    assert np.array_equal(png_rgb_pixels(png_encode_rgb(a4)).astype(np.uint8), a4)
    opaque = np.dstack([a4[..., :3], np.full((9, 8), 255, np.uint8)])
    assert np.array_equal(
        png_gray_pixels(png_encode_rgb(opaque)),
        png_gray_pixels(png_encode_rgb(a4[..., :3].copy())),
    )


def test_png_all_five_scanline_filters_decode():
    """Spec-conformance for the filter inverses: craft a PNG whose five
    rows use filters 0..4 (filtered bytes computed FORWARD from the spec
    formulas: Sub, Up, Average, Paeth), decode, and compare to the
    original pixels."""
    import struct
    import zlib

    import numpy as np

    from pyspark_streaming_base_spark.functions.multimodal import png_rgb_pixels

    h, w, ch = 5, 6, 3
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack(
        [(x * 41 + y * 7) % 256, (x * 13 + y * 29) % 256, (x * x + y * 3) % 256],
        axis=-1,
    ).astype(np.int64)
    flat = px.reshape(h, w * ch)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = b""
    for yy in range(h):
        f = yy % 5
        cur, prev = flat[yy], (flat[yy - 1] if yy else np.zeros(w * ch, np.int64))
        line = bytearray([f])
        for xx in range(w * ch):
            left = cur[xx - ch] if xx >= ch else 0
            up = prev[xx]
            ul = prev[xx - ch] if xx >= ch else 0
            pred = [0, left, up, (left + up) >> 1, paeth(left, up, ul)][f]
            line.append((int(cur[xx]) - int(pred)) & 0xFF)
        raw += bytes(line)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(png_rgb_pixels(png).astype(np.int64), px)


def test_png_decoder_metadata_and_rejections():
    """PNGDecoder reads IHDR geometry header-only; png_rgb_pixels
    rejects everything outside the supported profile (bad magic,
    unsupported color type) so payloads dead-letter instead of
    corrupting a batch."""
    import pytest

    from pyspark_streaming_base_spark.functions.multimodal import (
        PNGDecoder,
        png_rgb_pixels,
    )

    meta = PNGDecoder().decode(open(GRAD_FIXTURE, "rb").read())
    assert (meta["width"], meta["height"], meta["n_frames"]) == (16, 12, 1)
    with pytest.raises(ValueError):
        PNGDecoder().decode(b"not a png")
    with pytest.raises(ValueError):
        png_rgb_pixels(b"BMnot a png either")
    # grayscale (color type 0) is outside the RGB/RGBA profile
    import struct
    import zlib

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    gray_png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="RGB/RGBA"):
        png_rgb_pixels(gray_png)


def test_png_decode_bombs_raise_instead_of_allocating():
    """IHDR is attacker-controlled: a payload declaring huge dimensions,
    and a decompression bomb whose zlib stream inflates past the
    declared size, must both raise a dead-letterable ValueError BEFORE
    allocating/inflating — not OOM the executor."""
    import struct
    import zlib

    import pytest

    from pyspark_streaming_base_spark.functions.multimodal import (
        MAX_PNG_DECODED_BYTES,
        png_rgb_pixels,
    )

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    def png(w, h, payload):
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(payload))
            + chunk(b"IEND", b"")
        )

    # ~120 GB declared from a <100-byte payload: rejected at the cap,
    # before any decompression or allocation
    bomb_dims = png(200_000, 200_000, b"\x00")
    assert len(bomb_dims) < 100
    with pytest.raises(ValueError, match="cap"):
        png_rgb_pixels(bomb_dims)
    assert 200_000 * (1 + 200_000 * 3) > MAX_PNG_DECODED_BYTES

    # stream inflates far past the 2x2 declared size: the bounded
    # decompressobj stops at expected+1 bytes and raises
    bomb_stream = png(2, 2, b"\x00" * 10_000_000)
    with pytest.raises(ValueError, match="length mismatch"):
        png_rgb_pixels(bomb_stream)

    # stream SHORTER than declared still raises (the pre-existing check)
    with pytest.raises(ValueError, match="length mismatch"):
        png_rgb_pixels(png(4, 4, b"\x00" * 5))


def test_image_ahash_over_mixed_bmp_png_corpus(spark):
    """image_ahash with the gray_pixels dispatcher over ONE binary
    column carrying BOTH formats: BMP and PNG rows hash, junk
    dead-letters to null — the mixed-corpus deployment shape."""
    import numpy as np

    from pyspark_streaming_base_spark.functions.multimodal import (
        ahash64,
        bmp_encode_gray,
        bmp_gray_pixels,
        gray_pixels,
        image_ahash,
        png_encode_rgb,
        png_gray_pixels,
    )

    g = ((np.arange(12 * 16).reshape(12, 16) * 11) % 256).astype(np.uint8)
    bmp = bmp_encode_gray(g)
    png = open(GRAD_FIXTURE, "rb").read()
    df = spark.createDataFrame(
        [(1, bmp), (2, png), (3, b"junk")], "doc_id long, payload binary"
    )
    rows = {
        r.doc_id: r
        for r in image_ahash(
            df, payload_col="payload", id_col="doc_id", pixel_reader=gray_pixels
        ).collect()
    }
    assert rows[1].ahash == ahash64(bmp_gray_pixels(bmp))
    assert rows[2].ahash == ahash64(png_gray_pixels(png))
    assert rows[3].ahash is None
    assert rows[1].hasher == "ahash64/gray_pixels"
