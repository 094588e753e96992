"""JPEG header tier (`functions/multimodal.py::jpeg_metadata` /
`jpeg_encode_structural` / `JPEGDecoder`): committed hand-assembled
fixtures pin the parser against byte streams the encoder did not
produce; property round-trips pin the inverse pair; malformed payloads
dead-letter with ValueError; and the q188 audit query's distributed
output mirrors a pure-python recomputation row for row."""

from __future__ import annotations

import hashlib
import os

import pytest

from pyspark_streaming_base_spark.functions.multimodal import (
    JPEGDecoder,
    jpeg_encode_structural,
    jpeg_metadata,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_fixture_base_20x14():
    payload = open(os.path.join(FIX, "base_20x14.jpg"), "rb").read()
    assert jpeg_metadata(payload) == {
        "width": 20,
        "height": 14,
        "n_frames": 1,
        "precision": 8,
        "n_components": 3,
        "progressive": False,
        "has_exif": False,
    }
    assert JPEGDecoder().decode(payload) == {
        "width": 20, "height": 14, "n_frames": 1,
    }


def test_fixture_prog_exif_33x7():
    """Progressive SOF2 + big-endian Exif APP1 + a COM segment + a fill
    byte before the SOF marker — the marker-stream hazards a real crawl
    hits."""
    payload = open(os.path.join(FIX, "prog_exif_33x7.jpg"), "rb").read()
    assert jpeg_metadata(payload) == {
        "width": 33,
        "height": 7,
        "n_frames": 1,
        "precision": 8,
        "n_components": 1,
        "progressive": True,
        "has_exif": True,
    }


@pytest.mark.parametrize(
    "kw",
    [
        dict(width=1, height=1, n_components=1),
        dict(width=65535, height=65535, n_components=255),
        dict(width=640, height=480, progressive=True),
        dict(width=12, height=34, exif=True, precision=12),
        dict(width=320, height=0, n_components=4),  # DNL-deferred height
    ],
)
def test_encode_parse_roundtrip(kw):
    m = jpeg_metadata(jpeg_encode_structural(**kw))
    assert m["width"] == kw["width"] and m["height"] == kw["height"]
    assert m["n_components"] == kw.get("n_components", 3)
    assert m["progressive"] is kw.get("progressive", False)
    assert m["has_exif"] is kw.get("exif", False)
    assert m["precision"] == kw.get("precision", 8)


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"\x89PNG\r\n\x1a\n",  # wrong container
        b"\xff\xd8\xff\xd9",  # EOI before any SOF
        b"\xff\xd8\xff\xda\x00\x04\x01\x00",  # SOS before any SOF
        b"\xff\xd8\xff\xe0\x00\xff",  # segment length past the payload
        b"\xff\xd8\xff\xc0\x00\x01",  # SOF length < 2 is illegal
    ],
)
def test_malformed_raises(bad):
    with pytest.raises(ValueError):
        jpeg_metadata(bad)
    # truncating a valid stream anywhere inside a segment raises too
    good = jpeg_encode_structural(width=20, height=14)
    with pytest.raises(ValueError):
        jpeg_metadata(good[:25])


def test_encoder_rejects_bad_geometry():
    with pytest.raises(ValueError):
        jpeg_encode_structural(width=0, height=10)
    with pytest.raises(ValueError):
        jpeg_encode_structural(width=70000, height=10)
    with pytest.raises(ValueError):
        jpeg_encode_structural(width=10, height=10, n_components=0)


def _expected_row(doc_id: int, text: str):
    dg = hashlib.md5(text.encode("utf-8")).hexdigest()
    if int(dg[11:13], 16) % 16 == 0:
        return (doc_id, False, None, None, None, None, None)
    return (
        doc_id,
        True,
        16 + int(dg[0:4], 16) % 2000,
        16 + int(dg[4:8], 16) % 2000,
        1 + int(dg[8:9], 16) % 4,
        int(dg[9:10], 16) % 2 == 1,
        int(dg[10:11], 16) % 2 == 1,
    )


def test_q188_matches_python_mirror(spark):
    from pyspark_streaming_base_spark.queries import load_all
    from pyspark_streaming_base_spark.queries._tables import t

    from tests.conftest import SF_SMALL

    got = sorted(
        tuple(r)
        for r in load_all()["q188_jpeg_metadata_audit"].fn(spark, SF_SMALL).collect()
    )
    docs = t(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    want = sorted(_expected_row(r["doc_id"], r["text"]) for r in docs)
    assert got == want
    # both tiers actually occur in the fixture corpus
    oks = [g[1] for g in got]
    assert any(oks) and not all(oks)
