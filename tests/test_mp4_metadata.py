"""MP4/ISO-BMFF header tier (`functions/multimodal.py::mp4_metadata` /
`mp4_encode` / `MP4Decoder`): committed hand-assembled fixtures pin the
parser against byte streams the encoder did not produce (version-1 tkhd,
two-entry stsd, uuid/mvex boxes, size==0 mdat-to-EOF, audio-only file);
property round-trips pin the inverse pair across the three planted
layout quirks; malformed payloads dead-letter with ValueError; and the
q196 audit query's distributed output mirrors a pure-python
recomputation row for row."""

from __future__ import annotations

import hashlib
import os
import struct

import pytest

from pyspark_streaming_base_spark.functions.multimodal import (
    MP4Decoder,
    mp4_encode,
    mp4_metadata,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_fixture_v1_tkhd_two_entry_stsd():
    """Non-encoder bytes: version-1 tkhd (96-byte body — the width/
    height-are-the-last-8-bytes rule, not a hardcoded v0 offset), a
    TWO-entry stsd (first entry wins), uuid and mvex boxes a walker must
    skip by size, and a size==0 mdat extending to EOF."""
    payload = open(os.path.join(FIX, "v1_twoentry.mp4"), "rb").read()
    assert mp4_metadata(payload) == {
        "major_brand": "mp42",
        "timescale": 90000,
        "duration_ticks": 180000,
        "duration_us": 2_000_000,
        "n_tracks": 1,
        "width": 1280,
        "height": 720,
        "video_codec": "vp09",
        "has_audio": False,
    }
    assert MP4Decoder().decode(payload) == {
        "width": 1280, "height": 720, "n_frames": 180000,
    }


def test_fixture_audio_only_is_valid_but_videoless():
    """An M4A-branded audio-only file is VALID at the metadata tier
    (width/height/codec None, has_audio true) — only the Decoder
    contract, which promises video geometry, dead-letters it."""
    payload = open(os.path.join(FIX, "audio_only.m4a.mp4"), "rb").read()
    assert mp4_metadata(payload) == {
        "major_brand": "M4A ",
        "timescale": 44100,
        "duration_ticks": 441000,
        "duration_us": 10_000_000,
        "n_tracks": 1,
        "width": None,
        "height": None,
        "video_codec": None,
        "has_audio": True,
    }
    with pytest.raises(ValueError):
        MP4Decoder().decode(payload)


@pytest.mark.parametrize(
    "kw",
    [
        dict(timescale=30000, duration_ticks=90000, width=1920, height=1080),
        dict(timescale=600, duration_ticks=0, width=16, height=16,
             video_codec="hev1", audio_track=True),
        dict(timescale=90000, duration_ticks=12345, width=640, height=480,
             mdat_first=True),
        dict(timescale=1000, duration_ticks=7, width=320, height=240,
             largesize_mdat=True, mvhd_v1=True),
        dict(timescale=25, duration_ticks=2**33, width=128, height=96,
             mvhd_v1=True, audio_track=True, mdat_first=True),
    ],
)
def test_encode_parse_roundtrip(kw):
    m = mp4_metadata(mp4_encode(**kw))
    assert m["timescale"] == kw["timescale"]
    assert m["duration_ticks"] == kw["duration_ticks"]
    assert m["width"] == kw["width"]
    assert m["height"] == kw["height"]
    assert m["video_codec"] == kw.get("video_codec", "avc1")
    assert m["has_audio"] == kw.get("audio_track", False)
    assert m["n_tracks"] == (2 if kw.get("audio_track") else 1)
    assert m["major_brand"] == "isom"
    assert (
        m["duration_us"]
        == kw["duration_ticks"] * 1_000_000 // kw["timescale"]
    )


def test_layout_quirks_do_not_change_values():
    """mdat-before-moov, 64-bit largesize, and version-1 mvhd are
    LAYOUT, not content: all eight quirk combinations parse to the same
    values (what the q196 oracle implicitly asserts corpus-wide)."""
    base = dict(timescale=48000, duration_ticks=96000, width=864, height=480,
                video_codec="hev1", audio_track=True)
    want = mp4_metadata(mp4_encode(**base))
    for bits in range(8):
        got = mp4_metadata(
            mp4_encode(
                **base,
                mdat_first=bool(bits & 1),
                largesize_mdat=bool(bits & 2),
                mvhd_v1=bool(bits & 4),
            )
        )
        assert got == want


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"RIFF\x24\x00\x00\x00WAVE",  # wrong container (WAV)
        # a lone ftyp with no moov
        struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0),
        # box size smaller than its own header
        struct.pack(">I", 4) + b"moov",
        # box size overrunning the payload
        struct.pack(">I", 4096) + b"moov" + b"\x00" * 8,
        # moov/mvhd present but moov has no trak
        struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
        + struct.pack(">I", 36) + b"moov"
        + struct.pack(">I", 28) + b"mvhd" + b"\x00" * 4
        + struct.pack(">III", 0, 0, 600) + struct.pack(">I", 100),
    ],
)
def test_malformed_raises(bad):
    with pytest.raises(ValueError):
        mp4_metadata(bad)
    # truncating a valid stream anywhere inside a box raises too
    good = mp4_encode(30000, 90000, 640, 480)
    with pytest.raises(ValueError):
        mp4_metadata(good[:40])


def test_degenerate_mvhd_timescale_raises():
    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    mvhd = box(
        b"mvhd",
        b"\x00" * 4 + struct.pack(">IIII", 0, 0, 0, 100) + b"\x00" * 80,
    )
    trak = box(b"trak", box(b"mdia", box(
        b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)))
    payload = (
        box(b"ftyp", b"isom" + struct.pack(">I", 0))
        + box(b"moov", mvhd + trak)
    )
    with pytest.raises(ValueError):
        mp4_metadata(payload)


def test_encoder_rejects_bad_geometry():
    with pytest.raises(ValueError):
        mp4_encode(0, 100, 640, 480)
    with pytest.raises(ValueError):
        mp4_encode(600, -1, 640, 480)
    with pytest.raises(ValueError):
        mp4_encode(600, 100, 0, 480)
    with pytest.raises(ValueError):
        mp4_encode(600, 100, 640, 480, video_codec="toolong")


def _expected_row(doc_id: int, text: str):
    dg = hashlib.md5(text.encode("utf-8")).hexdigest()
    if int(dg[16:18], 16) % 16 == 0:
        return (doc_id, False, None, None, None, None, None, None)
    ts = 1000 + int(dg[0:4], 16) % 59001
    dur = 1 + int(dg[4:8], 16) % 100000
    return (
        doc_id,
        True,
        dur * 1_000_000 // ts,
        16 * (1 + int(dg[8:10], 16) % 120),
        16 * (1 + int(dg[10:12], 16) % 68),
        2 if int(dg[12:13], 16) % 2 == 1 else 1,
        "hev1" if int(dg[13:14], 16) % 2 else "avc1",
        int(dg[12:13], 16) % 2 == 1,
    )


def test_q196_matches_python_mirror(spark):
    from pyspark_streaming_base_spark.queries import load_all
    from pyspark_streaming_base_spark.queries._tables import t

    from tests.conftest import SF_SMALL

    got = sorted(
        tuple(r)
        for r in load_all()["q196_mp4_metadata_audit"].fn(spark, SF_SMALL).collect()
    )
    docs = t(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    want = sorted(
        _expected_row(r["doc_id"], r["text"]) for r in docs
    )
    assert got == want
    # both tiers actually occur in the fixture corpus
    oks = {r[1] for r in got}
    assert oks == {True, False}


# ---------------------------------------------------------------------------
# Robustness fuzz tier (r13): the dead-letter contract upstream catches
# ValueError ONLY — any other exception (struct.error from an unchecked
# unpack, IndexError, infinite walk) would crash the Arrow stage instead
# of dead-lettering one row. On a 100 TB crawl the parser WILL see every
# byte pattern; these pins make "parse or ValueError, always terminates"
# an invariant for all three modality parsers.

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_streaming_base_spark.functions.multimodal import (
    jpeg_encode_structural,
    jpeg_metadata,
    wav_encode,
    wav_metadata,
)

_PARSERS = (jpeg_metadata, wav_metadata, mp4_metadata)


def _parse_or_valueerror(parser, payload):
    try:
        parser(payload)
    except ValueError:
        pass  # the dead-letter path — the only legal failure mode


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_parsers_only_raise_valueerror_on_random_bytes(data):
    for parser in _PARSERS:
        _parse_or_valueerror(parser, data)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**9),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_parsers_survive_byte_smash_on_valid_streams(pos, word):
    """Overwrite 4 bytes of each VALID payload at an arbitrary offset
    (sizes, fourccs, counts — whatever lives there) — still parse or
    ValueError, never anything else."""
    smash = word.to_bytes(4, "big")
    for parser, payload in (
        (jpeg_metadata, jpeg_encode_structural(64, 64, 3, False, True)),
        (wav_metadata, wav_encode(16000, 2, 16, 50, list_chunk=True)),
        (
            mp4_metadata,
            mp4_encode(30000, 90000, 640, 480, audio_track=True,
                       largesize_mdat=True),
        ),
    ):
        i = pos % max(1, len(payload) - 4)
        _parse_or_valueerror(parser, payload[:i] + smash + payload[i + 4 :])


def test_parsers_survive_every_truncation():
    """Exhaustive: every prefix of a valid stream parses or raises
    ValueError (a prefix CAN be valid — e.g. an MP4 cut exactly before
    its mdat still has a complete moov)."""
    for parser, payload in (
        (jpeg_metadata, jpeg_encode_structural(64, 64, 3, True, False)),
        (wav_metadata, wav_encode(44100, 1, 24, 13)),
        (mp4_metadata, mp4_encode(600, 1200, 320, 240, mdat_first=True,
                                  mvhd_v1=True)),
    ):
        for k in range(len(payload)):
            _parse_or_valueerror(parser, payload[:k])
