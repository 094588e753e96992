"""WAV/RIFF header tier (`functions/multimodal.py::wav_metadata` /
`wav_encode` / `WAVDecoder`): committed hand-assembled fixtures pin the
parser against byte streams the encoder did not produce (18-byte fmt
extension, fact chunk, post-data LIST behind an odd data chunk's pad
byte); property round-trips pin the inverse pair; malformed payloads
dead-letter with ValueError; and the q193 audit query's distributed
output mirrors a pure-python recomputation row for row."""

from __future__ import annotations

import hashlib
import os

import pytest

from pyspark_streaming_base_spark.functions.multimodal import (
    WAVDecoder,
    wav_encode,
    wav_metadata,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_fixture_fmt18_fact_list():
    """Non-encoder bytes: 18-byte PCM fmt (cbSize=0 extension), a fact
    chunk, and a LIST chunk between fmt and data — a parser hardcoding
    the encoder's 16-byte fmt / fmt-then-data layout fails here."""
    payload = open(os.path.join(FIX, "pcm16k_fmt18.wav"), "rb").read()
    assert wav_metadata(payload) == {
        "audio_format": 1,
        "channels": 1,
        "sample_rate": 16000,
        "bits_per_sample": 16,
        "n_frames": 25,
        "duration_us": 25 * 1_000_000 // 16000,
    }
    assert WAVDecoder().decode(payload) == {
        "width": 1, "height": 16, "n_frames": 25,
    }


def test_fixture_odd_data_pad_byte():
    """13 bytes of 8-bit mono data (odd chunk) followed by a trailing
    LIST chunk: a walker that forgets RIFF word alignment reads the
    trailing chunk id one byte off and dies on a garbage size."""
    payload = open(os.path.join(FIX, "odd_data_8bit.wav"), "rb").read()
    assert wav_metadata(payload) == {
        "audio_format": 1,
        "channels": 1,
        "sample_rate": 11025,
        "bits_per_sample": 8,
        "n_frames": 13,
        "duration_us": 13 * 1_000_000 // 11025,
    }


@pytest.mark.parametrize(
    "kw",
    [
        dict(sample_rate=44100, channels=2, bits_per_sample=16, n_frames=1000),
        dict(sample_rate=8000, channels=1, bits_per_sample=8, n_frames=7),
        dict(sample_rate=48000, channels=2, bits_per_sample=24, n_frames=0),
        dict(
            sample_rate=22050,
            channels=1,
            bits_per_sample=16,
            n_frames=3,
            list_chunk=True,
        ),
    ],
)
def test_encode_parse_roundtrip(kw):
    m = wav_metadata(wav_encode(**kw))
    assert m["sample_rate"] == kw["sample_rate"]
    assert m["channels"] == kw["channels"]
    assert m["bits_per_sample"] == kw["bits_per_sample"]
    assert m["n_frames"] == kw["n_frames"]
    assert m["audio_format"] == 1
    assert (
        m["duration_us"] == kw["n_frames"] * 1_000_000 // kw["sample_rate"]
    )


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"\xff\xd8\xff\xd9",  # wrong container (JPEG)
        b"RIFF\x04\x00\x00\x00WAVE",  # no chunks at all
        # fmt declares 16 bytes but the payload ends first
        b"RIFF\x14\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00",
        # data only, no fmt
        b"RIFF\x10\x00\x00\x00WAVEdata\x04\x00\x00\x00\x00\x00\x00\x00",
        # short fmt (8 bytes < the 16-byte PCM minimum)
        b"RIFF\x18\x00\x00\x00WAVEfmt \x08\x00\x00\x00"
        b"\x01\x00\x01\x00\x40\x1f\x00\x00"
        b"data\x00\x00\x00\x00",
    ],
)
def test_malformed_raises(bad):
    with pytest.raises(ValueError):
        wav_metadata(bad)
    # truncating a valid stream anywhere inside a chunk raises too
    good = wav_encode(16000, 1, 16, 25)
    with pytest.raises(ValueError):
        wav_metadata(good[:30])


def test_degenerate_fmt_geometry_raises():
    import struct

    # zero sample_rate / channels / block_align are degenerate even when
    # the chunk layout is intact
    def wav_with_fmt(fmt_body):
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
            + b"data\x02\x00\x00\x00\x00\x00"
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    for fmt in (
        struct.pack("<HHIIHH", 1, 0, 16000, 32000, 2, 16),  # 0 channels
        struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16),  # 0 rate
        struct.pack("<HHIIHH", 1, 1, 16000, 0, 0, 16),  # 0 block_align
    ):
        with pytest.raises(ValueError):
            wav_metadata(wav_with_fmt(fmt))


def test_encoder_rejects_bad_geometry():
    with pytest.raises(ValueError):
        wav_encode(0, 1, 16, 10)
    with pytest.raises(ValueError):
        wav_encode(8000, 0, 16, 10)
    with pytest.raises(ValueError):
        wav_encode(8000, 1, 12, 10)  # bits not a byte multiple
    with pytest.raises(ValueError):
        wav_encode(8000, 1, 16, -1)


def _expected_row(doc_id: int, text: str):
    dg = hashlib.md5(text.encode("utf-8")).hexdigest()
    if int(dg[11:13], 16) % 16 == 0:
        return (doc_id, False, None, None, None, None, None)
    sr = 8000 + int(dg[0:4], 16) % 40001
    nf = 1 + int(dg[6:9], 16) % 4096
    return (
        doc_id,
        True,
        sr,
        1 + int(dg[4:5], 16) % 2,
        8 * (1 + int(dg[5:6], 16) % 3),
        nf,
        nf * 1_000_000 // sr,
    )


def test_q193_matches_python_mirror(spark):
    from pyspark_streaming_base_spark.queries import load_all
    from pyspark_streaming_base_spark.queries._tables import t

    from tests.conftest import SF_SMALL

    got = sorted(
        tuple(r)
        for r in load_all()["q193_wav_metadata_audit"].fn(spark, SF_SMALL).collect()
    )
    docs = t(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    want = sorted(_expected_row(r["doc_id"], r["text"]) for r in docs)
    assert got == want
    # both tiers actually occur in the fixture corpus
    oks = {r[1] for r in got}
    assert oks == {True, False}
