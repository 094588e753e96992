"""Multimodal (binary payload) processing over Arrow-batched Pandas.

Real Spark plumbing — schemas, ``mapInPandas`` batch iteration,
partition-parallel decode — with the actual media decode stubbed: the
image/audio libraries are not available in this environment, so
``_decode_payload`` derives deterministic fake dimensions from the payload
digest. Swapping in a real decoder (PIL/ffmpeg) changes ONE function; the
distributed execution shape stays identical.

Scale notes:

* decode runs where the data lives — one Arrow batch at a time per task,
  never materializing a partition in memory;
* output schema is fixed up front (no inference), so 1000 executors agree
  without coordination;
* payloads stay off the driver; only typed features flow downstream.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

#: Output schema of the decode stage — typed features, no blobs.
DECODE_SCHEMA = (
    "doc_id bigint, payload_bytes bigint, digest string, "
    "width int, height int, n_frames int, decoder string"
)


def _decode_payload(payload: bytes) -> dict:
    """STUB decoder — deterministic fake media properties.

    A real implementation would be, e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # not installed here
        return {"width": img.width, ...}

    Instead, width/height/frames are read off the md5 digest so results
    are stable across runs/engines. Raises nothing; a production decoder
    should catch per-item errors and emit a null row (dead-letter pattern).
    """
    digest = hashlib.md5(payload).hexdigest()
    return {
        "payload_bytes": len(payload),
        "digest": digest,
        "width": 16 + int(digest[:4], 16) % 4080,
        "height": 16 + int(digest[4:8], 16) % 4080,
        "n_frames": 1 + int(digest[8:12], 16) % 120,
        "decoder": "stub-md5-v1",
    }


def decode_features(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Decode binary payloads into typed features via ``mapInPandas``.

    Arrow moves each batch into Python once; the stub decode is pure
    CPU-per-row. The iterator contract means constant memory per task
    regardless of partition size.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        null_row = {k: None for k in ("payload_bytes", "digest", "width", "height", "n_frames", "decoder")}
        for pdf in it:
            # NULL payloads dead-letter to an all-null feature row instead of
            # killing the stage (binary columns are nullable by default).
            feats = [
                null_row if p is None else _decode_payload(bytes(p))
                for p in pdf[payload_col]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(batches, schema=DECODE_SCHEMA)


#: Output schema of the frame-sample stage — one row PER SAMPLED FRAME.
FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_fp string, "
    "out_width int, out_height int"
)


def sample_frames(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    every_k: int = 10,
    max_side: int = 256,
) -> DataFrame:
    """Frame-sample + resize pipeline over binary video payloads.

    Row-expanding ``mapInPandas``: each payload decodes (stub) to
    ``n_frames`` frames; every ``every_k``-th frame is kept and "resized"
    so its longest side is ``max_side`` (aspect preserved, integer floor —
    the geometry math is real; the pixel work is where ffmpeg/PIL would
    slot in). Frame fingerprints are md5(digest ‖ frame_idx) — stable
    across engines/runs.

    Scale: output fan-out is bounded by ``n_frames / every_k`` per row and
    produced lazily batch-by-batch, so a task's memory stays O(batch), not
    O(frames-in-partition); downstream joins key on (doc_id, frame_idx),
    never the blob.
    """

    if every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")
    if max_side < 1:
        raise ValueError(f"max_side must be >= 1, got {max_side}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:  # NULL payload → no frames, not a stage crash
                    continue
                meta = _decode_payload(bytes(p))
                w, h = meta["width"], meta["height"]
                scale = max_side / max(w, h)
                # downscale only — small media keeps its native geometry
                ow, oh = (w, h) if scale >= 1 else (int(w * scale), int(h * scale))
                for idx in range(0, meta["n_frames"], every_k):
                    fp = hashlib.md5(
                        f"{meta['digest']}:{idx}".encode()
                    ).hexdigest()[:16]
                    rows.append((doc_id, idx, fp, ow, oh))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_fp", "out_width", "out_height"],
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)
