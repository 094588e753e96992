"""Perceptual image near-dup detection — the multimodal member of the
dedup family (the image analogue of MinHash for text): decode pixels →
64-bit average hash → bit-Hamming blocked self-join.

The reference has no media operators; this follows the repo's own
C17/C18 scale rules. What makes it scale-safe:

* the blob is reduced to 8 BYTES (the aHash) at the scan — pixels never
  enter an exchange;
* candidate generation is the pigeonhole segment blocking of
  ``operators/fuzzyjoin.py`` SPECIALIZED to the 64-bit integer domain
  (r13): the ``max_dist + 1`` segments are shift/mask bit fields of the
  hash — an equi-join on ``(seg_idx, seg_bits)`` longs with ZERO recall
  loss (two hashes within bit-Hamming ``k`` agree on at least one of
  the ``k + 1`` bit segments), never an all-pairs comparison;
* verification is ONE intrinsic — ``bit_count(ha ^ hb)`` — and the two
  8-byte hashes ride through the candidate join, so no re-attach joins
  and no 64-char bit strings anywhere (the r≤12 shape detoured through
  ``lpad(bin(...))`` strings and the generic character-Hamming
  machinery: 64-element zip_with per candidate plus four extra
  re-attach/expand shuffles — measured ~2.4× slower end to end at
  sf0.1 with identical output).

A real deployment swaps :func:`bmp_gray_pixels` for a Pillow/ffmpeg
reader — one function returning a grayscale matrix; everything from the
hash down is format-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.functions.multimodal import image_ahash


def image_near_dup_pairs(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    max_dist: int = 6,
    pixel_reader=None,
) -> DataFrame:
    """All image pairs (id_a < id_b) whose average hashes differ in at
    most ``max_dist`` of 64 bits. Undecodable payloads dead-letter out
    of the hash stage (null ``ahash``) and never pair. ``dist`` is the
    exact bit-Hamming distance of the two hashes."""
    if not 0 <= max_dist <= 63:
        # the pigeonhole blocking needs max_dist + 1 segments of the
        # 64-bit hash; out of range would silently emit ZERO pairs
        # instead of all-pairs semantics
        raise ValueError(f"max_dist must be in [0, 63], got {max_dist}")
    hashed = image_ahash(df, payload_col=payload_col, id_col=id_col,
                         pixel_reader=pixel_reader)
    n_seg = max_dist + 1
    q, r = divmod(64, n_seg)
    # contiguous MSB-first bit segments, the same canonical even split
    # as fuzzyjoin._segments (first r segments one bit longer); each is
    # (hash >>> bits-right-of-segment) & ((1 << len) - 1) — a pure
    # projection, no strings
    segs, start = [], 0
    for i in range(n_seg):
        seg_len = q + (1 if i < r else 0)
        shift = 64 - start - seg_len
        field = F.shiftrightunsigned(F.col("ahash"), shift) if shift else F.col(
            "ahash"
        )
        if seg_len < 64:
            field = field.bitwiseAND(F.lit((1 << seg_len) - 1))
        # else: the segment IS the whole word (max_dist=0 ⇒ one 64-bit
        # segment) — (1 << 64) - 1 overflows a JVM long literal, and the
        # mask would be a no-op anyway (r13 advice)
        segs.append(field)
        start += seg_len
    keyed = (
        hashed.filter(F.col("ahash").isNotNull())
        .select(
            F.col("doc_id").alias(id_col),
            F.col("ahash"),
            F.posexplode(F.array(*segs)).alias("_seg_idx", "_seg"),
        )
    )
    # SHUFFLE_HASH both sides (the index_band_pairs convention): segment
    # buckets are near-unique for random hashes so neither side
    # broadcasts at corpus scale, and sort-merge would pay two sorts for
    # a bag-of-buckets join. A pair sharing m segments appears m times;
    # the verify is a 2-instruction projection, so verify-then-dedup
    # beats a separate candidate-dedup exchange.
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.hint("shuffle_hash")
        .join(
            b.hint("shuffle_hash"),
            (F.col("a._seg_idx") == F.col("b._seg_idx"))
            & (F.col("a._seg") == F.col("b._seg"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.ahash").bitwiseXOR(F.col("b.ahash")))
            .cast("int")
            .alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
        .dropDuplicates(["id_a", "id_b"])
    )
