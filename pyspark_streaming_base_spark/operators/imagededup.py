"""Perceptual image near-dup detection — the multimodal member of the
dedup family (the image analogue of MinHash for text): decode pixels →
64-bit average hash → bit-Hamming blocked self-join.

The reference has no media operators; this follows the repo's own
C17/C18 scale rules. What makes it scale-safe:

* the blob is reduced to 8 BYTES (the aHash) at the scan — pixels never
  enter an exchange;
* candidate generation reuses the pigeonhole segment blocking from
  ``operators/fuzzyjoin.py`` on the hash's 64-character bit string —
  an equi-join over ``max_dist + 1`` segments with ZERO recall loss
  (character Hamming on the padded bit string IS bit Hamming), never an
  all-pairs comparison;
* the pair exchange is keys-only by the fuzzy-join construction
  (identical hashes collapse to one representative; strings re-attach
  per candidate).

A real deployment swaps :func:`bmp_gray_pixels` for a Pillow/ffmpeg
reader — one function returning a grayscale matrix; everything from the
hash down is format-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.functions.multimodal import image_ahash
from pyspark_streaming_base_spark.operators.fuzzyjoin import hamming_self_join


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
        # the pigeonhole blocking needs max_dist + 1 segments out of a
        # 64-char bit string; out of range would silently emit ZERO
        # pairs (hamming_self_join drops strings shorter than the
        # segment count) instead of all-pairs semantics
        raise ValueError(f"max_dist must be in [0, 63], got {max_dist}")
    hashed = image_ahash(df, payload_col=payload_col, id_col=id_col,
                         pixel_reader=pixel_reader)
    # F.bin renders the int64's two's-complement bits (Long.toBinaryString,
    # no sign character), so lpad-to-64 gives a fixed-width bit string and
    # character Hamming == bit Hamming
    bits = hashed.filter(F.col("ahash").isNotNull()).select(
        F.col("doc_id").alias(id_col),
        F.lpad(F.bin(F.col("ahash")), 64, "0").alias("_bits"),
    )
    return hamming_self_join(
        bits, id_col=id_col, str_col="_bits", max_dist=max_dist
    )
