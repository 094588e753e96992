"""Multimodal column operators (SURVEY.md §2C "multimodal columns").

Treats media as opaque ``binary`` columns + typed metadata. The test tables
have no real media, so binary payloads are derived from document text
(``encode(text, 'utf-8')``) — the Spark-side plumbing (binary schema,
Arrow-batched ``mapInPandas`` decode, partitioning) is real; the decoder
itself is a clearly-marked deterministic fake (the image/audio libraries
are not in this environment — see ``functions/multimodal.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.queries import query
from pyspark_streaming_base_spark.queries._tables import t


@query(
    "q80_binary_metadata",
    oracle="""
    SELECT
      doc_id,
      CAST(strlen(text) AS BIGINT) AS payload_bytes,
      md5(text) AS payload_md5,
      SUBSTRING(md5(text), 1, 8) AS payload_fp,
      CASE WHEN strlen(text) >= 400 THEN 'large' ELSE 'small' END AS size_class
    FROM documents
    """,
)
def q80_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata extraction (multimodal base op): payload byte
    length, content digest, short fingerprint, size class.

    Scale: metadata ops never deserialize the payload beyond a streaming
    digest; grouping/joining happens on the 8-char fingerprint, never the
    blob.
    """
    d = t(spark, sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "utf-8")
    )
    return d.select(
        "doc_id",
        F.octet_length(F.col("text")).cast("bigint").alias("payload_bytes"),
        F.md5(F.col("payload")).alias("payload_md5"),
        F.substring(F.md5(F.col("payload")), 1, 8).alias("payload_fp"),
        F.when(F.octet_length(F.col("text")) >= 400, "large")
        .otherwise("small")
        .alias("size_class"),
    )


@query(
    "q81_decode_features",
    # the stub decoder is PURE md5 arithmetic, so the whole Arrow-batched
    # mapInPandas pipeline gets a value-hash oracle (upgraded rows-only →
    # oracle in r5): DuckDB reproduces width/height/n_frames from the
    # same digest math. '0x'-prefixed cast = hex-string → int.
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS payload_bytes,
           md5(text) AS digest,
           CAST(16 + ('0x' || substring(md5(text), 1, 4))::BIGINT % 4080
                AS INTEGER) AS width,
           CAST(16 + ('0x' || substring(md5(text), 5, 4))::BIGINT % 4080
                AS INTEGER) AS height,
           CAST(1 + ('0x' || substring(md5(text), 9, 4))::BIGINT % 120
                AS INTEGER) AS n_frames,
           'stub-md5-v1' AS decoder
    FROM documents
    """,
)
def q81_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode → feature-extract pipeline over binary payloads
    (multimodal slow path).

    Uses ``mapInPandas`` with the stub decoder in
    ``functions/multimodal.py`` — deterministic fake width/height/frames
    derived from the digest, so the pipeline shape (binary in, typed
    features out, batch-wise Arrow transfer) is fully exercised without
    media libraries — and because the stub is pure md5 arithmetic, the
    whole Python pipeline is ORACLE-checked against a SQL mirror
    (upgraded from rows-only in r5).

    Scale: decode parallelism = input partitions; payloads never hit the
    driver; batch size bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """
    from pyspark_streaming_base_spark.functions.multimodal import decode_features

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return decode_features(d, payload_col="payload", id_col="doc_id")


@query(
    "q82_frame_sample",
    # full SQL mirror of the stub decode + frame enumeration + resize
    # geometry + md5 frame fingerprints (upgraded rows-only → oracle in
    # r5): range(0, nf, 10) matches Python's range step; trunc() matches
    # int()'s float truncation; the fp concat matches f"{digest}:{idx}".
    oracle="""
    WITH m AS (
      SELECT doc_id, md5(text) AS digest,
             16 + ('0x' || substring(md5(text), 1, 4))::BIGINT % 4080 AS w,
             16 + ('0x' || substring(md5(text), 5, 4))::BIGINT % 4080 AS h,
             1 + ('0x' || substring(md5(text), 9, 4))::BIGINT % 120 AS nf
      FROM documents
    ),
    g AS (
      SELECT doc_id, digest, w, h, GREATEST(w, h) AS mx,
             unnest(range(0, nf, 10)) AS idx
      FROM m
    ),
    f AS (
      SELECT doc_id, idx,
             substring(md5(digest || ':' || CAST(idx AS VARCHAR)), 1, 16) AS fp,
             CASE WHEN 256.0 / mx >= 1 THEN w
                  ELSE CAST(trunc(w * (256.0 / mx)) AS BIGINT) END AS ow,
             CASE WHEN 256.0 / mx >= 1 THEN h
                  ELSE CAST(trunc(h * (256.0 / mx)) AS BIGINT) END AS oh
      FROM g
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(max(idx) AS INTEGER) AS last_idx,
           min(fp) AS min_fp,
           CAST(max(ow) AS INTEGER) AS out_w,
           CAST(max(oh) AS INTEGER) AS out_h
    FROM f GROUP BY doc_id
    """,
)
def q82_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample + resize over binary video payloads (multimodal
    row-expanding path), then a per-document rollup of sampled-frame stats.

    Every 10th frame of each (stub-decoded) payload is kept and resized to
    a 256-px longest side; the rollup proves the typed frame rows compose
    with ordinary relational ops. ORACLE-checked since r5 (the stub
    decode, frame enumeration, resize truncation, and fingerprints all
    mirror in SQL); pytest additionally pins exact fan-out and geometry.

    Scale: fan-out happens executor-side batch-by-batch (no driver
    materialization), and the rollup shuffles only (doc_id, small ints).
    """
    from pyspark_streaming_base_spark.functions.multimodal import sample_frames

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    frames = sample_frames(d, payload_col="payload", id_col="doc_id", every_k=10)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.max("frame_idx").cast("int").alias("last_idx"),
        F.min("frame_fp").alias("min_fp"),
        F.max("out_width").cast("int").alias("out_w"),
        F.max("out_height").cast("int").alias("out_h"),
    )


@query(
    "q130_image_neardup",
    # rows-only by design: DuckDB cannot decode BMP pixel arrays, so no
    # SQL oracle exists for the perceptual hash. Exactness is pinned in
    # pytest instead (tests/test_multimodal.py): a driver-side numpy twin
    # recomputes every aHash from the same BMP bytes and brute-forces ALL
    # pairs — the blocked join must match it pair-for-pair, distance-for-
    # distance (the pigeonhole blocking is exact, zero recall loss).
)
def q130_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-duplicate pairs (the multimodal member of
    the dedup family): synthesize one real 24-bit BMP per document
    executor-side (plus a planted lightly-edited copy for every 25th id),
    decode pixels → 64-bit average hash → exact bit-Hamming blocked
    self-join at distance ≤ 4 (a light edit moves ≤ 3 bits by the
    corpus construction; 5 pigeonhole segments of ~13 bits keep random
    64-bit hashes from colliding into the candidate join).

    Scale: the blob is reduced to 8 BYTES at the scan (pixels never
    enter an exchange); candidates come from the pigeonhole segment
    equi-join over the distinct-hash domain (``operators/fuzzyjoin.py``),
    never an all-pairs comparison; the pair exchange is keys-only. The
    id repartition spreads generation/decode across all cores — the
    fixture is ONE parquet file, and at 100 TB the input's own splits
    provide this parallelism for free.
    """
    from pyspark_streaming_base_spark.functions.multimodal import (
        synthetic_image_corpus,
    )
    from pyspark_streaming_base_spark.operators.imagededup import (
        image_near_dup_pairs,
    )

    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    media = synthetic_image_corpus(docs, id_col="doc_id", dup_every=25)
    return image_near_dup_pairs(
        media, payload_col="payload", id_col="media_id", max_dist=4
    )


@query(
    "q188_jpeg_metadata_audit",
    # Like q81's stub oracle: the JPEG parameters are pure md5-hex
    # arithmetic, so the whole Arrow-batched ENCODE → marker-walk PARSE
    # round trip gets a value-hash oracle — DuckDB reproduces the
    # parameters from the same digest math, and the Spark side only
    # matches if functions/multimodal.py's jpeg_encode_structural and
    # jpeg_metadata invert each other byte-exactly (and the truncation
    # rule dead-letters to NULLs identically).
    oracle="""
    WITH m AS (
      SELECT doc_id, md5(text) AS dg FROM documents
    )
    SELECT doc_id,
      NOT (('0x' || substring(dg, 12, 2))::BIGINT % 16 = 0) AS decode_ok,
      CASE WHEN ('0x' || substring(dg, 12, 2))::BIGINT % 16 = 0 THEN NULL
           ELSE CAST(16 + ('0x' || substring(dg, 1, 4))::BIGINT % 2000
                AS BIGINT) END AS width,
      CASE WHEN ('0x' || substring(dg, 12, 2))::BIGINT % 16 = 0 THEN NULL
           ELSE CAST(16 + ('0x' || substring(dg, 5, 4))::BIGINT % 2000
                AS BIGINT) END AS height,
      CASE WHEN ('0x' || substring(dg, 12, 2))::BIGINT % 16 = 0 THEN NULL
           ELSE CAST(1 + ('0x' || substring(dg, 9, 1))::BIGINT % 4
                AS BIGINT) END AS n_components,
      CASE WHEN ('0x' || substring(dg, 12, 2))::BIGINT % 16 = 0 THEN NULL
           ELSE ('0x' || substring(dg, 10, 1))::BIGINT % 2 = 1
           END AS progressive,
      CASE WHEN ('0x' || substring(dg, 12, 2))::BIGINT % 16 = 0 THEN NULL
           ELSE ('0x' || substring(dg, 11, 1))::BIGINT % 2 = 1
           END AS has_exif
    FROM m
    """,
)
def q188_jpeg_metadata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG header-metadata audit (multimodal extension, r11): the
    dominant web-image format's metadata tier — dimensions, component
    count, progressive flag, EXIF presence — extracted by a
    dependency-free ITU-T T.81 marker walk (``functions/multimodal.py::
    jpeg_metadata``; NO entropy decode, the 100 TB-audit budget), with
    malformed payloads dead-lettered to a ``decode_ok = false`` null
    row instead of failing the job (the q80-family contract).

    The corpus is synthesized per doc from digest arithmetic
    (``jpeg_encode_structural`` — structurally valid marker streams;
    every 16th digest truncates its payload to 3 bytes to exercise the
    dead-letter path), so the oracle can replay the parameters in SQL:
    the hash match proves encode→parse inverts EXACTLY, including the
    null rule. Committed hand-assembled fixtures
    (``tests/fixtures/*.jpg``) pin the parser against byte streams the
    encoder did NOT produce.

    Scale: payloads are built AND parsed inside one ``mapInPandas``
    stage — only (doc_id, 7 scalar fields) leave it, blobs never enter
    an exchange; decode parallelism = input partitions.
    """
    from typing import Iterator

    import pandas as pd

    from pyspark_streaming_base_spark.functions.multimodal import (
        jpeg_encode_structural,
        jpeg_metadata,
    )

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.encode(F.col("text"), "utf-8")).alias("dg")
    )

    schema = (
        "doc_id bigint, decode_ok boolean, width bigint, height bigint, "
        "n_components bigint, progressive boolean, has_exif boolean"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "decode_ok", "width", "height",
                "n_components", "progressive", "has_exif",
            )}
            for doc_id, dg in zip(pdf["doc_id"], pdf["dg"]):
                payload = jpeg_encode_structural(
                    width=16 + int(dg[0:4], 16) % 2000,
                    height=16 + int(dg[4:8], 16) % 2000,
                    n_components=1 + int(dg[8:9], 16) % 4,
                    progressive=int(dg[9:10], 16) % 2 == 1,
                    exif=int(dg[10:11], 16) % 2 == 1,
                )
                if int(dg[11:13], 16) % 16 == 0:
                    payload = payload[:3]  # the planted malformed tier
                try:
                    meta = jpeg_metadata(payload)
                    ok = True
                except ValueError:
                    meta, ok = {}, False
                out["doc_id"].append(int(doc_id))
                out["decode_ok"].append(ok)
                out["width"].append(meta.get("width"))
                out["height"].append(meta.get("height"))
                out["n_components"].append(meta.get("n_components"))
                out["progressive"].append(meta.get("progressive"))
                out["has_exif"].append(meta.get("has_exif"))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "decode_ok": pd.Series(out["decode_ok"], dtype="bool"),
                    "width": pd.Series(out["width"], dtype="Int64"),
                    "height": pd.Series(out["height"], dtype="Int64"),
                    "n_components": pd.Series(
                        out["n_components"], dtype="Int64"
                    ),
                    "progressive": pd.Series(
                        out["progressive"], dtype="boolean"
                    ),
                    "has_exif": pd.Series(out["has_exif"], dtype="boolean"),
                }
            )

    return d.mapInPandas(batches, schema)


@query(
    "q193_wav_metadata_audit",
    # The q188 recipe on the audio modality: every WAV parameter is pure
    # md5-hex arithmetic, so the Arrow-batched ENCODE → RIFF-chunk-walk
    # PARSE round trip gets a value-hash oracle — DuckDB reproduces the
    # parameters (including the exact integer duration_us division)
    # from the same digest math, and the Spark side only matches if
    # functions/multimodal.py's wav_encode and wav_metadata invert each
    # other byte-exactly (and the truncation rule dead-letters to NULLs
    # identically). DuckDB's // is BIGINT floor division = Python's //
    # on the non-negative operands here.
    oracle="""
    WITH m AS (
      SELECT doc_id, md5(text) AS dg FROM documents
    ), p AS (
      SELECT doc_id,
             ('0x' || substring(dg, 12, 2))::BIGINT % 16 = 0 AS malformed,
             8000 + ('0x' || substring(dg, 1, 4))::BIGINT % 40001 AS sr,
             1 + ('0x' || substring(dg, 5, 1))::BIGINT % 2 AS ch,
             8 * (1 + ('0x' || substring(dg, 6, 1))::BIGINT % 3) AS bits,
             1 + ('0x' || substring(dg, 7, 3))::BIGINT % 4096 AS nf
      FROM m
    )
    SELECT doc_id,
      NOT malformed AS decode_ok,
      CASE WHEN malformed THEN NULL ELSE sr END AS sample_rate,
      CASE WHEN malformed THEN NULL ELSE ch END AS channels,
      CASE WHEN malformed THEN NULL ELSE bits END AS bits_per_sample,
      CASE WHEN malformed THEN NULL ELSE nf END AS n_frames,
      CASE WHEN malformed THEN NULL
           ELSE (nf * 1000000) // sr END AS duration_us
    FROM p
    """,
)
def q193_wav_metadata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV/RIFF audio-metadata audit (multimodal extension, r13 — the
    r12 verdict's one named modality gap): the dominant uncompressed
    audio container's metadata tier — sample rate, channels, bit depth,
    frame count, exact integer duration — extracted by a
    dependency-free RIFF chunk walk (``functions/multimodal.py::
    wav_metadata``; NO sample decode, the 100 TB-audit budget), with
    malformed payloads dead-lettered to a ``decode_ok = false`` null
    row instead of failing the job (the q80/q188 contract).

    The corpus is synthesized per doc from digest arithmetic
    (``wav_encode`` — real RIFF streams; every odd dg[9] nibble inserts
    a LIST chunk BEFORE fmt so a fmt-first shortcut parser would fail,
    and every 16th digest truncates its payload to 3 bytes to exercise
    the dead-letter path), so the oracle can replay the parameters in
    SQL: the hash match proves encode→parse inverts EXACTLY, including
    the integer duration division and the null rule. Committed
    hand-assembled fixtures (``tests/fixtures/*.wav``) pin the parser
    against byte streams the encoder did NOT produce.

    Scale: payloads are built AND parsed inside one ``mapInPandas``
    stage — only (doc_id, 6 scalar fields) leave it, blobs never enter
    an exchange; decode parallelism = input partitions.
    """
    from typing import Iterator

    import pandas as pd

    from pyspark_streaming_base_spark.functions.multimodal import (
        wav_encode,
        wav_metadata,
    )

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.encode(F.col("text"), "utf-8")).alias("dg")
    )

    schema = (
        "doc_id bigint, decode_ok boolean, sample_rate bigint, "
        "channels bigint, bits_per_sample bigint, n_frames bigint, "
        "duration_us bigint"
    )
    cols = (
        "doc_id", "decode_ok", "sample_rate", "channels",
        "bits_per_sample", "n_frames", "duration_us",
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in cols}
            for doc_id, dg in zip(pdf["doc_id"], pdf["dg"]):
                payload = wav_encode(
                    sample_rate=8000 + int(dg[0:4], 16) % 40001,
                    channels=1 + int(dg[4:5], 16) % 2,
                    bits_per_sample=8 * (1 + int(dg[5:6], 16) % 3),
                    n_frames=1 + int(dg[6:9], 16) % 4096,
                    list_chunk=int(dg[9:10], 16) % 2 == 1,
                )
                if int(dg[11:13], 16) % 16 == 0:
                    payload = payload[:3]  # the planted malformed tier
                try:
                    meta = wav_metadata(payload)
                    ok = True
                except ValueError:
                    meta, ok = {}, False
                out["doc_id"].append(int(doc_id))
                out["decode_ok"].append(ok)
                out["sample_rate"].append(meta.get("sample_rate"))
                out["channels"].append(meta.get("channels"))
                out["bits_per_sample"].append(meta.get("bits_per_sample"))
                out["n_frames"].append(meta.get("n_frames"))
                out["duration_us"].append(meta.get("duration_us"))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "decode_ok": pd.Series(out["decode_ok"], dtype="bool"),
                    **{
                        k: pd.Series(out[k], dtype="Int64")
                        for k in cols[2:]
                    },
                }
            )

    return d.mapInPandas(batches, schema)


@query(
    "q195_audio_profile_by_source",
    # q193's digest-arithmetic oracle rolled up per feed: every sum is
    # exact int64 (max per-doc duration ≈ 5.1·10⁸ µs, so even 10⁹ docs
    # stay under 2⁶³); the closing fractions/means are raw IEEE
    # divisions of identical int64 pairs (the q189/q194 convention —
    # never a rounded float aggregate).
    oracle="""
    WITH m AS (
      SELECT source, md5(text) AS dg FROM documents
    ), p AS (
      SELECT source,
             ('0x' || substring(dg, 12, 2))::BIGINT % 16 = 0 AS malformed,
             8000 + ('0x' || substring(dg, 1, 4))::BIGINT % 40001 AS sr,
             1 + ('0x' || substring(dg, 5, 1))::BIGINT % 2 AS ch,
             8 * (1 + ('0x' || substring(dg, 6, 1))::BIGINT % 3) AS bits,
             1 + ('0x' || substring(dg, 7, 3))::BIGINT % 4096 AS nf
      FROM m
    )
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_audio,
      CAST(COUNT(*) FILTER (WHERE malformed) AS BIGINT) AS n_malformed,
      CAST(COUNT(*) FILTER (WHERE malformed) AS DOUBLE) / COUNT(*)
        AS malformed_frac,
      CAST(SUM(CASE WHEN malformed THEN 0
               ELSE (nf * 1000000) // sr END) AS BIGINT)
        AS total_duration_us,
      CAST(SUM(CASE WHEN malformed THEN 0
               ELSE (nf * 1000000) // sr END) AS DOUBLE)
        / COUNT(*) FILTER (WHERE NOT malformed) AS mean_duration_us,
      CAST(COUNT(*) FILTER (WHERE NOT malformed AND ch = 2) AS BIGINT)
        AS stereo_docs,
      CAST(SUM(CASE WHEN malformed THEN 0 ELSE sr END) AS DOUBLE)
        / COUNT(*) FILTER (WHERE NOT malformed) AS mean_sample_rate,
      CAST(COUNT(*) FILTER (WHERE NOT malformed AND bits >= 16) AS BIGINT)
        AS hi_depth_docs
    FROM p GROUP BY source
    """,
)
def q195_audio_profile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-FEED audio profile (multimodal × source-profiling, r13): the
    audit a multimodal pretraining pipeline runs before mixing feeds —
    how much audio each source contributes (exact total/mean duration),
    how broken it is (dead-letter rate), and its format mix (stereo
    share, ≥16-bit share, mean sample rate). Composes q193's RIFF
    metadata tier with the q177/q181-style per-source rollup: the
    decode stays in the Arrow stage, the rollup is an ordinary
    (source)-keyed aggregate over its scalar output.

    Exactness: all aggregates are int64 counts/sums of q193's
    integer-exact fields (duration is the same BIGINT floor division);
    the fractions/means are raw IEEE divisions of identical int64
    pairs on both engines.

    Scale: one scan → one mapInPandas (blobs never leave it) → a
    |sources|-row map-side-combinable aggregate; the exchange carries
    (source, 7 partial scalars) per task.
    """
    from typing import Iterator

    import pandas as pd

    from pyspark_streaming_base_spark.functions.multimodal import (
        wav_encode,
        wav_metadata,
    )

    d = t(spark, sf_dir, "documents").select(
        "source", F.md5(F.encode(F.col("text"), "utf-8")).alias("dg")
    )

    schema = (
        "source string, decode_ok boolean, sample_rate bigint, "
        "channels bigint, bits_per_sample bigint, duration_us bigint"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            src, ok, srs, chs, bits, dur = [], [], [], [], [], []
            for source, dg in zip(pdf["source"], pdf["dg"]):
                payload = wav_encode(
                    sample_rate=8000 + int(dg[0:4], 16) % 40001,
                    channels=1 + int(dg[4:5], 16) % 2,
                    bits_per_sample=8 * (1 + int(dg[5:6], 16) % 3),
                    n_frames=1 + int(dg[6:9], 16) % 4096,
                    list_chunk=int(dg[9:10], 16) % 2 == 1,
                )
                if int(dg[11:13], 16) % 16 == 0:
                    payload = payload[:3]  # the planted malformed tier
                try:
                    meta = wav_metadata(payload)
                    good = True
                except ValueError:
                    meta, good = {}, False
                src.append(str(source))
                ok.append(good)
                srs.append(meta.get("sample_rate"))
                chs.append(meta.get("channels"))
                bits.append(meta.get("bits_per_sample"))
                dur.append(meta.get("duration_us"))
            yield pd.DataFrame(
                {
                    "source": pd.Series(src, dtype=object),
                    "decode_ok": pd.Series(ok, dtype="bool"),
                    "sample_rate": pd.Series(srs, dtype="Int64"),
                    "channels": pd.Series(chs, dtype="Int64"),
                    "bits_per_sample": pd.Series(bits, dtype="Int64"),
                    "duration_us": pd.Series(dur, dtype="Int64"),
                }
            )

    meta = d.mapInPandas(batches, schema)
    ok = F.col("decode_ok")
    n_ok = F.count(F.when(ok, 1)).cast("bigint")
    total_dur = F.sum(F.when(ok, F.col("duration_us")).otherwise(0)).cast(
        "bigint"
    )
    return meta.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_audio"),
        F.count(F.when(~ok, 1)).cast("bigint").alias("n_malformed"),
        (
            F.count(F.when(~ok, 1)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("malformed_frac"),
        total_dur.alias("total_duration_us"),
        (total_dur.cast("double") / n_ok.cast("double")).alias(
            "mean_duration_us"
        ),
        F.count(F.when(ok & (F.col("channels") == 2), 1))
        .cast("bigint")
        .alias("stereo_docs"),
        (
            F.sum(F.when(ok, F.col("sample_rate")).otherwise(0)).cast("double")
            / n_ok.cast("double")
        ).alias("mean_sample_rate"),
        F.count(F.when(ok & (F.col("bits_per_sample") >= 16), 1))
        .cast("bigint")
        .alias("hi_depth_docs"),
    )


@query(
    "q196_mp4_metadata_audit",
    # The q188/q193 recipe on the VIDEO modality — the last of the
    # mandate's three media kinds: every MP4 parameter is pure md5-hex
    # arithmetic, so the Arrow-batched ENCODE → box-tree-walk PARSE
    # round trip gets a value-hash oracle. DuckDB reproduces the
    # parameters (including the exact integer duration_us division and
    # the codec-pick CASE) from the same digest math; the Spark side
    # only matches if functions/multimodal.py's mp4_encode and
    # mp4_metadata invert each other byte-exactly across the planted
    # layout quirks (mdat-before-moov, 64-bit largesize mdat,
    # version-1 mvhd — none of which may change the PARSED values) and
    # the truncation rule dead-letters to NULLs identically.
    oracle="""
    WITH m AS (
      SELECT doc_id, md5(text) AS dg FROM documents
    ), p AS (
      SELECT doc_id,
             ('0x' || substring(dg, 17, 2))::BIGINT % 16 = 0 AS malformed,
             1000 + ('0x' || substring(dg, 1, 4))::BIGINT % 59001 AS ts,
             1 + ('0x' || substring(dg, 5, 4))::BIGINT % 100000 AS dur,
             16 * (1 + ('0x' || substring(dg, 9, 2))::BIGINT % 120) AS w,
             16 * (1 + ('0x' || substring(dg, 11, 2))::BIGINT % 68) AS h,
             ('0x' || substring(dg, 13, 1))::BIGINT % 2 = 1 AS aud,
             ('0x' || substring(dg, 14, 1))::BIGINT % 2 = 1 AS hevc
      FROM m
    )
    SELECT doc_id,
      NOT malformed AS decode_ok,
      CASE WHEN malformed THEN NULL
           ELSE (dur * 1000000) // ts END AS duration_us,
      CASE WHEN malformed THEN NULL ELSE w END AS width,
      CASE WHEN malformed THEN NULL ELSE h END AS height,
      CASE WHEN malformed THEN NULL
           ELSE CAST(1 + CASE WHEN aud THEN 1 ELSE 0 END AS BIGINT)
           END AS n_tracks,
      CASE WHEN malformed THEN NULL
           WHEN hevc THEN 'hev1' ELSE 'avc1' END AS video_codec,
      CASE WHEN malformed THEN NULL ELSE aud END AS has_audio
    FROM p
    """,
)
def q196_mp4_metadata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4/ISO-BMFF video-metadata audit (multimodal extension, r13 —
    completes the mandate's image/audio/VIDEO triple next to q188/q193):
    the dominant video container's metadata tier — movie
    timescale-exact duration, dimensions, track count, codec fourcc,
    audio presence — extracted by a dependency-free box-tree walk
    (``functions/multimodal.py::mp4_metadata``; NO sample decode, the
    100 TB-audit budget), with malformed payloads dead-lettered to a
    ``decode_ok = false`` null row instead of failing the job (the
    q80/q188/q193 contract).

    The corpus is synthesized per doc from digest arithmetic
    (``mp4_encode`` — real box trees; digest nibbles plant the three
    layout quirks real crawls hit: non-faststart mdat-BEFORE-moov,
    64-bit largesize mdat, version-1 mvhd with 64-bit times — none may
    change the parsed VALUES, which is itself part of what the hash
    match proves; every 16th digest truncates its payload to 5 bytes to
    exercise the dead-letter path), so the oracle replays the
    parameters in SQL: the hash match proves encode→parse inverts
    EXACTLY, including the integer duration division, the 16.16
    fixed-point width/height round trip, and the null rule. Committed
    hand-assembled fixtures (``tests/fixtures/*.mp4``) pin the parser
    against byte streams the encoder did NOT produce.

    Scale: payloads are built AND parsed inside one ``mapInPandas``
    stage — only (doc_id, 7 scalar fields) leave it, blobs never enter
    an exchange; decode parallelism = input partitions.
    """
    from typing import Iterator

    import pandas as pd

    from pyspark_streaming_base_spark.functions.multimodal import (
        mp4_encode,
        mp4_metadata,
    )

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.encode(F.col("text"), "utf-8")).alias("dg")
    )

    schema = (
        "doc_id bigint, decode_ok boolean, duration_us bigint, "
        "width bigint, height bigint, n_tracks bigint, "
        "video_codec string, has_audio boolean"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ok, dur, ws, hs, nt, cod, aud = ([] for _ in range(8))
            for doc_id, dg in zip(pdf["doc_id"], pdf["dg"]):
                quirks = int(dg[14:15], 16)
                payload = mp4_encode(
                    timescale=1000 + int(dg[0:4], 16) % 59001,
                    duration_ticks=1 + int(dg[4:8], 16) % 100000,
                    width=16 * (1 + int(dg[8:10], 16) % 120),
                    height=16 * (1 + int(dg[10:12], 16) % 68),
                    video_codec="hev1" if int(dg[13:14], 16) % 2 else "avc1",
                    audio_track=int(dg[12:13], 16) % 2 == 1,
                    mdat_first=quirks % 2 == 1,
                    largesize_mdat=(quirks // 2) % 2 == 1,
                    mvhd_v1=int(dg[15:16], 16) % 2 == 1,
                )
                if int(dg[16:18], 16) % 16 == 0:
                    payload = payload[:5]  # the planted malformed tier
                try:
                    meta = mp4_metadata(payload)
                    good = True
                except ValueError:
                    meta, good = {}, False
                ids.append(int(doc_id))
                ok.append(good)
                dur.append(meta.get("duration_us"))
                ws.append(meta.get("width"))
                hs.append(meta.get("height"))
                nt.append(meta.get("n_tracks"))
                cod.append(meta.get("video_codec"))
                aud.append(meta.get("has_audio"))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "decode_ok": pd.Series(ok, dtype="bool"),
                    "duration_us": pd.Series(dur, dtype="Int64"),
                    "width": pd.Series(ws, dtype="Int64"),
                    "height": pd.Series(hs, dtype="Int64"),
                    "n_tracks": pd.Series(nt, dtype="Int64"),
                    "video_codec": pd.Series(cod, dtype=object),
                    "has_audio": pd.Series(aud, dtype="boolean"),
                }
            )

    return d.mapInPandas(batches, schema)


@query(
    "q197_modality_readiness_by_source",
    # All THREE modality parsers (q188 JPEG, q193 WAV, q196 MP4) in one
    # Arrow pass, rolled up per feed. Each modality draws its parameters
    # from its own SALTED digest (md5(text || '#img'|'#aud'|'#vid')), so
    # the three dead-letter flags are independent; every aggregate is an
    # int64 count/sum of the parsers' integer-exact outputs and the one
    # fraction is a raw IEEE division of identical int64 pairs. The AV
    # alignment test is an integer |a_us − v_us| ≤ 2s comparison — no
    # float ever decides a row's bucket.
    oracle="""
    WITH m AS (
      SELECT source,
             md5(text || '#img') AS di,
             md5(text || '#aud') AS da,
             md5(text || '#vid') AS dv
      FROM documents
    ), p AS (
      SELECT source,
        NOT (('0x' || substring(di, 12, 2))::BIGINT % 16 = 0) AS img_ok,
        NOT (('0x' || substring(da, 12, 2))::BIGINT % 16 = 0) AS aud_ok,
        NOT (('0x' || substring(dv, 17, 2))::BIGINT % 16 = 0) AS vid_ok,
        ((1 + ('0x' || substring(da, 7, 3))::BIGINT % 4096) * 1000000)
          // (8000 + ('0x' || substring(da, 1, 4))::BIGINT % 40001) AS a_us,
        ((1 + ('0x' || substring(dv, 5, 4))::BIGINT % 100000) * 1000000)
          // (1000 + ('0x' || substring(dv, 1, 4))::BIGINT % 59001) AS v_us
      FROM m
    )
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(COUNT(*) FILTER (WHERE img_ok) AS BIGINT) AS img_ok_docs,
      CAST(COUNT(*) FILTER (WHERE aud_ok) AS BIGINT) AS aud_ok_docs,
      CAST(COUNT(*) FILTER (WHERE vid_ok) AS BIGINT) AS vid_ok_docs,
      CAST(COUNT(*) FILTER (WHERE img_ok AND aud_ok AND vid_ok) AS BIGINT)
        AS all_ok_docs,
      CAST(COUNT(*) FILTER (WHERE img_ok AND aud_ok AND vid_ok) AS DOUBLE)
        / COUNT(*) AS all_ok_frac,
      CAST(COUNT(*) FILTER (WHERE img_ok AND aud_ok AND vid_ok
                            AND abs(a_us - v_us) <= 2000000) AS BIGINT)
        AS av_aligned_docs,
      CAST(SUM(CASE WHEN aud_ok THEN a_us ELSE 0 END) AS BIGINT)
        AS total_audio_us,
      CAST(SUM(CASE WHEN vid_ok THEN v_us ELSE 0 END) AS BIGINT)
        AS total_video_us
    FROM p GROUP BY source
    """,
)
def q197_modality_readiness_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-FEED modality-readiness matrix (multimodal composition, r13):
    the audit a multimodal pretraining mix runs before pairing
    modalities — per source, how many docs have a decodable image,
    audio, and video payload, how many have ALL three (the docs an
    interleaved image+audio+video example can actually be built from),
    the AV-duration-aligned subset (|audio − video| ≤ 2 s — the clip-
    alignment precheck), and the total decoded A/V duration mass.

    Composes all three real parsers — q188's JPEG marker walk, q193's
    RIFF chunk walk, q196's ISO-BMFF box walk — in ONE Arrow stage:
    each modality's payload is synthesized from its own salted digest
    (independent dead-letter flags), parsed by the genuine
    ``*_metadata`` functions, and reduced to six scalars per doc before
    anything leaves the stage.

    Scale: one 2-column scan (source, text) → three JVM-side md5s →
    one mapInPandas (three encodes + three parses per doc, blobs never
    leave the task) → a |sources|-row map-side-combinable aggregate;
    the exchange carries (source, 6 partial scalars) per task. The
    modality parsers stay header-tier, so the 100 TB cost is the scan.
    """
    from typing import Iterator

    import pandas as pd

    from pyspark_streaming_base_spark.functions.multimodal import (
        jpeg_encode_structural,
        jpeg_metadata,
        mp4_encode,
        mp4_metadata,
        wav_encode,
        wav_metadata,
    )

    txt = F.col("text")
    d = t(spark, sf_dir, "documents").select(
        "source",
        F.md5(F.encode(F.concat(txt, F.lit("#img")), "utf-8")).alias("di"),
        F.md5(F.encode(F.concat(txt, F.lit("#aud")), "utf-8")).alias("da"),
        F.md5(F.encode(F.concat(txt, F.lit("#vid")), "utf-8")).alias("dv"),
    )

    schema = (
        "source string, img_ok boolean, aud_ok boolean, vid_ok boolean, "
        "audio_us bigint, video_us bigint"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            src, iok, aok, vok, aus, vus = [], [], [], [], [], []
            for source, di, da, dv in zip(
                pdf["source"], pdf["di"], pdf["da"], pdf["dv"]
            ):
                img = jpeg_encode_structural(
                    width=16 + int(di[0:4], 16) % 2000,
                    height=16 + int(di[4:8], 16) % 2000,
                    n_components=1 + int(di[8:9], 16) % 4,
                    progressive=int(di[9:10], 16) % 2 == 1,
                    exif=int(di[10:11], 16) % 2 == 1,
                )
                if int(di[11:13], 16) % 16 == 0:
                    img = img[:3]
                aud = wav_encode(
                    sample_rate=8000 + int(da[0:4], 16) % 40001,
                    channels=1 + int(da[4:5], 16) % 2,
                    bits_per_sample=8 * (1 + int(da[5:6], 16) % 3),
                    n_frames=1 + int(da[6:9], 16) % 4096,
                    list_chunk=int(da[9:10], 16) % 2 == 1,
                )
                if int(da[11:13], 16) % 16 == 0:
                    aud = aud[:3]
                quirks = int(dv[14:15], 16)
                vid = mp4_encode(
                    timescale=1000 + int(dv[0:4], 16) % 59001,
                    duration_ticks=1 + int(dv[4:8], 16) % 100000,
                    width=16 * (1 + int(dv[8:10], 16) % 120),
                    height=16 * (1 + int(dv[10:12], 16) % 68),
                    video_codec="hev1" if int(dv[13:14], 16) % 2 else "avc1",
                    audio_track=int(dv[12:13], 16) % 2 == 1,
                    mdat_first=quirks % 2 == 1,
                    largesize_mdat=(quirks // 2) % 2 == 1,
                    mvhd_v1=int(dv[15:16], 16) % 2 == 1,
                )
                if int(dv[16:18], 16) % 16 == 0:
                    vid = vid[:5]
                try:
                    jpeg_metadata(img)
                    img_ok = True
                except ValueError:
                    img_ok = False
                try:
                    a_us = wav_metadata(aud)["duration_us"]
                    aud_ok = True
                except ValueError:
                    a_us, aud_ok = None, False
                try:
                    v_us = mp4_metadata(vid)["duration_us"]
                    vid_ok = True
                except ValueError:
                    v_us, vid_ok = None, False
                src.append(str(source))
                iok.append(img_ok)
                aok.append(aud_ok)
                vok.append(vid_ok)
                aus.append(a_us)
                vus.append(v_us)
            yield pd.DataFrame(
                {
                    "source": pd.Series(src, dtype=object),
                    "img_ok": pd.Series(iok, dtype="bool"),
                    "aud_ok": pd.Series(aok, dtype="bool"),
                    "vid_ok": pd.Series(vok, dtype="bool"),
                    "audio_us": pd.Series(aus, dtype="Int64"),
                    "video_us": pd.Series(vus, dtype="Int64"),
                }
            )

    meta = d.mapInPandas(batches, schema)
    img_ok, aud_ok, vid_ok = F.col("img_ok"), F.col("aud_ok"), F.col("vid_ok")
    all_ok = img_ok & aud_ok & vid_ok
    return meta.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count(F.when(img_ok, 1)).cast("bigint").alias("img_ok_docs"),
        F.count(F.when(aud_ok, 1)).cast("bigint").alias("aud_ok_docs"),
        F.count(F.when(vid_ok, 1)).cast("bigint").alias("vid_ok_docs"),
        F.count(F.when(all_ok, 1)).cast("bigint").alias("all_ok_docs"),
        (
            F.count(F.when(all_ok, 1)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("all_ok_frac"),
        F.count(
            F.when(
                all_ok
                & (
                    F.abs(F.col("audio_us") - F.col("video_us"))
                    <= F.lit(2_000_000)
                ),
                1,
            )
        )
        .cast("bigint")
        .alias("av_aligned_docs"),
        F.sum(F.when(aud_ok, F.col("audio_us")).otherwise(0))
        .cast("bigint")
        .alias("total_audio_us"),
        F.sum(F.when(vid_ok, F.col("video_us")).otherwise(0))
        .cast("bigint")
        .alias("total_video_us"),
    )
