"""SQL API surface: temp-view + spark.sql parity with the DataFrame
registry, and the UDTF lateral-join path."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pyspark_streaming_base_spark.functions.udtfs import register_udtfs
from pyspark_streaming_base_spark.queries import load_all
from pyspark_streaming_base_spark.queries._tables import TABLES, t

from tests.conftest import SF_SMALL

R = load_all()


def test_spark_sql_matches_dataframe_query(spark):
    """The flagship query expressed as pure Spark SQL over temp views
    returns exactly the DataFrame registry's rows — the engine's SQL and
    DataFrame surfaces are the same planner."""
    for tbl in ("lineitem",):
        t(spark, SF_SMALL, tbl).createOrReplaceTempView(tbl)
    sql = """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(ROUND(l_quantity * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS sum_qty,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-09-02'
      GROUP BY l_returnflag, l_linestatus
    """
    got = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"], r["count_order"])
        for r in spark.sql(sql).collect()
    }
    want = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"], r["count_order"])
        for r in R["q01_pricing_summary"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_udtf_chunker_matches_expression_chunker(spark):
    """LATERAL chunk_doc(...) == q86's expression-based chunking."""
    register_udtfs(spark)
    t(spark, SF_SMALL, "documents").createOrReplaceTempView("documents")
    got = {
        (r["doc_id"], r["chunk_id"]): (
            r["n_chunk_tokens"],
            hashlib.md5(r["chunk_text"].encode()).hexdigest(),
        )
        for r in spark.sql(
            "SELECT doc_id, c.* FROM documents, LATERAL chunk_doc(doc_id, text) c"
        ).collect()
    }
    want = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_md5"])
        for r in R["q86_doc_chunking"].fn(spark, SF_SMALL).collect()
    }
    assert got == want
