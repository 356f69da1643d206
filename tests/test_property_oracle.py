"""Property tests vs the DuckDB oracle (SURVEY.md §5.2): randomized
filter/top-k/offset parameters over the sf0.001 documents⋈embeddings
fixture, Spark and DuckDB must agree exactly (deterministic tie-break)."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.functions.vector import dot, l2_norm
from govgis_nov2023_slim_spatial_server_spark.catalog.vector_text import PROBE_SQL, PROBE_VEC
from govgis_nov2023_slim_spatial_server_spark.operators.topk import top_k
from govgis_nov2023_slim_spatial_server_spark.schemas import load_table

SF = "/root/testdata/sf0.001"
LANGS = ["en", "es", "fr", "de", "zh"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.fixture(scope="module")
def joined(spark):
    d = load_table(spark, SF, "documents")
    e = load_table(spark, SF, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .withColumn("__dist", 1 - dot("embedding", PROBE_VEC) / l2_norm("embedding"))
        .cache()
    )


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    langs=st.lists(st.sampled_from(LANGS), min_size=1, max_size=3, unique=True),
    k=st.integers(min_value=1, max_value=10),
    skip=st.integers(min_value=0, max_value=10),
)
def test_hybrid_search_matches_oracle(spark, ddb, joined, langs, k, skip):
    spark_rows = [
        (r["doc_id"], round(r["__dist"], 4))
        for r in top_k(
            joined.where(F.lower(F.col("lang")).isin(langs)),
            [F.col("__dist").asc(), F.col("doc_id").asc()],
            k=k,
            skip=skip,
        ).select("doc_id", "__dist").collect()
    ]
    in_list = ", ".join(f"'{l}'" for l in langs)
    sql = f"""
      SELECT d.doc_id,
             ROUND(1 - list_dot_product(CAST(e.embedding AS DOUBLE[]), {PROBE_SQL})
                   / sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))), 4) AS dist
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      WHERE LOWER(d.lang) IN ({in_list})
      ORDER BY 1 - list_dot_product(CAST(e.embedding AS DOUBLE[]), {PROBE_SQL})
               / sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))),
               d.doc_id
      LIMIT {k} OFFSET {skip}
    """
    oracle_rows = [(r[0], r[1]) for r in ddb.execute(sql).fetchall()]
    assert spark_rows == oracle_rows
