"""BM25 / inverted-index / length-outlier tests on crafted corpora."""

import math

import pytest
from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.catalog.vector_text import (
    _BM25_B,
    _BM25_K1,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "join join join filter small table"),
        (2, "vector scan batch row column"),
        (3, "filter filter join merge hash hash hash"),
        (4, "the a of and or not none here"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def _bm25_hand(tf, df, n, dl, avgdl):
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    return idf * tf * (_BM25_K1 + 1) / (tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl / avgdl))


def test_bm25_matches_hand_computation(spark, corpus, monkeypatch, tmp_path):
    corpus.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from govgis_nov2023_slim_spatial_server_spark.catalog.vector_text import bm25_keyword_search

    out = {r["doc_id"]: r["bm25"] for r in bm25_keyword_search(spark, str(tmp_path)).collect()}
    # terms: join (df=2: docs 1,3), filter (df=2: docs 1,3), vector (df=1: doc 2)
    dls = {1: 6, 2: 5, 3: 7, 4: 8}
    avgdl = sum(dls.values()) / 4
    exp1 = _bm25_hand(3, 2, 4, 6, avgdl) + _bm25_hand(1, 2, 4, 6, avgdl)
    exp2 = _bm25_hand(1, 1, 4, 5, avgdl)
    exp3 = _bm25_hand(1, 2, 4, 7, avgdl) + _bm25_hand(2, 2, 4, 7, avgdl)
    assert out[1] == pytest.approx(exp1, abs=1e-4)
    assert out[2] == pytest.approx(exp2, abs=1e-4)
    assert out[3] == pytest.approx(exp3, abs=1e-4)
    assert 4 not in out  # no query terms -> never scored


def test_inverted_index_postings_sorted_and_complete(spark, corpus, tmp_path):
    corpus.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from govgis_nov2023_slim_spatial_server_spark.operators import __name__ as _  # noqa: F401
    from govgis_nov2023_slim_spatial_server_spark.catalog.vector_text import inverted_index_postings

    # df threshold 395 excludes everything in a 4-doc corpus
    assert inverted_index_postings(spark, str(tmp_path)).count() == 0
    # rebuild without the threshold to check posting-list shape
    from govgis_nov2023_slim_spatial_server_spark.functions.text import tokens

    pairs = corpus.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")).distinct()
    idx = pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sort_array(F.collect_list("doc_id")).alias("postings"),
    )
    got = {r["term"]: (r["df"], r["postings"]) for r in idx.collect()}
    assert got["join"] == (2, [1, 3])
    assert got["filter"] == (2, [1, 3])
    assert got["vector"] == (1, [2])
    for term, (df, postings) in got.items():
        assert df == len(postings) == len(set(postings))
        assert postings == sorted(postings)


def test_doc_length_outliers_tails_only(spark, tmp_path):
    # 20 docs of length 10, one of length 1, one of length 50
    rows = [(i, " ".join(["w"] * 10)) for i in range(20)]
    rows += [(100, "tiny"), (101, " ".join(["w"] * 50))]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from govgis_nov2023_slim_spatial_server_spark.catalog.vector_text import doc_length_outliers

    out = {r["doc_id"]: (r["n_tokens"], r["side"]) for r in doc_length_outliers(spark, str(tmp_path)).collect()}
    assert out == {100: (1, "short"), 101: (50, "long")}


def test_funnel_strict_ordering(spark, tmp_path):
    import datetime

    base = datetime.datetime(2024, 1, 1)

    def ev(eid, minute, uid, etype):
        return (eid, base + datetime.timedelta(minutes=minute), uid, etype, 1.0, "{}")

    rows = [
        # user 1: full ordered funnel
        ev(1, 0, 1, "view"), ev(2, 5, 1, "click"), ev(3, 9, 1, "purchase"),
        # user 2: click BEFORE view -> stops at view step
        ev(4, 5, 2, "view"), ev(5, 1, 2, "click"), ev(6, 9, 2, "purchase"),
        # user 3: view+click ordered, purchase before click -> stops at click
        ev(7, 0, 3, "view"), ev(8, 5, 3, "click"), ev(9, 2, 3, "purchase"),
        # user 4: never viewed -> not in funnel at all
        ev(10, 0, 4, "click"), ev(11, 5, 4, "purchase"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp, user_id: long, event_type: string,"
        " value: double, props: string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from govgis_nov2023_slim_spatial_server_spark.catalog.relational import funnel_view_click_purchase

    got = {r["step_name"]: r["n_users"] for r in funnel_view_click_purchase(spark, str(tmp_path)).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_domain_mixture_weights_uniform_target(spark, tmp_path):
    rows = [(i, [0.0] * 4, i % 4 if i < 80 else 4) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>, label: int")
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from govgis_nov2023_slim_spatial_server_spark.catalog.vector_text import domain_mixture_weights

    got = {r["label"]: r for r in domain_mixture_weights(spark, str(tmp_path)).collect()}
    # labels 0-3 have 20 docs each, label 4 has 20 -> uniform already
    for label, r in got.items():
        assert r["n_vecs"] == 20
        assert r["actual_share"] == 0.2
        assert r["weight"] == 1.0


def test_sql_surface_matches_dataframe_api(spark):
    """The same logical query via spark.sql and the DataFrame API returns
    identical rows — one Catalyst, two front-ends."""
    from pyspark.sql import functions as F

    from govgis_nov2023_slim_spatial_server_spark.catalog.relational import sql_surface_pricing
    from govgis_nov2023_slim_spatial_server_spark.schemas import load_table

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n_rows"], r["sum_qty"], r["sum_disc_price"])
        for r in sql_surface_pricing(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exp = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n_rows"], r["sum_qty"], r["sum_disc_price"])
        for r in (
            li.where(F.col("l_shipdate") >= F.lit("1995-07-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                # exact-cents revenue (the _revenue_e4 decimal-tie form)
                (
                    F.sum(
                        F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
                        * (
                            F.lit(100)
                            - F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long")
                        )
                    ).cast("double")
                    / 10000.0
                ).alias("sum_disc_price"),
            )
        ).collect()
    }
    assert got == exp
