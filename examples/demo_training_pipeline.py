"""End-to-end LLM training-data pipeline demo over the driver corpus.

Composes the engine's corpus-preparation operators in the order a real
100 TB run chains them — each stage consumes the previous stage's
DataFrame, so the whole thing is ONE lazy plan until the final write:

  0. dedup threshold SWEEP over the candidate pairs → pick the operating
     point (tightest threshold that keeps the flagged-doc rate ≤ 20%) —
     the decision a real run makes before deleting anything
  1. near-dup pair generation (label-blocked embedding cosine) at the
     chosen threshold — the same pair table the sweep scored
  2. connected components → keep the HIGHEST-QUALITY doc per dup group
     (the keep-best policy, not an arbitrary canonical)
  3. benchmark decontamination (8-gram broadcast semi-join)
  4. corpus-relative length gate (exact p05/p95 band, broadcast fences)
  5. quality + repetition filtering (Gopher rules, zero-shuffle), then a
     corpus-trained bigram-LM cross-entropy gate (CCNet-style: drop the
     most unnatural tail) and quality-weighted importance sampling
  6. PII redaction (map-only regexp scrub)
  7. token-window chunking + keep-first chunk dedup (boilerplate removal)
  8. sequence packing into fixed-token training rows (per-shard cumsum)
  9. domain-mixture weights for the loader (uniform target) + the
     temperature-scaled (τ=0.7) sampling schedule
  10. corpus card: token-length histogram, Zipf slope, curriculum tiers —
      the per-snapshot report a pipeline publishes alongside the data
  11. retrieval-index audit: LSH bucket balance (partition skew of the
      ANN store) and measured LSH recall@10 vs brute-force ground truth
      — the post-build check a pipeline runs before serving the index

    python examples/demo_training_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.functions.text import (
    repetition_metrics,
    quality_score,
)
from govgis_nov2023_slim_spatial_server_spark.operators.chunking import (
    chunk_by_tokens,
    dedup_chunks,
    pack_sequences,
)
from govgis_nov2023_slim_spatial_server_spark.operators.decontaminate import decontaminate
from govgis_nov2023_slim_spatial_server_spark.operators.dedup import (
    embedding_near_duplicates,
)
from govgis_nov2023_slim_spatial_server_spark.schemas import load_table
from govgis_nov2023_slim_spatial_server_spark.session import get_spark

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="training-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")
    n0 = docs.count()

    # 1-2. near-dup pairs → components → keep the BEST member per group
    # (highest quality_score, ties to lowest id — the policy step; an
    # arbitrary canonical would keep whatever page the hash favored)
    from pyspark.sql import Window

    from govgis_nov2023_slim_spatial_server_spark.operators.components import (
        connected_components,
    )

    # 0. sweep candidate thresholds over ONE low-threshold pair table and
    # pick the operating point: the tightest threshold flagging ≤ 20% of
    # documents (sweep the candidates, then delete — never the reverse)
    cand = embedding_near_duplicates(
        embs, id_col="vec_id", emb_col="embedding", threshold=0.2, block_col="label"
    ).localCheckpoint(eager=True)
    sweep = (
        cand.crossJoin(
            F.broadcast(
                spark.createDataFrame([(t,) for t in (20, 30, 40, 50)], "thr int")
            )
        )
        .where(F.col("cos_sim") >= F.col("thr").cast("double") / 100.0)
        .select("thr", F.explode(F.array("id_a", "id_b")).alias("id"))
        .groupBy("thr")
        .agg(F.countDistinct("id").alias("n_flagged"))
        .collect()
    )
    budget = 0.20 * n0
    viable = sorted(r["thr"] for r in sweep if r["n_flagged"] <= budget)
    thr = (viable[0] if viable else 50) / 100.0
    print(f"sweep                 : {dict((r['thr'], r['n_flagged']) for r in sweep)}"
          f" -> threshold {thr}")

    pairs = cand.where(F.col("cos_sim") >= thr)
    comp = connected_components(pairs, "id_a", "id_b").withColumnRenamed(
        "id", "doc_id"
    )
    members = docs.join(comp, "doc_id").withColumn(
        "__q", quality_score(F.col("text"))
    )
    w_best = Window.partitionBy("comp").orderBy(
        F.col("__q").desc(), F.col("doc_id").asc()
    )
    drop_ids = (
        members.withColumn("__rn", F.row_number().over(w_best))
        .where(F.col("__rn") > 1)
        .select("doc_id")
    )
    docs = docs.join(F.broadcast(drop_ids), "doc_id", "left_anti")

    # 3. decontamination against a held-out benchmark slice
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    corpus = decontaminate(corpus, bench, "doc_id", "text", ngram=8)

    # 4. corpus-relative length gate: drop the p05/p95 token-count tails
    lengths = corpus.withColumn(
        "__n", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double")
    )
    fences = lengths.agg(
        F.percentile("__n", F.lit(0.05)).alias("lo"),
        F.percentile("__n", F.lit(0.95)).alias("hi"),
    )
    corpus = (
        lengths.crossJoin(F.broadcast(fences))
        .where((F.col("__n") >= F.col("lo")) & (F.col("__n") <= F.col("hi")))
        .drop("__n", "lo", "hi")
    )

    # 5. quality + repetition gates (all zero-shuffle scan expressions)
    m = repetition_metrics(F.col("text"))
    corpus = corpus.where(
        (quality_score(F.col("text")) >= 0.3)
        & (m["top_word_ratio"] <= 0.3)
        & (m["distinct_ratio"] >= 0.4)
    )

    # 5b. corpus-trained bigram-LM cross-entropy gate (CCNet-style): score
    # every doc under the corpus's own bigram MLE and drop the most
    # unnatural tail (top 5% cross-entropy). Count tables shuffle on token
    # keys with map-side combine; the fence broadcasts back.
    toks_lm = corpus.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("ws")
    )
    bi = toks_lm.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("ws"), 1, F.greatest(F.size("ws") - 1, F.lit(0))),
                F.expr("slice(ws, 2, greatest(size(ws) - 1, 0))"),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    xent = (
        bi.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg((-F.avg(F.log2(F.col("n12").cast("double") / F.col("n1")))).alias("__xent"))
    )
    xfence = xent.agg(F.percentile("__xent", F.lit(0.95)).alias("xhi"))
    keep_lm = (
        xent.crossJoin(F.broadcast(xfence))
        .where(F.col("__xent") <= F.col("xhi"))
        .select("doc_id")
    )
    corpus = corpus.join(keep_lm, "doc_id", "left_semi")

    # 5c. quality-weighted importance sampling (deterministic: key-hash
    # threshold vs the score — same member set on any partitioning)
    from govgis_nov2023_slim_spatial_server_spark.operators.sampling import hash_bucket

    corpus = corpus.where(
        hash_bucket(F.col("doc_id"))
        < F.floor(quality_score(F.col("text")) * 10000.0).cast("long")
    )

    # 6. PII redaction (map-only)
    corpus = corpus.withColumn(
        "text", F.regexp_replace(F.col("text"), EMAIL_RE, "[EMAIL]")
    )

    # 7. chunk + boilerplate dedup
    chunks = chunk_by_tokens(corpus, "doc_id", "text", chunk_tokens=64, overlap=0)
    chunks = dedup_chunks(chunks)

    # 8. pack into 512-token training sequences, 8 shards
    packed = pack_sequences(
        chunks.select(
            (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("unit_id"),
            (F.col("doc_id") % 8).alias("shard"),
            "n_tokens",
        ),
        "unit_id",
        "n_tokens",
        seq_tokens=512,
        shard_col="shard",
    )

    # 9. loader-side mixture weights (uniform target across labels)
    by_label = (
        corpus.join(embs.select(F.col("vec_id").alias("doc_id"), "label"), "doc_id")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = by_label.agg(
        F.sum("n").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    weights = by_label.crossJoin(F.broadcast(tot)).select(
        "label", "n", F.round(F.col("total") / F.col("k") / F.col("n"), 4).alias("weight")
    )
    # ...and the temperature-scaled (τ=0.7) schedule: up-weights small
    # domains without flattening to uniform (the multilingual-mixing rule)
    raw = by_label.crossJoin(F.broadcast(tot)).select(
        "label",
        "n",
        F.pow(F.col("n").cast("double") / F.col("total"), 0.7).alias("w_raw"),
    )
    z = raw.agg(F.sum("w_raw").alias("z"))
    temp_weights = raw.crossJoin(F.broadcast(z)).select(
        "label", F.round(F.col("w_raw") / F.col("z"), 4).alias("p")
    )

    # 10. corpus card published with the snapshot: length profile,
    # Zipf naturalness fit, curriculum tier cut points
    toks = corpus.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("__n")
    )
    hist = (
        toks.groupBy(F.floor(F.log2("__n")).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("bucket")
    )
    tf = (
        corpus.select(F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("t").asc())
        .limit(100)
    )
    from pyspark.sql import Window

    ranked = tf.withColumn(
        "__r", F.row_number().over(Window.orderBy(F.col("freq").desc(), F.col("t").asc()))
    ).select(F.log(F.col("__r").cast("double")).alias("lx"), F.log("freq").alias("ly"))
    fit = ranked.agg(
        (F.covar_pop("ly", "lx") / F.var_pop("lx")).alias("slope")
    )
    tiers = corpus.select(
        "doc_id",
        quality_score(F.col("text")).alias("q"),
    ).withColumn(
        "tier",
        F.ntile(4).over(Window.orderBy(F.col("q").asc(), F.col("doc_id").asc())),
    ).groupBy("tier").agg(F.round(F.min("q"), 3).alias("tier_floor"))

    n_seq = packed.agg(F.countDistinct("shard", "seq_id")).first()[0]
    print(f"documents in          : {n0}")
    print(f"after near-dup groups : {docs.count()}")
    print(f"after decontamination : {corpus.count() + bench.count()} (incl. {bench.count()} benchmark)")
    print(f"chunks after dedup    : {chunks.count()}")
    print(f"packed sequences      : {n_seq} x 512 tokens over 8 shards")
    print("mixture weights       :", {r["label"]: r["weight"] for r in weights.collect()})
    print("temperature schedule  :", {r["label"]: r["p"] for r in temp_weights.collect()})
    print("length histogram      :", {r["bucket"]: r["n_docs"] for r in hist.collect()})
    print(f"zipf slope            : {fit.first()['slope']:.3f}")
    print("curriculum tier floors:", {r["tier"]: r["tier_floor"] for r in tiers.orderBy("tier").collect()})

    from govgis_nov2023_slim_spatial_server_spark.catalog import QUERIES

    bal = QUERIES["lsh_bucket_balance"](spark, sf_dir).first()
    rec = (
        QUERIES["ann_recall_at_10"](spark, sf_dir)
        .agg(F.avg("recall"))
        .first()[0]
    )
    print(
        f"ANN store audit       : {bal['n_buckets_used']} buckets used, "
        f"skew {bal['skew_ratio']:.2f}, LSH recall@10 {rec:.2f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
