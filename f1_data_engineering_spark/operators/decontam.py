"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

Standard LLM-corpus hygiene (the reference has no analog; this is part
of the beyond-reference training-data surface alongside dedup/
similarity): an eval suite is tiny relative to a 100 TB corpus, so the
scale shape is fixed — build the eval n-gram set once, broadcast it,
and stream the corpus past it.  No shuffle touches document bodies;
the only exchange is the per-doc hit-count aggregate (map-side
combined, one row per doc).

Eval membership here is synthesized deterministically (doc_id % 50 = 0)
since the test corpus ships no split column; in production the eval
grams come from the benchmark files themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import shingles
from ..sources.registry import load_table, spread

#: Contamination gram width.  5 word-grams is the common published
#: choice (e.g. GPT-3 appendix used 13-gram / 8-gram variants; small
#: synthetic docs need a width that actually occurs).
NGRAM_N = 5

#: A train doc is contaminated when this fraction of its distinct
#: n-grams appears in the eval set.
CONTAM_THRESHOLD = 0.30

# DuckDB twins of functions/text.tokens + shingles(n=5) — keep in
# lock-step (same normalization: lower, trim, split on whitespace).
_SQL_TOKS = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"
_SQL_GRAMS5 = (
    "CASE WHEN len(toks) >= 5 THEN "
    "list_transform(range(len(toks)-4), i -> "
    "toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5]) "
    "ELSE [array_to_string(toks, ' ')] END"
)


def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per training document: distinct 5-gram count, how many of those
    grams occur anywhere in the eval split, the overlap ratio, and the
    contamination verdict.  Only docs with at least one hit are
    returned (the clean tail is the overwhelming majority at scale).

    Plan shape: eval grams → array_distinct → explode → distinct →
    broadcast hash join against the exploded train grams (stream side
    never shuffles); hit counts via partial-aggregated groupBy(doc_id).
    """
    # spread: the 5-gram build is tokenize + string-concat per gram —
    # compute-bound, so parallelism must not follow input byte layout
    d = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
    eval_grams = (
        d.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode(F.array_distinct(shingles("text", NGRAM_N))).alias("gram"))
        .distinct()
    )
    train = d.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", F.array_distinct(shingles("text", NGRAM_N)).alias("grams")
    )
    exploded = train.select(
        "doc_id",
        F.size("grams").cast("bigint").alias("n_grams"),
        F.explode("grams").alias("gram"),
    )
    hits = (
        exploded.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id", "n_grams")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    ratio = F.col("n_hit") / F.col("n_grams")
    return hits.select(
        "doc_id",
        "n_grams",
        "n_hit",
        F.round(ratio, 6).alias("overlap_ratio"),
        (ratio >= CONTAM_THRESHOLD).alias("contaminated"),
    )


ORACLE_DECONTAM = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, list_distinct({_SQL_GRAMS5}) AS grams FROM t),
eval_grams AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0
),
train AS (
  SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
  FROM g WHERE doc_id % 50 <> 0
),
hits AS (
  SELECT doc_id, n_grams, COUNT(*) AS n_hit
  FROM train JOIN eval_grams USING (gram)
  GROUP BY doc_id, n_grams
)
SELECT doc_id, n_grams, n_hit,
  ROUND(n_hit / CAST(n_grams AS DOUBLE), 6) AS overlap_ratio,
  (n_hit / CAST(n_grams AS DOUBLE)) >= {CONTAM_THRESHOLD} AS contaminated
FROM hits
"""


def contamination_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level roll-up of the decontamination scan, per source:
    docs scanned, docs with any eval overlap, docs over the
    contamination threshold, and the worst overlap ratio.  The report
    a data-curation run actually publishes; one extra tiny aggregate
    on top of the per-doc scan.
    """
    d = load_table(spark, sf_dir, "documents")
    per_doc = decontaminate_ngrams(spark, sf_dir)
    joined = d.filter(F.col("doc_id") % 50 != 0).select("doc_id", "source").join(
        per_doc, "doc_id", "left"
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_train_docs"),
        F.count("n_hit").alias("n_overlapping"),
        F.sum(F.when(F.col("contaminated"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_contaminated"),
        F.round(F.max(F.coalesce(F.col("overlap_ratio"), F.lit(0.0))), 6).alias(
            "max_overlap"
        ),
    )


ORACLE_CONTAM_SUMMARY = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, list_distinct({_SQL_GRAMS5}) AS grams FROM t),
eval_grams AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0
),
train AS (
  SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
  FROM g WHERE doc_id % 50 <> 0
),
hits AS (
  SELECT doc_id, n_grams, COUNT(*) AS n_hit
  FROM train JOIN eval_grams USING (gram)
  GROUP BY doc_id, n_grams
),
per_doc AS (
  SELECT doc_id, n_hit, n_hit / CAST(n_grams AS DOUBLE) AS ratio
  FROM hits
)
SELECT d.source,
  CAST(COUNT(*) AS BIGINT) AS n_train_docs,
  CAST(COUNT(p.n_hit) AS BIGINT) AS n_overlapping,
  CAST(COALESCE(SUM(CASE WHEN p.ratio >= {CONTAM_THRESHOLD} THEN 1 ELSE 0 END), 0) AS BIGINT)
    AS n_contaminated,
  ROUND(MAX(COALESCE(p.ratio, 0)), 6) AS max_overlap
FROM documents d LEFT JOIN per_doc p USING (doc_id)
WHERE d.doc_id % 50 <> 0
GROUP BY d.source
"""
