"""UDF-matrix legs added in round 2: Python UDTF (sentence split),
grouped-agg pandas UDF (median/IQR), and the FK integrity audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_spark.operators import integrity as IG
from f1_data_engineering_spark.operators import pandas_ops as PD
from f1_data_engineering_spark.operators import udtf_ops as UT
from f1_data_engineering_spark.sources.registry import load_table


def test_udtf_matches_explode_equivalent(spark, sf_dir):
    """The UDTF must agree row-for-row with the JVM-side explode
    formulation (the production path for this particular transform)."""
    got = {
        (r["doc_id"], r["sentence_idx"]): (r["sentence"], r["n_tokens"])
        for r in UT.sentence_split(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    parts = F.split("text", UT._BOUNDARY)
    trimmed = F.filter(
        F.transform(parts, lambda x: F.btrim(x, F.lit(UT._WS))),
        lambda x: x != "",
    )
    exp = d.select("doc_id", F.posexplode(trimmed).alias("sentence_idx", "sentence"))
    want = {
        (r["doc_id"], r["sentence_idx"]): r["sentence"] for r in exp.collect()
    }
    assert set(got) == set(want)
    for k, (sent, ntok) in got.items():
        assert want[k] == sent
        assert ntok == len(sent.split())


def test_grouped_agg_udaf_matches_builtin_percentile(spark, sf_dir):
    ours = {
        r["user_id"]: (r["med_value"], r["iqr_value"], r["n_events"])
        for r in PD.user_value_median_iqr(spark, sf_dir).collect()
    }
    builtin = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("med"),
            F.round(
                F.percentile("value", F.lit(0.75)) - F.percentile("value", F.lit(0.25)),
                6,
            ).alias("iqr"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(builtin) == len(ours)
    for r in builtin:
        med, iqr, n = ours[r["user_id"]]
        assert abs(med - r["med"]) <= 1e-6
        assert abs(iqr - r["iqr"]) <= 1e-6
        assert n == r["n"]


def test_fk_audit_clean_on_tpch_data(spark, sf_dir):
    rows = {r["fk_edge"]: r for r in IG.fk_orphan_audit(spark, sf_dir).collect()}
    assert len(rows) == len(IG.FK_EDGES)
    li = load_table(spark, sf_dir, "lineitem").count()
    assert rows["lineitem.l_orderkey->orders"]["n_child"] == li
    for r in rows.values():
        # driver-generated TPC-H data is referentially clean
        assert r["n_orphans"] == 0 and r["n_null_keys"] == 0


def test_fk_audit_detects_planted_orphans(spark, tmp_path, sf_dir):
    """Plant orphans in a copied slice and audit THAT directory."""
    import shutil, os

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        shutil.copy(os.path.join(sf_dir, f"{t}.parquet"), tmp_path / f"{t}.parquet")
    # rewrite nation with 2 bogus region keys
    n = load_table(spark, str(tmp_path), "nation")
    doctored = n.withColumn(
        "n_regionkey",
        F.when(F.col("n_nationkey") < 2, F.lit(999)).otherwise(F.col("n_regionkey")),
    )
    pdf = doctored.toPandas()
    import pyarrow as pa, pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pdf), tmp_path / "nation.parquet")
    rows = {r["fk_edge"]: r for r in IG.fk_orphan_audit(spark, str(tmp_path)).collect()}
    assert rows["nation.n_regionkey->region"]["n_orphans"] == 2


def test_arrow_optimized_scalar_udf(spark):
    """The Arrow-optimized scalar UDF leg (useArrow=True): same
    semantics as the row-path UDF, Arrow-batched transfer.  Kept off
    the oracle path (Python UDFs are the sanctioned slow lane) but the
    matrix leg must work."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.udf(returnType=LongType(), useArrow=True)
    def collatz_steps(n: int) -> int:
        steps = 0
        n = n or 0
        while n > 1 and steps < 200:
            n = n // 2 if n % 2 == 0 else 3 * n + 1
            steps += 1
        return steps

    df = spark.range(1, 20).select(collatz_steps("id").alias("steps"))
    got = [r["steps"] for r in df.collect()]
    def ref(n):
        s = 0
        while n > 1 and s < 200:
            n = n // 2 if n % 2 == 0 else 3 * n + 1
            s += 1
        return s
    assert got == [ref(n) for n in range(1, 20)]


def test_attach_audit_observation(spark, sf_dir):
    """Audit metrics must ride the existing action: one job, exact
    row/null counts."""
    from f1_data_engineering_spark.plans import attach_audit
    from f1_data_engineering_spark.sources.registry import load_table

    o = load_table(spark, sf_dir, "orders")
    audited, obs = attach_audit(o, "orders_audit", "o_custkey", "o_totalprice")
    n = audited.count()  # the action the metrics ride on
    m = obs.get
    assert m["n_rows"] == n
    assert m["n_null_o_custkey"] == o.filter("o_custkey IS NULL").count()
    assert m["n_null_o_totalprice"] >= 0


def test_polymorphic_udtf_schema_follows_argument(spark):
    """analyze()-based UDTF: the output schema is derived from the
    constant metrics argument at plan time."""
    from pyspark.sql.functions import udtf as udtf_fn

    from f1_data_engineering_spark.operators.udtf_ops import TokenMetrics

    spark.udtf.register("token_metrics", udtf_fn(TokenMetrics))
    spark.sql("SELECT 'ab1 xyz' AS t").createOrReplaceTempView("_tm_in")

    wide = spark.sql(
        "SELECT s.* FROM _tm_in, LATERAL token_metrics(t, 'len,alpha,digit') s"
    )
    assert wide.columns == ["token", "len", "alpha", "digit"]
    rows = {r["token"]: r for r in wide.collect()}
    assert (rows["ab1"]["len"], rows["ab1"]["alpha"], rows["ab1"]["digit"]) == (3, 2, 1)
    assert (rows["xyz"]["len"], rows["xyz"]["alpha"], rows["xyz"]["digit"]) == (3, 3, 0)

    narrow = spark.sql(
        "SELECT s.* FROM _tm_in, LATERAL token_metrics(t, 'len') s"
    )
    assert narrow.columns == ["token", "len"]
