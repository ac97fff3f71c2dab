"""Graph analytics over the TPC-H trade graph: fixed-iteration
PageRank and degree-oriented triangle counting.

Beyond-reference scope (the reference's eager pandas layer has no
graph shapes); these are the two canonical "iterate / enumerate over
an edge list" operators a 100 TB relational lake still needs — entity
importance (PageRank over who-buys-from-whom) and community density
(triangles).  The graph here is the **nation-level trade graph**:
edge ``cust_nation -> supp_nation`` weighted by the number of
lineitems a customer of the source nation bought from a supplier of
the destination nation.

Scale design:

* **Graph build** is two broadcast-dimension joins (customer and
  supplier keyed maps are dim-sized) + one hash aggregate on the
  (src, dst) pair — the only big shuffle carries 16-byte key pairs,
  map-side combined.
* **PageRank** keeps node state as a DataFrame (NEVER collected):
  each iteration is edges ⋈ ranks on src (one hash join keyed like
  the previous iteration — the exchange layout is reusable), a
  groupBy dst, and a left join back to the node spine.  Per-iteration
  cost ∝ |E| shuffled bytes, state ∝ |V|; at 100 TB the nation graph
  is trivially small, and the same plan holds for a billion-node
  graph because nothing is driver-materialized.  Iterations are fixed
  (``PR_ITERS``) so the DuckDB oracle can unroll the recurrence into
  one CTE chain per iteration.
* **FP parity** for the rank sums: every order-sensitive double sum
  (inflow per dst, dangling mass) is a LEFT-TO-RIGHT fold over the
  contribution list sorted by source node — Spark folds
  ``array_sort(collect_list(struct(src, contrib)))``, DuckDB
  ``list_sum(list(contrib ORDER BY src))`` — so both engines add the
  same doubles in the same order and the 10-iteration fixpoint is
  bit-identical (same trick as the cosine folds in similarity.py).
* **Triangles** use the classic degree-orientation: each undirected
  edge points from its (degree, id)-smaller endpoint to the larger,
  so every triangle is counted exactly once as an oriented wedge
  (u→v, u→w, v<w ordering implied by orientation) closed by the
  oriented edge (v→w).  The wedge join fans out by out-degree, which
  orientation bounds by O(√|E|) — the standard distributed triangle
  bound; all joins are equi-joins on node ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.registry import load_table

__all__ = ["pagerank_nations", "triangle_count_trade"]

PR_ITERS = 10
PR_DAMPING = 0.85  # exactly representable? 0.85 is not exact in binary,
# but both engines parse the literal to the same nearest double, so the
# arithmetic trees still match bit-for-bit.


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed weighted edges cust_nation -> supp_nation.

    lineitem ⋈ orders(broadcastable at dim granularity? orders is a
    fact — join on l_orderkey is the one fact-fact shuffle) ⋈ customer
    ⋈ supplier; customer/supplier are broadcast dims.  Output is at
    most |nations|² rows after the map-side-combined count.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )


_SQL_EDGES = """
SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1, 2
"""


def _sorted_fold_sum(order_col: str, value_col: str) -> Column:
    """Deterministic double sum: left fold over values sorted by
    ``order_col`` (parity twin of DuckDB ``list_sum(list(v ORDER BY o))``)."""
    return F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(order_col, value_col))),
            lambda x: x[value_col],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``PR_ITERS`` fixed iterations of damped PageRank over the
    nation trade graph; returns every nation with its rank and
    position.

    r_{k+1}(v) = (1-d)/N + d·(Σ_{(u,v)∈E} r_k(u)·w(u,v)/out(u)
                              + dangling_k/N)

    The dangling-mass scalar is a 1-row aggregate crossJoined in
    (broadcast, the sanctioned scalar pattern).  State stays
    distributed; lineage depth is ``PR_ITERS`` joins over a
    25-row state — checkpoint per iteration when |V| is large (see
    dedup_clusters for the localCheckpoint loop pattern).
    """
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node"), "n_name"
    )
    n_nodes = nation.count()  # graph metadata, dim-sized by construction

    edges = _trade_edges(spark, sf_dir)
    out = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    # localCheckpoint truncates lineage: ``ranks`` feeds BOTH the
    # dangling-mass and the inflow branch each iteration, so without
    # truncation the logical plan doubles per iteration (2^ITERS copies
    # of the 4-table edge build — Catalyst stack-overflows around 10).
    # The checkpointed state is |V|-sized (nation granularity here);
    # at billion-node scale swap in reliable checkpoint() to HDFS.
    edges = edges.join(out, "src").select(
        "src",
        "dst",
        (F.col("w").cast("double") / F.col("out_w").cast("double")).alias("s"),
    ).localCheckpoint(eager=True)
    dangling = nation.join(edges.select("src"), nation.node == F.col("src"), "left_anti")

    base = F.lit(0.15) / F.lit(float(n_nodes))
    ranks = nation.select("node", (F.lit(1.0) / F.lit(float(n_nodes))).alias("r"))

    for _ in range(PR_ITERS):
        dm = (
            dangling.join(ranks, "node")
            .agg(F.coalesce(_sorted_fold_sum("node", "r"), F.lit(0.0)).alias("dm"))
        )
        inflow = (
            edges.join(ranks, edges.src == ranks.node)
            .select("dst", "src", (F.col("r") * F.col("s")).alias("contrib"))
            .groupBy("dst")
            .agg(_sorted_fold_sum("src", "contrib").alias("infl"))
        )
        ranks = (
            nation.select("node")
            .join(inflow, nation.node == inflow.dst, "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "node",
                (
                    base
                    + F.lit(PR_DAMPING)
                    * (
                        F.coalesce(F.col("infl"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n_nodes))
                    )
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )

    pos = F.row_number().over(W.orderBy(F.col("_key").desc(), F.col("node")))
    return (
        ranks.join(F.broadcast(nation), "node")
        .select(
            "node",
            "n_name",
            F.round("r", 6).alias("pagerank"),
            F.round("r", 9).alias("_key"),
        )
        .withColumn("position", pos.cast("long"))
        .select("node", "n_name", "pagerank", "position")
        .orderBy("position")
    )


def _oracle_pagerank() -> str:
    """Unrolled CTE chain — one (dm, inflow, rank) stage per iteration."""
    # shared CTEs are MATERIALIZED: the unrolled iteration chain
    # references them 10+ times, and inlining would re-open the base
    # parquet per reference (fd exhaustion on the 4-table edge scan)
    parts = [
        f"WITH edges_raw AS MATERIALIZED ({_SQL_EDGES}),",
        "nodes AS MATERIALIZED (SELECT n_nationkey AS node, n_name FROM nation),",
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),",
        """edges AS MATERIALIZED (
  SELECT src, dst, CAST(w AS DOUBLE) / CAST(out_w AS DOUBLE) AS s
  FROM (SELECT *, SUM(w) OVER (PARTITION BY src) AS out_w FROM edges_raw)
),""",
        """dangling AS MATERIALIZED (
  SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM edges)
),""",
        "r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes, nn),",
    ]
    for k in range(PR_ITERS):
        parts.append(
            f"""dm{k} AS (
  SELECT COALESCE(list_sum(list(r ORDER BY node)), 0.0) AS dm
  FROM r{k} WHERE node IN (SELECT node FROM dangling)
),
infl{k} AS (
  SELECT e.dst AS node, list_sum(list(r{k}.r * e.s ORDER BY e.src)) AS infl
  FROM edges e JOIN r{k} ON e.src = r{k}.node GROUP BY e.dst
),
r{k + 1} AS (
  SELECT n.node,
    0.15 / nn.n + {PR_DAMPING} * (COALESCE(i.infl, 0.0) + d.dm / nn.n) AS r
  FROM nodes n
  LEFT JOIN infl{k} i ON n.node = i.node
  CROSS JOIN dm{k} d CROSS JOIN nn
),"""
        )
    parts.append(
        f"""ranked AS (
  SELECT r{PR_ITERS}.node, n.n_name, ROUND(r, 6) AS pagerank,
    row_number() OVER (ORDER BY ROUND(r, 9) DESC, r{PR_ITERS}.node) AS position
  FROM r{PR_ITERS} JOIN nodes n ON r{PR_ITERS}.node = n.node
)
SELECT node, n_name, pagerank, CAST(position AS BIGINT) AS position
FROM ranked ORDER BY position"""
    )
    return "\n".join(parts)


ORACLE_PAGERANK = _oracle_pagerank()


def triangle_count_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle participation in the undirected trade graph
    (distinct nation pairs with any trade in either direction;
    self-loops dropped).

    Degree orientation → wedge equi-join → closing-edge semi join;
    each triangle found once, then exploded to its three corners for
    the per-node census.  Everything is an equi-join on int keys.
    """
    e = _trade_edges(spark, sf_dir)
    # localCheckpoint: ``und`` fans out into degree (×2) / wedge (×2) /
    # closing (×2) branches — inlined, the 4-table edge build would
    # appear ~20× in the static plan (90 lineitem scans observed);
    # truncating here computes it once.  State is |E_und| rows.
    und = (
        e.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    lower_a = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.when(lower_a, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_a, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    e1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = e1.join(e2, "u").filter(F.col("x") < F.col("y"))
    tri = wedges.join(
        oriented.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
        "inner",
    ).unionAll(
        # closing edge may be oriented y->x when deg(y) < deg(x)
        wedges.join(
            oriented.select(F.col("v").alias("x"), F.col("u").alias("y")),
            ["x", "y"],
            "inner",
        )
    )
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("x").alias("node")))
        .unionAll(tri.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node"), "n_name"
    )
    return (
        nation.join(corners, "node", "left")
        .select(
            "node",
            "n_name",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        )
        .orderBy("node")
    )


ORACLE_TRIANGLES = f"""
WITH edges_raw AS ({_SQL_EDGES}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges_raw WHERE src <> dst
),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
  ) GROUP BY node
),
oriented AS (
  SELECT CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.a ELSE u.b END AS u,
         CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.b ELSE u.a END AS v
  FROM und u
  JOIN deg da ON u.a = da.node
  JOIN deg db ON u.b = db.node
),
wedges AS (
  SELECT e1.u, e1.v AS x, e2.v AS y
  FROM oriented e1 JOIN oriented e2 ON e1.u = e2.u
  WHERE e1.v < e2.v
),
tri AS (
  SELECT w.u, w.x, w.y FROM wedges w JOIN oriented o ON w.x = o.u AND w.y = o.v
  UNION ALL
  SELECT w.u, w.x, w.y FROM wedges w JOIN oriented o ON w.y = o.u AND w.x = o.v
),
corners AS (
  SELECT node, COUNT(*) AS n_triangles FROM (
    SELECT u AS node FROM tri
    UNION ALL SELECT x AS node FROM tri
    UNION ALL SELECT y AS node FROM tri
  ) GROUP BY node
)
SELECT n.n_nationkey AS node, n.n_name,
       CAST(COALESCE(c.n_triangles, 0) AS BIGINT) AS n_triangles
FROM nation n LEFT JOIN corners c ON n.n_nationkey = c.node
ORDER BY node
"""
