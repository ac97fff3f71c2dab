"""Graph-operator tests: hand-computed micro-graph pins (independent
Python references), corpus-level invariants, and plan-shape checks for
pagerank_nations / triangle_count_trade / semdedup_prune /
exact_substring_dup."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_spark.operators import dedup as DD
from f1_data_engineering_spark.operators import graphops as GR
from f1_data_engineering_spark.operators import similarity as SIM


def _write_trade_lake(spark, path, nations, edges):
    """Micro TPC-H lake whose nation trade graph is exactly ``edges``:
    one customer+supplier per nation, one order per edge occurrence,
    one lineitem per unit of weight."""
    spark.createDataFrame(
        [(n, f"N{n}", 0) for n in nations],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/nation.parquet")
    spark.createDataFrame(
        [(n + 1, f"C{n}", n, 0.0, "SEG") for n in nations],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/customer.parquet")
    spark.createDataFrame(
        [(n + 1, f"S{n}", n, 0.0) for n in nations],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/supplier.parquet")
    from datetime import date

    orders, lineitems = [], []
    for k, (src, dst, w) in enumerate(edges):
        okey = k + 1
        orders.append((okey, src + 1, "O", 1.0, date(1995, 1, 1), "1-URGENT"))
        for ln in range(w):
            lineitems.append(
                (okey, 1, dst + 1, ln + 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                 date(1995, 1, 2))
            )
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")
    spark.createDataFrame(
        lineitems,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate date",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def _pagerank_reference(nodes, edges, iters, d=0.85):
    """Independent plain-Python PageRank with the SAME deterministic
    fold order (contributions sorted by source node) as the operator."""
    n = len(nodes)
    out = {}
    for src, dst, w in edges:
        out[src] = out.get(src, 0) + w
    share = {(s, t): w / out[s] for s, t, w in edges}
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = 0.0
        for v in sorted(nodes):
            if v not in out:
                dangling += r[v]
        new = {}
        for v in nodes:
            infl = 0.0
            for (s, t), sh in sorted(share.items()):
                if t == v:
                    infl += r[s] * sh
            new[v] = 0.15 / n + d * (infl + dangling / n)
        r = new
    return r


def test_pagerank_hand_computed_micro_graph(spark, tmp_path):
    """3-node graph with a dangling node: ranks match an independent
    Python implementation bit-for-bit (same fold order)."""
    nations = [0, 1, 2]
    # node 2 has NO outgoing edges -> exercises the dangling-mass term
    edges = [(0, 1, 2), (0, 2, 1), (1, 2, 3)]
    _write_trade_lake(spark, str(tmp_path), nations, edges)
    got = {r["node"]: r for r in GR.pagerank_nations(spark, str(tmp_path)).collect()}
    want = _pagerank_reference(nations, edges, GR.PR_ITERS)
    assert set(got) == set(nations)
    for v in nations:
        assert got[v]["pagerank"] == pytest.approx(round(want[v], 6), abs=1e-9), v
    # more mass flows into the sink node 2 than anywhere else
    assert got[2]["position"] == 1


def test_pagerank_corpus_invariants(spark, sf_dir):
    rows = GR.pagerank_nations(spark, sf_dir).collect()
    assert len(rows) == 25
    total = sum(r["pagerank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-3)  # rank mass conserved
    assert all(r["pagerank"] > 0 for r in rows)
    assert sorted(r["position"] for r in rows) == list(range(1, 26))
    # ordered by position, rank non-increasing
    ordered = sorted(rows, key=lambda r: r["position"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["pagerank"] >= b["pagerank"] - 1e-9


def _triangles_reference(und_edges):
    """Brute-force per-node triangle counts over an undirected edge set."""
    adj = {}
    for a, b in und_edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = {v: 0 for v in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                count[v] += 1
    return count


def test_triangles_hand_computed_micro_graph(spark, tmp_path):
    """4-cycle + chord: exactly two triangles, both through the chord."""
    nations = [0, 1, 2, 3]
    # undirected edges 0-1, 1-2, 2-3, 3-0 and chord 0-2 (as directed
    # trade edges in arbitrary directions, one with both directions)
    edges = [(0, 1, 1), (2, 1, 2), (2, 3, 1), (0, 3, 1), (0, 2, 1), (2, 0, 4)]
    _write_trade_lake(spark, str(tmp_path), nations, edges)
    got = {
        r["node"]: r["n_triangles"]
        for r in GR.triangle_count_trade(spark, str(tmp_path)).collect()
    }
    want = _triangles_reference([(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])
    assert got == {0: 2, 1: 1, 2: 2, 3: 1}
    assert {v: c for v, c in got.items()} == want


def test_triangles_match_bruteforce_on_corpus(spark, sf_dir):
    """Operator output equals an independent brute-force enumeration of
    the same undirected nation graph (graph is |nations|-sized, so the
    reference is cheap)."""
    e = GR._trade_edges(spark, sf_dir)
    und = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in e.collect()
        if r["src"] != r["dst"]
    }
    want = _triangles_reference(sorted(und))
    got = {
        r["node"]: r["n_triangles"]
        for r in GR.triangle_count_trade(spark, sf_dir).collect()
    }
    for v, c in want.items():
        assert got[v] == c, (v, got[v], c)
    # nations absent from the edge set appear with 0
    assert all(c == 0 for v, c in got.items() if v not in want)


def test_graph_plans_no_cartesian(spark, sf_dir):
    from f1_data_engineering_spark.plans import physical_plan

    for df in (
        GR.triangle_count_trade(spark, sf_dir),
        DD.exact_substring_dup(spark, sf_dir),
        GR.bfs_hops_trade(spark, sf_dir),
        GR.cc_star_contraction(spark, sf_dir),
    ):
        plan = physical_plan(df, "simple")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_semdedup_planted_copies_pruned(spark, sf_dir):
    rows = SIM.semdedup_prune(spark, sf_dir).collect()
    by_id = {r["vec_id"]: r for r in rows}
    planted = [r for r in rows if r["vec_id"] >= 100000]
    assert len(planted) == SIM.SEMDEDUP_PLANTED
    for r in planted:
        assert r["pruned"] == 1, r
        assert r["max_prior_sim"] == pytest.approx(1.0, abs=1e-6)
        # planted copy shares its original's cell (identical vector)
        assert r["cell"] == by_id[r["vec_id"] - 100000]["cell"]
    # a cell's smallest id can never be pruned (no smaller-id neighbor)
    leaders = {}
    for r in rows:
        if r["cell"] not in leaders or r["vec_id"] < leaders[r["cell"]]["vec_id"]:
            leaders[r["cell"]] = r
    for r in leaders.values():
        assert r["pruned"] == 0 and r["max_prior_sim"] is None
    # prune rule is exactly max_prior_sim >= tau
    for r in rows:
        if r["max_prior_sim"] is not None and r["max_prior_sim"] >= SIM.SEMDEDUP_TAU:
            assert r["pruned"] == 1
        if r["max_prior_sim"] is None:
            assert r["pruned"] == 0


def test_exact_substring_planted_micro_corpus(spark, tmp_path):
    """Two docs sharing a 50-char span + one with an internal repeat:
    window counts match a brute-force Python substring census."""
    shared = "the quick brown fox jumps over the lazy dog again!"  # 50 chars
    assert len(shared) == 50
    docs = [
        (1, "AAA " + shared + " unique tail one here", "en", "A"),
        (2, "BBBB " + shared + " other ending text zz", "en", "A"),
        (3, "x" * 39, "en", "B"),  # shorter than the window -> 0 windows
        (4, ("repeat me " * 12).strip(), "en", "B"),  # internal repetition
    ]
    spark.createDataFrame(
        [(d, t, l, s, len(t)) for d, t, l, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    # independent reference: exact window strings, corpus-wide counts
    from collections import Counter

    L = DD.SUBSTR_WINDOW
    wins = {
        d: [t[i : i + L] for i in range(len(t) - L + 1)] if len(t) >= L else []
        for d, t, _, _ in docs
    }
    occ = Counter(w for ws in wins.values() for w in ws)
    want = {
        d: (len(ws), sum(1 for w in ws if occ[w] >= 2))
        for d, ws in wins.items()
    }

    got = {r["doc_id"]: r for r in DD.exact_substring_dup(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3, 4}
    for d, (nw, nd) in want.items():
        assert got[d]["n_windows"] == nw, d
        assert got[d]["n_dup_windows"] == nd, d
    assert got[3]["n_windows"] == 0 and got[3]["dup_ratio"] == 0.0
    assert got[4]["n_dup_windows"] > 0  # internal repeat detected
    assert got[1]["n_dup_windows"] >= 11  # 50-char shared span -> >= L-39 windows


def test_exact_substring_null_and_empty_text(spark, tmp_path):
    spark.createDataFrame(
        [(1, None, "en", "A", 0), (2, "", "en", "A", 0), (3, "y" * 45, "en", "B", 45)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r for r in DD.exact_substring_dup(spark, str(tmp_path)).collect()}
    assert got[1]["n_windows"] == 0 and got[1]["n_dup_windows"] == 0
    assert got[2]["n_windows"] == 0 and got[2]["dup_ratio"] == 0.0
    assert got[3]["n_windows"] == 6 and got[3]["n_dup_windows"] == 6  # 'y'*45: all 6 windows identical


# ---------------------------------------------------------------------------
# BFS hop distance
# ---------------------------------------------------------------------------


def _bfs_reference(und_edges, source, max_hops):
    """Plain-Python BFS over an undirected edge set."""
    adj = {}
    for a, b in und_edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {source: 0}
    frontier = [source]
    for k in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = k
                    nxt.append(v)
        frontier = nxt
    return dist


def test_bfs_hand_computed_micro_graph(spark, tmp_path):
    """Chain 0-1-…-8 (nodes 7, 8 beyond the 6-hop bound), an isolated
    nation, and a weak 4th edge from node 0 that top-3 sparsification
    must drop (its endpoint has no edges of its own -> unreachable)."""
    nations = list(range(9)) + [20, 30]
    edges = [(i, i + 1, 10) for i in range(8)]
    # node 0's 4th outgoing edge, weakest by weight -> pruned; nation
    # 30 never appears as a src so only this pruned edge could reach it
    edges += [(0, 30, 1)]
    _write_trade_lake(spark, str(tmp_path), nations, edges)
    got = {r["node"]: r["hops"] for r in GR.bfs_hops_trade(spark, str(tmp_path)).collect()}
    assert got[0] == 0
    for i in range(1, 7):
        assert got[i] == i, i
    assert got[7] == -1 and got[8] == -1  # beyond BFS_MAX_HOPS
    assert got[20] == -1  # isolated
    # chain edge weights (10) dominate the (0, 30) edge of weight 1:
    # node 0 keeps (0,1) plus (0,30)?  node 0 has out-edges to 1 and 30
    # only -> both kept; nation 30 reachable at hop 1 in that case.
    # Tighten: verify against the independent reference on the ACTUAL
    # sparsified graph instead of hand-waving.
    e = [(r["src"], r["dst"], r["w"]) for r in GR._trade_edges(spark, str(tmp_path)).collect()]
    kept = set()
    bysrc = {}
    for s, d, w in e:
        if s != d:
            bysrc.setdefault(s, []).append((d, w))
    for s, lst in bysrc.items():
        for d, _w in sorted(lst, key=lambda x: (-x[1], x[0]))[: GR.BFS_TOP_PARTNERS]:
            kept.add((s, d))
    und = {(min(a, b), max(a, b)) for a, b in kept}
    want = _bfs_reference(und, GR.BFS_SOURCE, GR.BFS_MAX_HOPS)
    for n in nations:
        assert got[n] == want.get(n, -1), n


def test_bfs_topk_pruning_disconnects(spark, tmp_path):
    """Node 0 has FOUR outgoing edges; the weakest one points at a
    supplier-only nation (no out-edges of its own), so top-3 pruning
    leaves it unreachable."""
    nations = [0, 1, 2, 3, 9]
    edges = [(0, 1, 9), (0, 2, 8), (0, 3, 7), (0, 9, 1),
             (1, 0, 5), (2, 0, 5), (3, 0, 5)]
    _write_trade_lake(spark, str(tmp_path), nations, edges)
    got = {r["node"]: r["hops"] for r in GR.bfs_hops_trade(spark, str(tmp_path)).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 9: -1}


def test_bfs_corpus_vs_reference(spark, sf_dir):
    """Operator equals the independent Python BFS on the identically
    sparsified corpus trade graph."""
    e = [(r["src"], r["dst"], r["w"]) for r in GR._trade_edges(spark, sf_dir).collect()]
    bysrc = {}
    for s, d, w in e:
        if s != d:
            bysrc.setdefault(s, []).append((d, w))
    kept = set()
    for s, lst in bysrc.items():
        for d, _w in sorted(lst, key=lambda x: (-x[1], x[0]))[: GR.BFS_TOP_PARTNERS]:
            kept.add((s, d))
    und = {(min(a, b), max(a, b)) for a, b in kept}
    want = _bfs_reference(und, GR.BFS_SOURCE, GR.BFS_MAX_HOPS)
    got = {r["node"]: r["hops"] for r in GR.bfs_hops_trade(spark, sf_dir).collect()}
    assert len(got) == 25
    assert got[GR.BFS_SOURCE] == 0
    for n, h in got.items():
        assert h == want.get(n, -1), n


# ---------------------------------------------------------------------------
# star-contraction connected components
# ---------------------------------------------------------------------------


def _star_fixpoint(spark, edge_pairs):
    """Drive _large_star/_small_star to fixpoint on a literal edge list;
    returns {node: label}."""
    edges = spark.createDataFrame(edge_pairs, "u long, v long").localCheckpoint(
        eager=True
    )
    nodes = {a for p in edge_pairs for a in p}
    prev = None
    for _ in range(GR.CC_STAR_MAX_ROUNDS):
        edges = GR._small_star(GR._large_star(edges)).localCheckpoint(eager=True)
        rows = sorted((r["u"], r["v"]) for r in edges.collect())
        if rows == prev:
            break
        prev = rows
    label = {n: n for n in nodes}
    for u, v in rows:
        label[u] = v
    return label


def test_star_contraction_chain_and_islands(spark):
    """A 12-node chain (diameter 11 — the label flood's worst case), a
    triangle, and a 2-node component all converge to min-labels."""
    chain = [(i, i + 1) for i in range(100, 111)]
    tri = [(7, 8), (8, 9), (7, 9)]
    pair = [(40, 41)]
    label = _star_fixpoint(spark, chain + tri + pair)
    assert all(label[n] == 100 for n in range(100, 112))
    assert all(label[n] == 7 for n in (7, 8, 9))
    assert label[40] == 40 and label[41] == 40


def test_star_contraction_matches_label_flood(spark, sf_dir):
    """cc_star_contraction and dedup_clusters: same pair graph, two
    independent algorithms, identical output."""
    a = sorted(
        (r["label"], r["cluster_size"], r["members"])
        for r in GR.cc_star_contraction(spark, sf_dir).collect()
    )
    b = sorted(
        (r["label"], r["cluster_size"], r["members"])
        for r in DD.dedup_clusters(spark, sf_dir).collect()
    )
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# √N-derived NLIST knob (coarse_nlist) — r5: the fixed test NLIST=16 is
# now computed from the corpus count, bounding within-cell pair work at
# any scale while keeping the 500-row test tables at the value every
# committed golden/driver hash was recorded at.
# ---------------------------------------------------------------------------


def test_coarse_nlist_rule_and_sql_twin():
    """Python rule: largest power of two whose square fits the corpus;
    DuckDB twin (_SQL_NLIST) must derive the identical value from a
    table of the same count."""
    import duckdb

    assert SIM.coarse_nlist(500) == 16      # the test tables' value
    assert SIM.coarse_nlist(2000) == 32     # sf0.1
    assert SIM.coarse_nlist(1) == 4         # low clamp
    assert SIM.coarse_nlist(0) == 4
    assert SIM.coarse_nlist(10**12) == SIM.NLIST_MAX  # high clamp
    assert SIM.coarse_nlist(1_000_000) == 512  # 512² = 262144 ≤ 1e6 < 1024²

    con = duckdb.connect()
    for n in [1, 6, 15, 16, 17, 255, 256, 257, 500, 2000, 20000, 10**6]:
        con.execute("CREATE OR REPLACE VIEW embeddings AS "
                    f"SELECT unnest(range({n})) AS vec_id")
        got = con.execute(f"SELECT {SIM._SQL_NLIST}").fetchone()[0]
        assert got == SIM.coarse_nlist(n), (n, got)


def test_semdedup_recall_contract_across_nlist(spark, sf_dir):
    """The documented recall contract must hold at ANY cell
    granularity: verbatim planted copies land in their original's cell
    and are pruned, and a finer partition (larger nlist) never does
    MORE within-cell pair work."""
    work = {}
    for nlist in (8, 32):
        rows = SIM.semdedup_prune(spark, sf_dir, nlist=nlist).collect()
        by_id = {r["vec_id"]: r for r in rows}
        planted = [r for r in rows if r["vec_id"] >= 100000]
        assert len(planted) == SIM.SEMDEDUP_PLANTED
        for r in planted:
            assert r["pruned"] == 1, (nlist, r)
            assert r["cell"] == by_id[r["vec_id"] - 100000]["cell"]
        sizes = {}
        for r in rows:
            sizes[r["cell"]] = sizes.get(r["cell"], 0) + 1
        assert len(sizes) <= nlist
        work[nlist] = sum(c * (c - 1) // 2 for c in sizes.values())
    assert work[32] <= work[8], work


def test_ivf_ann_reported_sims_exact_across_nlist(spark, sf_dir):
    """At every nlist, ivf_ann's reported sims must equal the exact
    cosine for those pairs (probing changes WHICH candidates are seen,
    never the correctness of their scores), with <= topk rows/query."""
    from f1_data_engineering_spark.functions.vectors import dot, l2_norm
    from f1_data_engineering_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", l2_norm("embedding").alias("enorm")
    )
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("enorm").alias("qnorm"),
    )
    denom = F.col("qnorm") * F.col("enorm")
    sim = F.when(denom > 0, dot("qvec", "embedding") / denom)
    exact = {
        (r["query_id"], r["vec_id"]): r["s"]
        for r in e.join(F.broadcast(q))
        .select("query_id", "vec_id", F.round(sim, 6).alias("s"))
        .collect()
    }
    for nlist in (8, 32):
        got = SIM.ivf_ann(spark, sf_dir, nlist=nlist).collect()
        per_q = {}
        for r in got:
            per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
            assert exact[(r["query_id"], r["neighbor_id"])] == r["sim"], (nlist, r)
        assert per_q and max(per_q.values()) <= SIM.IVF_TOPK
