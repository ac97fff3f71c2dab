"""Training-data prep operators (operators/trainprep.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_spark.functions.text import token_count
from f1_data_engineering_spark.operators import trainprep as TP
from f1_data_engineering_spark.sources.registry import load_table


def test_vocab_ids_dense_and_deterministic(spark, sf_dir):
    v = TP.build_vocab(spark, sf_dir).collect()
    ids = sorted(r["token_id"] for r in v)
    assert ids == list(range(1, len(v) + 1))  # dense, 1-based
    # rank follows (occurrences DESC, term): a re-run is identical
    again = TP.build_vocab(spark, sf_dir).collect()
    assert sorted(map(tuple, v)) == sorted(map(tuple, again))
    by_id = {r["token_id"]: r for r in v}
    for i in range(2, len(v) + 1):
        prev, cur = by_id[i - 1], by_id[i]
        assert (prev["occurrences"], ) >= (cur["occurrences"], )
        if prev["occurrences"] == cur["occurrences"]:
            assert prev["term"] < cur["term"]


def test_pack_bins_respect_budget(spark, sf_dir):
    bins = TP.pack_sequences(spark, sf_dir).collect()
    assert len(bins) > 0
    for r in bins:
        # a bin only exceeds the budget via its LAST doc crossing the
        # boundary (greedy contiguous fill) or a single oversized doc;
        # it can never exceed budget + one doc's tokens
        if not r["has_oversized"]:
            assert r["n_docs"] >= 1
    # bins partition the corpus: total docs/tokens preserved
    d = load_table(spark, sf_dir, "documents")
    tot = d.select(F.sum(token_count("text")).alias("t"), F.count("*").alias("n")).first()
    assert sum(r["n_docs"] for r in bins) == tot["n"]
    assert sum(r["fill_tokens"] for r in bins) == tot["t"]


def test_splits_cover_disjointly_and_roughly_80_10_10(spark, sf_dir):
    s = TP.dataset_splits(spark, sf_dir).collect()
    per_split = {}
    for r in s:
        per_split[r["split"]] = per_split.get(r["split"], 0) + r["n_docs"]
    n = sum(per_split.values())
    assert n == load_table(spark, sf_dir, "documents").count()  # total cover
    assert set(per_split) <= {"train", "val", "test"}
    # md5 uniformity: within ±6 points of nominal
    assert abs(per_split["train"] / n - 0.80) < 0.06
    assert abs(per_split.get("val", 0) / n - 0.10) < 0.06
    assert abs(per_split.get("test", 0) / n - 0.10) < 0.06


def test_chunks_cover_tokens_with_overlap(spark, sf_dir):
    from f1_data_engineering_spark.operators.trainprep import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents,
    )

    chunks = chunk_documents(spark, sf_dir).collect()
    per_doc = {}
    for r in chunks:
        per_doc.setdefault(r["doc_id"], []).append(r)
    docs = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", token_count("text").alias("n"))
        .collect()
    }
    for doc_id, rs in per_doc.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        n = docs[doc_id]
        # indices are dense from 0
        assert [r["chunk_idx"] for r in rs] == list(range(len(rs)))
        # every chunk except the last is full-size; the last reaches
        # the tail: last start + its length == n (for multi-chunk docs)
        for r in rs[:-1]:
            assert r["n_chunk_tokens"] == CHUNK_TOKENS
        last = rs[-1]
        if len(rs) > 1:
            assert last["chunk_idx"] * CHUNK_STRIDE + last["n_chunk_tokens"] == n
        else:
            assert last["n_chunk_tokens"] == min(n, CHUNK_TOKENS)


def test_token_budget_mix_respects_budget(spark, sf_dir):
    """Kept tokens may overshoot the budget only by the last doc, and
    the kept set must be the hash-order prefix."""
    from f1_data_engineering_spark.operators import trainprep as TP

    rows = TP.token_budget_mix(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_kept"] <= r["n_docs"]
        assert r["kept_tokens"] <= r["total_tokens"]
        if r["n_kept"] < r["n_docs"]:
            # budget binding: strictly fewer tokens kept than total,
            # and the pre-last-doc cumsum was under budget
            assert r["kept_tokens"] >= TP.MIX_BUDGET  # crossed the line


def test_bpe_train_matches_python_reference(spark, sf_dir):
    """The distributed BPE loop must learn the exact merge sequence a
    sequential pure-Python BPE trainer learns from the same word
    counts (greedy max-count with (count DESC, a, b) tie-break,
    left-to-right non-overlapping application)."""
    from collections import Counter

    from f1_data_engineering_spark.operators import trainprep as TP
    from f1_data_engineering_spark.functions.text import tokens
    from f1_data_engineering_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    n_merges = 6
    got = [
        (r["rank"], r["pair"], r["merged"], r["weighted_count"])
        for r in TP.bpe_train(spark, sf_dir, n_merges=n_merges).collect()
    ]

    wc_rows = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    vocab = {tuple(r["w"]): r["c"] for r in wc_rows}

    expected = []
    for rank in range(n_merges):
        counts = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((rank, f"{a} {b}", a + b, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab

    assert got == expected, (got, expected)


def test_bpe_encode_corpus_matches_python_reference(spark, sf_dir):
    """Per-doc BPE token counts must equal sequentially encoding each
    document's words under the merges the pure-Python trainer learns —
    the end-to-end train→apply contract."""
    from collections import Counter

    from f1_data_engineering_spark.operators import trainprep as TP
    from f1_data_engineering_spark.functions.text import tokens
    from f1_data_engineering_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    got = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_bpe_tokens"], r["compression"])
        for r in TP.bpe_encode_corpus(spark, sf_dir).collect()
    }

    docs = {
        r["doc_id"]: list(r["ws"])
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("ws"))
        .collect()
    }
    # learn merges sequentially (same reference as the train test)
    vocab = Counter()
    for ws in docs.values():
        for w in ws:
            vocab[tuple(w)] += 1

    def apply_merge(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    cur = dict(vocab)
    for _ in range(TP.BPE_MERGES):
        counts = Counter()
        for syms, c in cur.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        (a, b), _n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        newv = {}
        for syms, c in cur.items():
            t = apply_merge(syms, a, b)
            newv[t] = newv.get(t, 0) + c
        cur = newv

    word_len = {"".join(syms): len(syms) for syms in cur}

    for doc_id, ws in docs.items():
        n_words = len(ws)
        n_chars = sum(len(w) for w in ws)
        n_bpe = sum(word_len[w] for w in ws)
        g = got[doc_id]
        assert g[0] == n_words and g[1] == n_chars and g[2] == n_bpe, doc_id
        if n_chars > 0:
            assert abs(g[3] - round(n_bpe / n_chars, 6)) < 1e-9
        else:
            assert g[3] is None


# ---------------------------------------------------------------------------
# training shard assignment + writer
# ---------------------------------------------------------------------------


def test_shard_manifest_invariants(spark, sf_dir):
    from f1_data_engineering_spark.operators import trainprep as TP
    from f1_data_engineering_spark.sources.registry import load_table

    rows = TP.training_shard_manifest(spark, sf_dir).collect()
    n_docs_total = load_table(spark, sf_dir, "documents").count()
    assert [r["shard"] for r in rows] == sorted(r["shard"] for r in rows)
    assert set(r["shard"] for r in rows) <= set(range(TP.N_SHARDS))
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    assert all(r["total_tokens"] > 0 for r in rows)
    # md5 balance: no shard more than 3x the mean (loose, deterministic)
    mean = n_docs_total / TP.N_SHARDS
    assert all(r["n_docs"] < 3 * mean for r in rows)
    # deterministic re-run
    again = TP.training_shard_manifest(spark, sf_dir).collect()
    assert rows == again


def test_write_training_shards_layout_and_manifest(spark, sf_dir, tmp_path):
    import os
    import re

    from f1_data_engineering_spark.operators import trainprep as TP

    out = str(tmp_path / "shards")
    written_manifest = sorted(
        tuple(r) for r in TP.write_training_shards(spark, sf_dir, out).collect()
    )
    query_manifest = sorted(
        tuple(r) for r in TP.training_shard_manifest(spark, sf_dir).collect()
    )
    # the files on disk certify exactly what the pure query promises
    assert written_manifest == query_manifest
    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert all(re.fullmatch(r"shard=\d+", d) for d in shard_dirs)
    assert len(shard_dirs) == len(written_manifest)
    # every doc landed in the shard its hash names, ordered by doc_id
    for d in shard_dirs:
        k = int(d.split("=")[1])
        pdf = (
            spark.read.parquet(os.path.join(out, d))
            .select("doc_id")
            .toPandas()
        )
        ids = pdf["doc_id"].tolist()
        assert ids == sorted(ids)
        got = spark.createDataFrame(
            [(int(i),) for i in ids], "doc_id long"
        ).select(TP._shard_col()).distinct().collect()
        assert [r["shard"] for r in got] == [k]


def test_epoch_shuffle_plan_invariants(spark, sf_dir):
    """Seeded permutation properties: positions are a dense 0..n-1
    sequence per shard; the same epoch is bit-reproducible; a
    different epoch seed yields a genuinely different order; shards
    are hash-balanced."""
    import f1_data_engineering_spark.operators.trainprep as TP

    a = TP.epoch_shuffle_plan(spark, sf_dir).collect()
    b = TP.epoch_shuffle_plan(spark, sf_dir).collect()
    assert a == b  # reproducible

    by_shard: dict = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["position"])
    for shard, pos in by_shard.items():
        assert pos == list(range(len(pos)))  # dense per-shard order
    sizes = [len(p) for p in by_shard.values()]
    n = sum(sizes)
    assert max(sizes) <= 3 * n // TP.N_SHARDS  # no degenerate skew

    # different epoch = different permutation (flip the seed in place)
    old = TP.SHUFFLE_EPOCH
    try:
        TP.SHUFFLE_EPOCH = old + 1
        c = TP.epoch_shuffle_plan(spark, sf_dir).collect()
    finally:
        TP.SHUFFLE_EPOCH = old
    assert [r["doc_id"] for r in c] != [r["doc_id"] for r in a]
