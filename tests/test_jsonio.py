"""JSONL source/sink (sources/jsonio.py)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_spark.sources.jsonio import (
    CORRUPT_COL,
    read_jsonl,
    write_jsonl,
)
from f1_data_engineering_spark.sources.registry import load_table

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def test_jsonl_roundtrip_documents(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs.repartition(4), out)
    # gzip shards, one per partition
    shards = glob.glob(os.path.join(out, "part-*.json.gz"))
    assert len(shards) == 4
    # cache: Spark refuses corrupt-column-only projections on raw scans
    back = read_jsonl(spark, out, DOC_SCHEMA).cache()
    assert back.filter(F.col(CORRUPT_COL).isNotNull()).count() == 0
    a = sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in back.collect()
    )
    b = sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in docs.collect()
    )
    assert a == b


def test_jsonl_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_jsonl(spark, str(tmp_path))


def test_jsonl_corrupt_rows_quarantined(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    df = read_jsonl(spark, str(p), "doc_id bigint, text string").cache()
    good = df.filter(F.col(CORRUPT_COL).isNull())
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert "not json" in bad.first()[CORRUPT_COL]


def test_jsonl_partitioned_write(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "by_lang")
    write_jsonl(docs, out, partition_by=("lang",))
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    dirs = {
        os.path.basename(d).split("=", 1)[1]
        for d in glob.glob(os.path.join(out, "lang=*"))
    }
    assert dirs == langs
