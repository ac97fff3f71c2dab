"""Planted-corpus tests for the round-3 curation operators:
segment_dedup_clean (C4/CCNet segment-removal transform),
gopher_rules (Rae et al. rule census), dsir_importance_weights
(hashed n-gram importance weighting).  The DuckDB differential gate
pins parity; these pin the SEMANTICS on corpora with known answers.
"""

from __future__ import annotations

import hashlib

from f1_data_engineering_spark.operators import dedup as DD
from f1_data_engineering_spark.operators import textops as TX
from f1_data_engineering_spark.operators import trainprep as TP


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang, source)."""
    df = spark.createDataFrame(
        [(d, t, lg, s, len(t) if t is not None else 0) for d, t, lg, s in rows],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_segment_dedup_clean_planted(spark, tmp_path):
    """Known dedup outcome: doc 2 is a verbatim copy of doc 1 (loses
    its only segment); doc 3's SECOND segment repeats doc 1's text
    (only that segment removed, first 32 tokens survive)."""
    S = DD.SEGMENT_TOKENS
    short = "alpha beta gamma delta epsilon"
    uniq = " ".join(f"u{j}" for j in range(S))  # exactly one full segment
    rows = [
        (1, short, "en", "A"),
        (2, short, "en", "A"),
        (3, f"{uniq} {short}", "en", "A"),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in DD.segment_dedup_clean(spark, str(tmp_path)).collect()}

    assert out[1]["n_segments"] == 1 and out[1]["n_kept"] == 1
    assert out[1]["cleaned_md5"] == hashlib.md5(short.encode()).hexdigest()
    # doc 2: whole text was a repeat -> nothing survives
    assert out[2]["n_segments"] == 1 and out[2]["n_kept"] == 0
    assert out[2]["cleaned_chars"] == 0
    assert out[2]["cleaned_md5"] == hashlib.md5(b"").hexdigest()
    # doc 3: segment 0 (the unique 32 tokens) survives, segment 1 (the
    # short repeat) is removed
    assert out[3]["n_segments"] == 2 and out[3]["n_kept"] == 1
    assert out[3]["cleaned_md5"] == hashlib.md5(uniq.encode()).hexdigest()
    assert out[3]["cleaned_chars"] == len(uniq)


def test_gopher_rules_planted(spark, tmp_path):
    """One doc per failure mode, one passing everything; counts are
    exact."""
    stopfill = "the and of to in is that it for with"  # 10 stop tokens
    body = " ".join(f"w{j}" for j in range(45))
    rows = [
        # passes all: 55 tokens, stopwords present, mean wlen ~2.9?  w0..w44
        # are 2-3 chars, stop tokens 2-4 -> mean in [3,10] needs checking:
        # use longer filler words to keep mean wlen >= 3
        (1, " ".join(f"word{j:02d}" for j in range(45)) + " " + stopfill, "en", "A"),
        # fails wordcount (5 tokens)
        (2, "tiny doc with the and", "en", "A"),
        # fails repetition: 'dup' is 30 of 60 tokens (> 20%)
        (3, " ".join(["dup"] * 30) + " " + " ".join(f"x{j}len" for j in range(20))
            + " " + stopfill, "en", "A"),
        # fails stopword rule: 60 unique non-stop tokens
        (4, " ".join(f"y{j}word" for j in range(60)), "en", "A"),
        # NULL text: 0 tokens fails wordcount but must COUNT toward
        # n_pass_symbol (0 symbols <= 0.1*0) exactly like the SQL twin's
        # COALESCE(text, '') — pins the NULL-safe regexp_count
        (5, None, "en", "A"),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in TX.gopher_rules(spark, str(tmp_path)).collect()}
    a = out["A"]
    assert a["n_docs"] == 5
    assert a["n_pass_wordcount"] == 3  # docs 2, 5 fail
    assert a["n_pass_stop"] == 3  # docs 4, 5 fail
    assert a["n_pass_repetition"] == 3  # docs 3, 5 fail
    assert a["n_pass_symbol"] == 5  # no '#'/'...' anywhere, NULL counts
    assert a["n_pass_all"] == 1  # only doc 1
    assert abs(a["pct_pass_all"] - 0.20) < 1e-9


def test_dsir_weights_directional(spark, tmp_path):
    """Docs built from the target (en) vocabulary must outrank docs
    built from the out-of-target vocabulary."""
    xvocab = [f"tgt{j}" for j in range(20)]
    yvocab = [f"oth{j}" for j in range(20)]
    rows = []
    for i in range(8):
        rows.append((i, " ".join(xvocab), "en", "A"))
    for i in range(8, 16):
        rows.append((i, " ".join(yvocab), "zh", "A"))
    _write_docs(spark, tmp_path, rows)
    out = TP.dsir_importance_weights(spark, str(tmp_path)).collect()
    w = {r["doc_id"]: r["dsir_weight"] for r in out}
    assert len(w) == 16
    assert min(w[i] for i in range(8)) > max(w[i] for i in range(8, 16))
    # weights are per-gram means: identical docs score identically
    assert len({w[i] for i in range(8)}) == 1


def test_curation_ops_plan_quality(spark, sf_dir):
    """Plan shapes for the round-3 curation ops: DSIR's scoring join
    broadcasts the bucket LM (feature-space-sized), and neither the
    segment-removal transform nor the Gopher census plans a
    CartesianProduct anywhere."""
    from f1_data_engineering_spark.plans import assert_broadcast_join, physical_plan

    dsir = TP.dsir_importance_weights(spark, sf_dir)
    assert "CartesianProduct" not in physical_plan(dsir, "simple")
    assert_broadcast_join(dsir, at_least=1)  # bucket lnw table

    clean = DD.segment_dedup_clean(spark, sf_dir)
    assert "CartesianProduct" not in physical_plan(clean, "simple")

    rules = TX.gopher_rules(spark, sf_dir)
    assert "CartesianProduct" not in physical_plan(rules, "simple")
