"""pii_scrub_clean (operators/curation.py): the redaction TRANSFORM's
semantics pinned directly — class tokens, replacement ordering (URL
consumes embedded emails/IPs), hit flags, and the planted-copy payload
keying that keeps near-dups near-dup after injection."""

from __future__ import annotations

from f1_data_engineering_spark.operators.curation import (
    PII_CLASSES,
    pii_scrub_clean,
)


def _scrub(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    return {r["doc_id"]: r for r in pii_scrub_clean(df).collect()}


def test_injected_url_email_redacted(spark):
    out = _scrub(spark, [(20, "a", "base")])
    t = out[20]["text"]
    assert "<URL>" in t and "<EMAIL>" in t
    assert "https://" not in t and "@test.org" not in t
    assert out[20]["pii_hit"] == 1


def test_injected_phone_ip_redacted(spark):
    out = _scrub(spark, [(15, "a", "base")])
    t = out[15]["text"]
    assert "<PHONE>" in t and "<IP>" in t
    assert "555-123-4567" not in t and "10.0." not in t
    assert out[15]["pii_hit"] == 1


def test_clean_doc_untouched(spark):
    out = _scrub(spark, [(7, "a", "no pii here 12-34")])
    assert out[7]["text"] == "no pii here 12-34"
    assert out[7]["pii_hit"] == 0


def test_organic_pii_without_injection(spark):
    """Docs outside the injection slices still get scrubbed — the
    transform is a real redactor, not an injection echo."""
    out = _scrub(spark, [
        (1, "a", "mail me at someone@example.com please"),
        (2, "a", "server 192.168.1.1 or call 555-867-5309 x"),
        (3, "a", "docs at http://site.io/a?u=bob@x.org end"),
    ])
    assert out[1]["text"] == "mail me at <EMAIL> please"
    assert out[2]["text"] == "server <IP> or call <PHONE> x"
    # URL class runs first: the email inside the URL is consumed whole
    assert out[3]["text"] == "docs at <URL> end"
    assert all(out[i]["pii_hit"] == 1 for i in (1, 2, 3))


def test_planted_copy_gets_same_payload(spark):
    """doc_id and doc_id + 1e6 receive the SAME injected suffix (the
    payload keys on doc_id % 1e6), so the planted near-dup pairs in
    the curation corpus stay near-dups after injection."""
    out = _scrub(spark, [(10, "a", "text body"), (1000010, "a", "text bo")])
    suffix = out[10]["text"].removeprefix("text body")
    assert out[1000010]["text"] == "text bo" + suffix


def test_class_tokens_are_distinct():
    toks = [tok for _, tok in PII_CLASSES]
    assert len(set(toks)) == len(toks) == 4
