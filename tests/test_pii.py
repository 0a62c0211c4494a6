"""PII detection/redaction (operators/pii.py) on handwritten fixtures —
the declared queries exercise the same operators over the deterministic
doc_id-derived augmentation (plans/corpus_queries.py)."""

from __future__ import annotations

from lol_data_collection_system_spark.operators import pii


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_scan_counts_and_redaction(spark):
    df = _docs(
        spark,
        [
            (1, "a", "write to jane.doe+x@mail.example.org today"),
            (2, "a", "call (555) 123-4567 or (555) 987-6543"),
            (3, "b", "server at 10.0.255.7 and gw 192.168.1.1"),
            (4, "b", "clean text with no pii at all"),
            (5, "b", "mixed: bob@x.io from 127.0.0.1"),
        ],
    )
    out = {r["doc_id"]: r for r in pii.scan_pii(df, "doc_id", "text").collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (1, 0, 0)
    assert out[1]["redacted_text"] == "write to <EMAIL> today"
    assert out[2]["n_phone"] == 2
    assert out[2]["redacted_text"] == "call <PHONE> or <PHONE>"
    assert out[3]["n_ipv4"] == 2
    assert out[3]["redacted_text"] == "server at <IP> and gw <IP>"
    assert out[4]["n_pii"] == 0
    assert out[4]["redacted_text"] == out[4]["redacted_text"] == "clean text with no pii at all"
    assert out[5]["n_pii"] == 2
    assert out[5]["redacted_text"] == "mixed: <EMAIL> from <IP>"


def test_email_redacted_before_ip_can_bite(spark):
    # The local part "v1.2.3.4" contains an IPv4-shaped substring; rule
    # order (email first) must swallow it whole.
    df = _docs(spark, [(1, "a", "ping v1.2.3.4@host.example.com now")])
    row = pii.scan_pii(df, "doc_id", "text").collect()[0]
    assert row["n_email"] == 1
    assert row["redacted_text"] == "ping <EMAIL> now"


def test_report_by_source(spark):
    df = _docs(
        spark,
        [
            (1, "a", "a@b.co"),
            (2, "a", "no pii"),
            (3, "b", "no pii either"),
        ],
    )
    out = {r["source"]: r for r in pii.pii_report_by_source(df, "source", "text").collect()}
    assert out["a"]["n_docs"] == 2
    assert out["a"]["n_docs_with_pii"] == 1
    assert out["a"]["total_email"] == 1
    assert out["b"]["n_docs_with_pii"] == 0
