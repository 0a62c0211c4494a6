"""Text-op unit tests: PII scrubbing (the synthetic corpus contains no
PII-shaped strings, so these semantics are pinned here rather than by a
degenerate all-zeros oracle) and quality filter-chain flag logic."""

from __future__ import annotations

from lol_data_collection_system_spark.operators.text import (
    quality_filter_flags,
    scrub_patterns,
)


def _one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return scrub_patterns(df, **kw).collect()[0]


def test_scrub_email_phone_ip(spark):
    r = _one(
        spark,
        "mail a@b.com or c.d+x@e.org, call +1 (555) 123-4567, host 10.0.0.1",
    )
    assert r.n_email == 2 and r.n_phone == 1 and r.n_ipv4 == 1
    s = r.text_scrubbed
    assert "<email>" in s and "<phone>" in s and "<ipv4>" in s
    assert "a@b.com" not in s and "555" not in s and "10.0.0.1" not in s


def test_scrub_counts_on_original_text(spark):
    # the email's digits must not be double-counted by the phone rule,
    # and replacement tokens must not feed later patterns
    r = _one(spark, "reach 12345678901@example.com")
    assert r.n_email == 1
    assert r.text_scrubbed == "reach <email>"


def test_scrub_clean_text_untouched(spark):
    r = _one(spark, "plain text with no identifiers")
    assert (r.n_email, r.n_phone, r.n_ipv4) == (0, 0, 0)
    assert r.text_scrubbed == "plain text with no identifiers"


def test_scrub_custom_patterns(spark):
    r = _one(
        spark,
        "id ABC-1234 and ABC-9999",
        patterns={"ticket": r"ABC-\d{4}"},
        token="[{name}]",
    )
    assert r.n_ticket == 2
    assert r.text_scrubbed == "id [ticket] and [ticket]"


def test_quality_flags_fire_independently(spark):
    rows = [
        (1, "the " * 60),                       # repetitive: distinct ratio ~0
        (2, "a b c"),                           # too short
        (3, " ".join(f"w{i}" for i in range(60))),  # no stopwords
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in quality_filter_flags(
            df, min_tokens=50, min_distinct_ratio=0.3, min_stopword_ratio=0.02
        ).collect()
    }
    assert out[1].pass_length and not out[1].pass_repetition
    assert not out[2].pass_length
    assert out[3].pass_length and out[3].pass_repetition
    assert not out[3].pass_stopwords
    assert not any(out[i].keep for i in (1, 2, 3))
