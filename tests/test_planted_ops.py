"""Planted-fixture semantics tests for the substring-span dedup and PII
scrub operators: tiny synthetic documents tables with KNOWN duplicate
spans / PII payloads, so the expected output is derivable by hand (the
parity suite checks engine agreement on the real fixtures; this checks
the semantics are the intended ones, not just mutually consistent).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_etl_spark.registry import QUERIES, load_all_operators

load_all_operators()


def _write_documents(spark, path, rows):
    spark.createDataFrame(
        [(int(i), t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _toks(prefix, n):
    return [f"{prefix}{i}" for i in range(n)]


def test_substring_spans_planted(spark, tmp_path):
    """Two docs share one exact 20-token span; a third is all-unique.

    k=8 grams fully inside the span start at positions 5..17 (13
    consecutive hits -> one island), span_len = 17 - 5 + 8 = 20.
    """
    shared = _toks("s", 20)
    d0 = _toks("x", 5) + shared + _toks("y", 5)  # span at tokens 5..24 of 30
    d1 = _toks("p", 5) + shared + _toks("q", 5)
    d2 = _toks("u", 30)
    sf = str(tmp_path / "planted")
    _write_documents(
        spark, sf, [(0, " ".join(d0)), (1, " ".join(d1)), (2, " ".join(d2))]
    )
    out = {
        r["doc_id"]: r
        for r in QUERIES["q_dedup_substring"](spark, sf).collect()
    }
    assert set(out) == {0, 1}  # the unique doc never appears
    for i in (0, 1):
        assert out[i]["n_spans"] == 1
        assert out[i]["max_span"] == 20
        assert out[i]["dup_frac"] == round(20 / 30, 6)


def test_substring_two_disjoint_spans(spark, tmp_path):
    """Spans separated by >= k unique tokens stay separate islands."""
    s1, s2 = _toks("a", 10), _toks("b", 10)
    gap = _toks("g", 12)  # > k-1 = 7 between the dup runs
    d0 = s1 + gap + s2  # 32 tokens
    d1 = s1 + _toks("h", 12) + s2
    sf = str(tmp_path / "planted2")
    _write_documents(spark, sf, [(0, " ".join(d0)), (1, " ".join(d1))])
    out = {
        r["doc_id"]: r
        for r in QUERIES["q_dedup_substring"](spark, sf).collect()
    }
    for i in (0, 1):
        assert out[i]["n_spans"] == 2
        assert out[i]["max_span"] == 10
        assert out[i]["dup_frac"] == round(20 / 32, 6)


def test_pii_redaction_planted(spark, tmp_path):
    """Mod-class seeding and in-text PII both detected and scrubbed.

    doc 6 (div by 2 and 3, not 5) seeds email+phone+ip and carries an
    extra in-text email inside the first 40 chars -> 2 emails; doc 15
    (div 3 and 5) seeds email only; doc 1 seeds ip only.
    """
    sf = str(tmp_path / "pii")
    _write_documents(
        spark,
        sf,
        [
            (6, "mail bob@example.com about the fast table scan rows"),
            (15, "plain words only here nothing sensitive at all"),
            (1, "more plain filler words for the scan test rows"),
        ],
    )
    out = {r["doc_id"]: r for r in QUERIES["q_text_pii"](spark, sf).collect()}
    assert (out[6]["n_emails"], out[6]["n_phones"], out[6]["n_ips"]) == (2, 1, 1)
    assert (out[15]["n_emails"], out[15]["n_phones"], out[15]["n_ips"]) == (1, 0, 0)
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (0, 0, 1)
    clean6 = out[6]["clean"]
    assert "<EMAIL>" in clean6 and "<PHONE>" in clean6 and "<IP>" in clean6
    assert "@" not in clean6 and "555-" not in clean6
    assert "bob" not in clean6  # the in-text address is gone too
    assert "<IP>" in out[1]["clean"] and "@" not in out[1]["clean"]
