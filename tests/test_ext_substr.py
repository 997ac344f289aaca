"""Exact duplicated-substring removal (ext/substr.py — Lee et al. 2022
ExactSubstr family): span recovery, keep-first exemption, merge of
overlapping grams, short-doc passthrough, and plan hygiene."""

from __future__ import annotations

import pytest

from dbt_databricks_metrics_spark.ext.substr import dedup_exact_substrings


def _rows(df):
    return {r["doc_id"]: r for r in df.collect()}


@pytest.fixture(scope="module")
def corpus(spark):
    boiler = "0123456789abcdef" * 2  # 32 chars, shared verbatim
    rows = [
        (1, "AAAA" + boiler + "BBBB"),          # first occurrence
        (2, "CCCC" + boiler + "DDDD"),          # later occurrence -> cut
        (3, "unique text that stays intact."),  # no dups
        (4, "tiny"),                            # shorter than min_len
        (5, boiler + boiler),                   # dup of boiler AND self-overlap
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_keep_first_cuts_later_occurrences_only(corpus):
    got = _rows(dedup_exact_substrings(corpus, min_len=32, keep="first"))
    assert got[1]["text_clean"] == got[1]["text_clean"]  # present
    assert got[1]["chars_removed"] == 0  # first occurrence survives
    assert got[1]["text_clean"].startswith("AAAA")
    assert "0123456789" in got[1]["text_clean"]
    assert "0123456789" not in got[2]["text_clean"]
    assert got[2]["text_clean"] == "CCCC" + "DDDD"
    assert got[2]["n_dup_spans"] == 1 and got[2]["chars_removed"] == 32
    assert got[3]["chars_removed"] == 0
    assert got[3]["text_clean"] == "unique text that stays intact."
    # doc 4 is shorter than min_len: passes through untouched
    assert got[4]["text_clean"] == "tiny" and got[4]["n_dup_spans"] == 0
    # doc 5 is two copies of the boiler: every gram start is duplicated
    # somewhere, the merged span covers the whole doc
    assert got[5]["text_clean"] == "" and got[5]["chars_removed"] == 64


def test_keep_none_cuts_every_occurrence(corpus):
    got = _rows(dedup_exact_substrings(corpus, min_len=32, keep="none"))
    assert got[1]["text_clean"] == "AAAA" + "BBBB"
    assert got[2]["text_clean"] == "CCCC" + "DDDD"
    assert got[5]["text_clean"] == ""


def test_span_merge_is_maximal(spark):
    # one long duplicated run -> ONE merged span, not len-k+1 spans
    long_dup = "x" * 10 + "SHARED-SEGMENT-THAT-REPEATS-VERBATIM!" * 3 + "y" * 10
    docs = spark.createDataFrame(
        [(1, long_dup), (2, "pad." + long_dup + ".pad")],
        "doc_id BIGINT, text STRING",
    )
    got = _rows(dedup_exact_substrings(docs, min_len=16, keep="first"))
    assert got[2]["n_dup_spans"] == 1
    assert got[2]["chars_removed"] == len(long_dup)
    assert got[2]["text_clean"] == "pad." + ".pad"


def test_conservation_and_lengths(corpus):
    for r in _rows(dedup_exact_substrings(corpus, min_len=32)).values():
        assert len(r["text_clean"]) == r["n_chars"] - r["chars_removed"]


def test_row_preservation(corpus):
    out = dedup_exact_substrings(corpus, min_len=32)
    assert out.count() == corpus.count()


def test_md5_mode_matches_xxhash_mode(corpus):
    a = _rows(dedup_exact_substrings(corpus, min_len=32, hash_fn="xxhash64"))
    b = _rows(dedup_exact_substrings(corpus, min_len=32, hash_fn="md5"))
    for k in a:
        assert a[k]["text_clean"] == b[k]["text_clean"]


def test_bad_args(corpus):
    with pytest.raises(ValueError, match="keep"):
        dedup_exact_substrings(corpus, keep="all")
    with pytest.raises(ValueError, match="hash_fn"):
        dedup_exact_substrings(corpus, hash_fn="sha9")


def test_plan_no_python_udf(corpus):
    plan = dedup_exact_substrings(corpus, min_len=32)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
