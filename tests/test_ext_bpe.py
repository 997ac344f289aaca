"""BPE tokenizer induction (ext/bpe.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext.bpe import (
    bpe_segment,
    bpe_train,
    word_freqs,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_classic_sennrich_example(spark):
    # the canonical toy corpus: merges must come out l+o, lo+w, low+</w>
    tiny = spark.createDataFrame(
        [(1, "low low low lower lowest")], ["doc_id", "text"]
    )
    m = [(r["left"], r["right"]) for r in bpe_train(tiny, 3).orderBy("rank").collect()]
    assert m == [("l", "o"), ("lo", "w"), ("low", "</w>")]


def test_merges_are_ranked_by_frequency_then_lex(spark, docs):
    rows = bpe_train(docs, 6).orderBy("rank").collect()
    assert len(rows) == 6
    freqs = [r["pair_freq"] for r in rows]
    # a later merge can exceed an earlier one only if it was CREATED by
    # it; the first two ranks must be non-increasing over raw chars
    assert freqs[0] >= freqs[1] or rows[1]["left"] in (
        rows[0]["merged"],
    ) or rows[1]["right"] in (rows[0]["merged"],)
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)


def test_run_merging_matches_greedy(spark):
    # 'x x x x' with merge (x,x): greedy -> xx xx (two pieces)
    df = spark.createDataFrame([(1, "xxxx xxxx")], ["doc_id", "text"])
    m = bpe_train(df, 1)
    r = m.first()
    assert (r["left"], r["right"]) == ("x", "x")
    seg = bpe_segment(df, m).first()
    assert seg["pieces"] == ["xx", "xx", "</w>", "xx", "xx", "</w>"]


def test_segment_preserves_word_order_and_roundtrips(spark, docs):
    m = bpe_train(docs, 8)
    seg = bpe_segment(docs.limit(20), m)
    rows = seg.collect()
    assert all(r["n_pieces"] == len(r["pieces"]) for r in rows)
    # stripping </w> and concatenating pieces reproduces the normalized text
    one = docs.orderBy("doc_id").first()
    pieces = seg.filter(F.col("doc_id") == one["doc_id"]).first()["pieces"]
    rebuilt = "".join(p for p in pieces).replace("</w>", " ").strip()
    norm = " ".join(one["text"].lower().split())
    assert rebuilt == norm


def test_more_merges_never_increase_piece_count(spark, docs):
    d = docs.limit(50)
    m4 = bpe_train(docs, 4)
    m12 = bpe_train(docs, 12)
    n4 = bpe_segment(d, m4).agg(F.sum("n_pieces")).first()[0]
    n12 = bpe_segment(d, m12).agg(F.sum("n_pieces")).first()[0]
    assert n12 <= n4


def test_early_stop_when_no_pair_repeats(spark):
    df = spark.createDataFrame([(1, "ab cd")], ["doc_id", "text"])
    # every adjacent pair occurs once -> nothing merges
    assert bpe_train(df, 5).count() == 0


def test_word_freqs_and_validation(spark, docs):
    wf = word_freqs(docs)
    assert wf.filter("word = ''").count() == 0
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(docs, 0)
