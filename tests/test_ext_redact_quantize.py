"""PII redaction + embedding quantization tests ([EXT])."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import quantize, redact
from dbt_databricks_metrics_spark.ext.dedup import cosine_similarity
from dbt_databricks_metrics_spark.sources import load_table

from .conftest import assert_df_matches_oracle


def test_redaction_patterns(spark):
    rows = [
        (1, "mail me at alice.smith+x@example.co.uk today"),
        (2, "see https://example.com/a?b=1 and http://x.io"),
        (3, "server at 192.168.0.1 port"),
        (4, "call +1 (555) 123-4567 now"),
        (5, "card 4111111111111111 leaked"),
        (6, "clean text with nothing"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact.redact_documents(df).collect()}
    assert "<EMAIL>" in out[1]["text"] and "@" not in out[1]["text"]
    assert out[2]["text"].count("<URL>") == 2
    assert "<IP>" in out[3]["text"]
    assert "<PHONE>" in out[4]["text"]
    assert "<NUM>" in out[5]["text"]
    assert out[6]["text"] == "clean text with nothing"
    assert out[1]["n_email"] == 1 and out[2]["n_url"] == 2 and out[5]["n_digits"] == 1


def test_redaction_vs_oracle(spark, sf_dir, duck):
    """Same regexes in DuckDB (RE2) must agree with Spark (Java) on the
    fixture corpus — the patterns are written dialect-neutral."""
    docs = load_table(spark, sf_dir, "documents")
    df = redact.redact_documents(docs).select("doc_id", "text", "n_email", "n_url")
    pats = dict((n, p) for n, p, _t in redact.PII_PATTERNS)
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text, '{pats["url"]}', '<URL>', 'g'),
                     '{pats["email"]}', '<EMAIL>', 'g'),
                   '{pats["ipv4"]}', '<IP>', 'g'),
                 '{pats["phone"]}', '<PHONE>', 'g'),
               '{pats["digits"]}', '<NUM>', 'g') AS text,
               CAST(len(regexp_extract_all(text, '{pats["email"]}')) AS INT) AS n_email,
               CAST(len(regexp_extract_all(text, '{pats["url"]}')) AS INT) AS n_url
        FROM documents
        """,
    )


def test_l2_normalize(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    normed = emb.select(
        quantize.l2_norm(quantize.l2_normalize(F.col("embedding").cast("array<double>"))).alias("n")
    )
    for r in normed.collect():
        assert math.isclose(r["n"], 1.0, rel_tol=1e-9)


def test_quantize_roundtrip_cosine(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    q = quantize.quantize_embeddings(emb)
    rt = q.select(
        cosine_similarity(
            F.col("embedding").cast("array<double>"),
            quantize.dequantize(F.col("embedding_q8")),
        ).alias("cos")
    )
    for r in rt.collect():
        assert r["cos"] >= 0.999, r


def test_quantized_values_are_int8(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(10)
    q = quantize.quantize_embeddings(emb).select("embedding_q8")
    assert "array<tinyint>" in dict(q.selectExpr("embedding_q8.values as v").dtypes)["v"]
    vals = q.selectExpr("embedding_q8.values as v").collect()
    flat = [x for r in vals for x in r["v"]]
    assert all(-127 <= x <= 127 for x in flat)
    assert max(abs(x) for x in flat) == 127  # scale uses the full range


def test_zero_vector_quantize_and_cosine(spark):
    """Degenerate (zero) vectors must not raise under ANSI mode: quantize
    round-trips to zeros, cosine is NULL."""
    z = spark.createDataFrame(
        [(1, [0.0] * 8), (2, [1.0, -2.0, 3.0, 0.5, 0.1, -0.7, 2.5, 1.1])],
        "vec_id long, embedding array<double>",
    )
    q = quantize.quantize_embeddings(z)
    rows = {r["vec_id"]: r["embedding_q8"] for r in q.collect()}
    assert rows[1]["scale"] == 0.0 and all(v == 0 for v in rows[1]["values"])
    assert rows[2]["scale"] > 0

    rt = q.select(
        "vec_id",
        quantize.dequantize(F.col("embedding_q8")).alias("back"),
        cosine_similarity(
            F.col("embedding"), quantize.dequantize(F.col("embedding_q8"))
        ).alias("cos"),
    ).collect()
    by = {r["vec_id"]: r for r in rt}
    assert by[1]["back"] == [0.0] * 8
    assert by[1]["cos"] is None  # zero-norm → NULL, not an error
    assert by[2]["cos"] >= 0.999


def test_nonfinite_components_quantize_to_null(spark):
    """NaN/Inf/NULL components: NULL quantized values (never fabricated
    zeros, never a CAST_OVERFLOW job abort)."""
    rows = [
        (1, [float("nan"), 1.0]),
        (2, [float("inf"), 1.0]),
        (3, [None, 2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["embedding_q8"] for r in quantize.quantize_embeddings(df).collect()}
    assert out[1]["values"][0] is None  # NaN → NULL
    assert out[2]["values"][0] is None  # inf/inf → NULL
    assert out[3]["values"][0] is None  # NULL stays NULL (not 0)
    assert out[3]["values"][1] is not None  # finite component survives


def test_quantize_with_normalization(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    q = quantize.quantize_embeddings(emb, normalize=True)
    back = q.select(quantize.l2_norm(quantize.dequantize(F.col("embedding_q8"))).alias("n"))
    for r in back.collect():
        assert abs(r["n"] - 1.0) < 0.02  # unit length within int8 error


def test_binary_quantize_known_bits(spark):
    # dim 3: bits 0 and 2 set (x >= 0 includes 0.0) -> word 0b101 = 5
    df = spark.createDataFrame([(1, [0.5, -1.0, 0.0])], "id long, v array<double>")
    (r,) = df.select(quantize.binary_quantize(F.col("v")).alias("code")).collect()
    assert r["code"] == [5]
    # dim 33 spills into a second word: component 32 -> word 1 bit 0
    vals = [-1.0] * 32 + [3.0]
    df2 = spark.createDataFrame([(1, vals)], "id long, v array<double>")
    (r2,) = df2.select(quantize.binary_quantize(F.col("v")).alias("code")).collect()
    assert r2["code"] == [0, 1]


def test_pack_sign_bits_mirrors_column_version(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").orderBy("vec_id").limit(5)
    rows = emb.select(
        "vec_id",
        "embedding",
        quantize.binary_quantize(F.col("embedding").cast("array<double>")).alias(
            "code"
        ),
    ).collect()
    for r in rows:
        assert quantize.pack_sign_bits(list(r["embedding"])) == list(r["code"])


def test_hamming_distance_properties(spark):
    df = spark.createDataFrame(
        [(1, [5, 0], [5, 0]), (2, [5, 0], [6, 1]), (3, [0, 0], [2**31 - 1, 0])],
        "id long, a array<long>, b array<long>",
    )
    got = {
        r["id"]: r["h"]
        for r in df.select(
            "id", quantize.hamming_distance(F.col("a"), F.col("b")).alias("h")
        ).collect()
    }
    assert got[1] == 0  # identical codes
    assert got[2] == 3  # 5^6 = 0b011 (2 bits) + 0^1 (1 bit)
    assert got[3] == 31  # popcount of 31 set bits


def test_binary_quantize_empty_and_nan(spark):
    # review fixes: empty vector packs to [], and NaN packs as bit 1 in
    # BOTH the Column version and the driver-side mirror
    df = spark.createDataFrame(
        [(1, []), (2, [float("nan"), -1.0])], "id long, v array<double>"
    )
    got = {
        r["id"]: r["code"]
        for r in df.select(
            "id", quantize.binary_quantize(F.col("v")).alias("code")
        ).collect()
    }
    assert got[1] == []
    assert got[2] == [1]  # NaN -> bit 0 set, -1.0 -> bit 1 clear
    assert quantize.pack_sign_bits([]) == []
    assert quantize.pack_sign_bits([float("nan"), -1.0]) == [1]
