"""Feature-hashed TF-IDF document vectors (ext/vectors.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext.vectors import hashed_doc_vectors


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_shape_norm_and_coverage(spark, docs):
    v = hashed_doc_vectors(docs, dim=32)
    rows = v.collect()
    assert len(rows) == docs.count()  # every doc gets a vector
    assert all(len(r["vector"]) == 32 for r in rows)
    for r in rows[:20]:
        n = math.sqrt(sum(x * x for x in r["vector"]))
        assert n == pytest.approx(1.0, rel=1e-9)


def test_null_and_empty_text_get_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["vector"] for r in hashed_doc_vectors(df, dim=8).collect()}
    assert set(got) == {1, 2, 3}
    assert got[2] == [0.0] * 8 and got[3] == [0.0] * 8
    assert any(x != 0 for x in got[1])


def test_idf_downweights_ubiquitous_tokens(spark):
    # 'the' in every doc, 'rare' in one — with IDF the rare doc's mass
    # concentrates on rare's bucket relative to plain TF
    df = spark.createDataFrame(
        [(i, "the common words here") for i in range(9)] + [(9, "the rare")],
        ["doc_id", "text"],
    )
    with_idf = {r["doc_id"]: r["vector"]
                for r in hashed_doc_vectors(df, dim=16, idf=True,
                                            normalize=False).collect()}
    no_idf = {r["doc_id"]: r["vector"]
              for r in hashed_doc_vectors(df, dim=16, idf=False,
                                          normalize=False).collect()}
    # weights differ only by the IDF factor; 'the' has df=10 (min idf)
    assert sum(with_idf[9]) < sum(no_idf[9]) * 2  # sanity: same scale
    assert with_idf[9] != no_idf[9]


def test_partitioning_invariance(spark, docs):
    a = {r["doc_id"]: r["vector"]
         for r in hashed_doc_vectors(docs, dim=16).collect()}
    b = {r["doc_id"]: r["vector"]
         for r in hashed_doc_vectors(docs.repartition(7), dim=16).collect()}
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-9)


def test_md5_mode_matches_duckdb(spark, docs, duck):
    got = {
        (r["doc_id"], i): x
        for r in hashed_doc_vectors(docs, dim=16, hash_fn="md5").collect()
        for i, x in enumerate(r["vector"])
    }
    exp = duck.execute(r"""
        WITH tokd AS (
          SELECT doc_id,
                 list_filter(string_split(regexp_replace(lower(trim(coalesce(text, ''))),
                                                         '\s+', ' ', 'g'), ' '),
                             x -> length(x) > 0) AS toks
          FROM documents
        ),
        tk AS (SELECT doc_id, unnest(toks) AS tok FROM tokd),
        tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
        dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        w AS (
          SELECT doc_id, tok,
                 tf * (ln((nd.n + 1.0) / (df + 1.0)) + 1.0) AS w
          FROM tf JOIN dfreq USING (tok) CROSS JOIN nd
        ),
        bk AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % 16 AS INT) AS b,
                 sum(w) AS v
          FROM w GROUP BY 1, 2
        ),
        dense AS (
          SELECT d.doc_id, gs.i AS i, coalesce(bk.v, 0.0) AS x
          FROM (SELECT DISTINCT doc_id FROM documents) d
          CROSS JOIN generate_series(0, 15) AS gs(i)
          LEFT JOIN bk ON bk.doc_id = d.doc_id AND bk.b = gs.i
        ),
        nrm AS (SELECT doc_id, sqrt(sum(x * x)) AS nn FROM dense GROUP BY 1)
        SELECT dense.doc_id, i,
               CASE WHEN nn > 0 THEN x / nn ELSE x END AS val
        FROM dense JOIN nrm USING (doc_id)
    """).fetchall()
    assert len(exp) == len(got)
    for doc_id, i, val in exp:
        assert got[(doc_id, i)] == pytest.approx(val, abs=1e-9)


def test_validation(spark, docs):
    with pytest.raises(ValueError, match="dim"):
        hashed_doc_vectors(docs, dim=0)
    with pytest.raises(ValueError, match="hash_fn"):
        hashed_doc_vectors(docs, hash_fn="crc").collect()
