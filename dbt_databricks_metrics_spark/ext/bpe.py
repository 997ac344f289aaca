"""Distributed BPE tokenizer induction ([EXT]) — byte-pair-encoding
merge learning (Sennrich et al. 2016, public) as DataFrame rounds.

The classic scalability move: BPE never trains on the corpus — it
trains on the **word-frequency table** (vocabulary-sized, shrinking
Zipf-fast), which one corpus pass produces. Every merge round is then a
pair-count aggregate + a symbol rewrite over that small table, so the
loop's cost is independent of corpus size.

Symbol state is a spaced string (``" h e l l o </w> "``); applying a
merge (a, b) is ``replace(" a b ", " ab ")`` run twice — the first pass
merges every other occurrence of a run (non-overlapping left-to-right
scan), which isolates the survivors for the second pass, reproducing
greedy BPE exactly. ``replace`` has identical semantics in Spark and
DuckDB, which is what makes the whole training loop unrollable as the
contract oracle's SQL.

Determinism: the best pair each round is (max count, then lexicographic
(left, right)) — a TakeOrderedAndProject, no global sort; ties resolve
identically in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm import _token_col

END_OF_WORD = "</w>"


def word_freqs(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the normalized whitespace tokens — the
    vocabulary-sized table every BPE round runs against."""
    return (
        docs.select(F.explode(_token_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _symbolized(word: Column) -> Column:
    """``"hey"`` -> ``" h e y </w> "`` (spaced symbols, sentinel spaces
    at both ends so every pair occurrence looks like ``" a b "``)."""
    chars = F.regexp_replace(word, "(.)", "$1 ")
    return F.concat(F.lit(" "), chars, F.lit(END_OF_WORD), F.lit(" "))


def _pair_counts(wf: DataFrame) -> DataFrame:
    """(left, right, cnt): adjacent symbol pairs weighted by word freq."""
    syms = F.split(F.trim(F.col("sym")), " ")
    pairs = wf.select(
        "freq",
        F.explode(
            F.when(
                F.size(syms) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(syms) - F.lit(1)),
                    lambda i: F.struct(
                        F.element_at(syms, i.cast("int")).alias("left"),
                        F.element_at(syms, (i + F.lit(1)).cast("int")).alias(
                            "right"
                        ),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right")).agg(
        F.sum("freq").alias("cnt")
    )


def _apply_merge(sym: Column, left: str, right: str) -> Column:
    pat = F.lit(f" {left} {right} ")
    rep = F.lit(f" {left}{right} ")
    # twice: pass 1 merges alternating occurrences of runs, pass 2 the
    # now-isolated survivors — exactly greedy left-to-right BPE
    return F.replace(F.replace(sym, pat, rep), pat, rep)


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> DataFrame:
    """Learn *n_merges* BPE merges; returns (rank, left, right, merged,
    pair_freq) in learned order. Stops early when no pair repeats."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    spark = docs.sparkSession
    wf = (
        word_freqs(docs, text_col)
        .select(_symbolized(F.col("word")).alias("sym"), "freq")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple] = []
    for rank in range(n_merges):
        best = (
            _pair_counts(wf)
            .orderBy(F.desc("cnt"), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < 2:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], best[0]["cnt"]
        merges.append((rank, left, right, left + right, cnt))
        wf = wf.select(
            _apply_merge(F.col("sym"), left, right).alias("sym"), "freq"
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank INT, left STRING, right STRING, merged STRING, pair_freq BIGINT"
    )


def bpe_segment(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with learned merges: (id, pieces array, n_pieces).
    Merges apply in rank order — the same replace-twice rewrite, chained
    as one column expression (codegen; map-only, no shuffle)."""
    ordered = [
        (r["left"], r["right"]) for r in merges.orderBy("rank").collect()
    ]
    words = docs.select(
        F.col(id_col),
        F.posexplode(_token_col(text_col)).alias("pos", "word"),
    )
    sym = _symbolized(F.col("word"))
    for left, right in ordered:
        sym = _apply_merge(sym, left, right)
    per_word = words.select(
        id_col, "pos", F.split(F.trim(sym), " ").alias("pieces")
    )
    # array_sort on (pos, pieces) structs restores document word order
    # regardless of collect_list's arrival order
    return per_word.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("pieces")))
                ),
                lambda s: s["pieces"],
            )
        ).alias("pieces"),
        F.sum(F.size("pieces")).cast("long").alias("n_pieces"),
    )
