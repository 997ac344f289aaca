"""Property tests for the SQL front-end's CTE splitter (r8): the
literal-aware top-level split must reconstruct exactly the bodies it was
given for ANY composition of names and bodies — including parens and
quotes inside string literals — and never mis-split or hang."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_databricks_metrics_spark.sql_frontend import (
    MeasureSQLError,
    _parse_ctes,
)

_NAME = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s.lower() not in ("as", "with", "select")
)

# body fragments: identifiers, balanced parens, and literals that may
# contain unbalanced parens and doubled quotes. `-` is deliberately
# absent from the free-text class (VERDICT r8 #2): a fragment ending in
# a bare `--` turns the CTE's closing paren into a line comment, which
# is GENUINELY unbalanced SQL — the splitter's MeasureSQLError is the
# correct behavior, so the round-trip premise doesn't hold for it.
# Comment coverage lives in the curated, newline-terminated fragments.
_FRAGMENT = st.one_of(
    st.from_regex(r"[A-Za-z0-9_ ,.*=<>+]{1,12}", fullmatch=True),
    st.sampled_from(["(1 + 2)", "f(x, y)", "( SELECT 1 )"]),
    st.sampled_from(["'('", "')'", "'))( '", "'it''s'", "'x)'", "'(('"]),
    # r8 review: parens hidden in double-quoted strings, backtick
    # identifiers, line comments (newline-terminated inside the body),
    # and block comments must not mis-split
    st.sampled_from([
        '")"', '"(("', '"a"")("', "`w)col`", "`(ident`",
        "-- c )\n1", "/* ) */ 1", "/* (( */ 2",
    ]),
)


@st.composite
def _bodies(draw):
    parts = draw(st.lists(_FRAGMENT, min_size=1, max_size=6))
    body = " ".join(parts).strip()
    # the splitter strips the body, and a trailing/leading quote char is
    # fine — but an EMPTY body can't round-trip
    return body if body else "1"


@settings(max_examples=300, deadline=None)
@given(
    names=st.lists(_NAME, min_size=1, max_size=4, unique_by=str.lower),
    bodies_seed=st.data(),
)
def test_split_round_trips(names, bodies_seed):
    bodies = [bodies_seed.draw(_bodies()) for _ in names]
    final = "SELECT 1 AS x"
    text = (
        "WITH "
        + ", ".join(f"{n} AS ({b})" for n, b in zip(names, bodies))
        + " " + final
    )
    ctes, got_final = _parse_ctes(text)
    assert got_final == final
    assert [n for n, _ in ctes] == names
    for (n, got_b), b in zip(ctes, bodies):
        assert got_b == b.strip(), (got_b, b)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="()'abc ,SELECTWITHas", min_size=0, max_size=80))
def test_split_never_hangs_or_crashes_unexpectedly(s):
    """Any input either parses, raises MeasureSQLError, or is returned
    as a no-WITH passthrough — no other exception, no hang."""
    try:
        ctes, final = _parse_ctes(s)
    except MeasureSQLError:
        return
    if not re.match(r"\s*with\b", s, re.IGNORECASE):
        assert ctes == [] and final == s.strip()


def test_split_examples():
    ctes, final = _parse_ctes(
        "WITH a AS (SELECT 'x)' AS c), b AS (SELECT '(' AS d) SELECT 1"
    )
    assert ctes == [("a", "SELECT 'x)' AS c"), ("b", "SELECT '('  AS d".replace("  ", " "))]
    assert final == "SELECT 1"
    with pytest.raises(MeasureSQLError, match="unbalanced"):
        _parse_ctes("WITH a AS (SELECT (1 FROM t SELECT 2")
    with pytest.raises(MeasureSQLError, match="expected"):
        _parse_ctes("WITH a (x) AS (SELECT 1) SELECT x FROM a")


def test_trailing_line_comment_swallows_closing_paren():
    """The r8 post-ship hypothesis counterexample, pinned explicitly so it
    reproduces on every host without a shared example database (VERDICT
    r8 #7): a body whose trailing ``--`` comments out the closing paren
    is GENUINELY unbalanced SQL — the splitter must refuse, and the old
    fuzz generator was wrong to expect a round-trip."""
    with pytest.raises(MeasureSQLError, match="unbalanced"):
        _parse_ctes("WITH C AS (0 0 --) SELECT 1")
    # newline-terminated comments round-trip fine (the curated fragment)
    ctes, final = _parse_ctes("WITH C AS (SELECT 1 -- c )\n) SELECT 1")
    assert ctes == [("C", "SELECT 1 -- c )")] and final == "SELECT 1"
