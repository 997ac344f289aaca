"""Unit tests for the table-position CTE reference rewriter (r9,
ADVICE r8): rewriting happens ONLY where a MEASURE-CTE name stands as a
table reference, with the declared name re-injected as the alias unless
the user supplied one — never on coincidental identifiers, literals,
quoted identifiers, or comments. Pure string-level, no Spark session."""

from __future__ import annotations

from dbt_databricks_metrics_spark.sql_frontend import _rewrite_table_refs

A = {"rev": "_u_rev", "cust": "_u_cust"}


def test_bare_from_injects_alias():
    assert _rewrite_table_refs("SELECT x FROM rev", A) == (
        "SELECT x FROM _u_rev AS rev"
    )


def test_user_alias_kept():
    assert _rewrite_table_refs("SELECT r.x FROM rev r", A) == (
        "SELECT r.x FROM _u_rev r"
    )
    assert _rewrite_table_refs("SELECT r.x FROM rev AS r", A) == (
        "SELECT r.x FROM _u_rev AS r"
    )


def test_join_and_on_qualified_refs():
    got = _rewrite_table_refs(
        "SELECT rev.x, cust.y FROM rev JOIN cust ON rev.k = cust.k", A
    )
    assert got == (
        "SELECT rev.x, cust.y FROM _u_rev AS rev "
        "JOIN _u_cust AS cust ON rev.k = cust.k"
    )


def test_comma_from_list():
    assert _rewrite_table_refs("SELECT 1 FROM rev, cust WHERE rev.k = cust.k", A) == (
        "SELECT 1 FROM _u_rev AS rev, _u_cust AS cust WHERE rev.k = cust.k"
    )


def test_qualified_table_name_untouched():
    # `db.rev` is one token and does not equal the CTE name
    assert _rewrite_table_refs("SELECT 1 FROM db.rev", A) == "SELECT 1 FROM db.rev"


def test_non_table_identifiers_untouched():
    # column named like the CTE, select alias, GROUP BY, function arg
    s = "SELECT rev, sum(rev) AS rev FROM t GROUP BY rev"
    assert _rewrite_table_refs(s, A) == s


def test_literals_comments_backticks_untouched():
    s = "SELECT 'rev', \"rev\", `rev` FROM t -- from rev\n/* join rev */"
    assert _rewrite_table_refs(s, A) == s


def test_subquery_in_from_rewrites_inside():
    got = _rewrite_table_refs("SELECT * FROM (SELECT k FROM rev) x", A)
    assert got == "SELECT * FROM (SELECT k FROM _u_rev AS rev) x"


def test_union_rewrites_both_branches():
    got = _rewrite_table_refs("SELECT k FROM rev UNION SELECT k FROM cust", A)
    assert got == (
        "SELECT k FROM _u_rev AS rev UNION SELECT k FROM _u_cust AS cust"
    )


def test_group_by_comma_not_a_table_slot():
    # the FROM list ended at GROUP BY; its commas are item separators
    s = "SELECT a, b FROM rev GROUP BY a, b"
    assert _rewrite_table_refs(s, A) == (
        "SELECT a, b FROM _u_rev AS rev GROUP BY a, b"
    )


def test_comment_between_table_and_alias():
    got = _rewrite_table_refs("SELECT r.x FROM rev /* c */ r", A)
    assert got == "SELECT r.x FROM _u_rev /* c */ r"


def test_scalar_subquery_in_select_list():
    got = _rewrite_table_refs("SELECT (SELECT max(k) FROM rev) FROM cust", A)
    assert got == (
        "SELECT (SELECT max(k) FROM _u_rev AS rev) FROM _u_cust AS cust"
    )


def test_keyword_after_table_triggers_injection():
    got = _rewrite_table_refs("SELECT 1 FROM rev WHERE rev.k > 0", A)
    assert got == "SELECT 1 FROM _u_rev AS rev WHERE rev.k > 0"


def test_empty_alias_map_is_identity():
    s = "SELECT anything FROM rev"
    assert _rewrite_table_refs(s, {}) == s


def test_case_insensitive_match_preserves_written_name():
    got = _rewrite_table_refs("SELECT REV.x FROM REV", A)
    # matched case-insensitively; the user's spelling is kept as the alias
    assert got == "SELECT REV.x FROM _u_rev AS REV"


def test_expression_from_forms_untouched():
    """Review r9: the FROM keyword inside EXTRACT/TRIM/SUBSTRING/OVERLAY
    special forms is expression syntax, not a table slot — a column
    sharing a CTE name there must stay untouched."""
    for s in (
        "SELECT EXTRACT(YEAR FROM rev) FROM t",
        "SELECT TRIM(BOTH 'x' FROM rev) FROM t",
        "SELECT SUBSTRING(rev FROM 2 FOR 3) FROM t",
        "SELECT OVERLAY(rev PLACING 'x' FROM 1) FROM t",
    ):
        assert _rewrite_table_refs(s, A) == s, s
    # ...and a real subquery INSIDE such an argument still rewrites
    got = _rewrite_table_refs(
        "SELECT TRIM('x' FROM (SELECT k FROM rev)) FROM t", A
    )
    assert got == "SELECT TRIM('x' FROM (SELECT k FROM _u_rev AS rev)) FROM t"


def test_distribute_cluster_sort_by_end_from_list():
    """Review r9: DISTRIBUTE/CLUSTER/SORT BY commas are item separators,
    not FROM-list continuations."""
    for kw in ("DISTRIBUTE", "CLUSTER", "SORT"):
        s = f"SELECT * FROM t {kw} BY a, cust"
        assert _rewrite_table_refs(s, A) == s, s


# ---------------------------------------------------------------------------
# property tests: the rewriter is safe on ARBITRARY SQL-ish text
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_SQLISH = st.lists(
    st.sampled_from([
        "SELECT", "FROM", "JOIN", "WHERE", "GROUP", "ORDER", "BY", "ON",
        "USING", "UNION", "rev", "cust", "REV", "t", "x", "db.rev",
        "rev.x", "(", ")", ",", "=", "1", "'rev'", "\"rev\"", "`rev`",
        "-- rev\n", "/* from rev */", "EXTRACT", "TRIM", "AS", "r",
        "TABLESAMPLE", "LATERAL", "VIEW", "`t`",
    ]),
    min_size=0, max_size=25,
).map(" ".join)


@settings(max_examples=300, deadline=None)
@given(_SQLISH)
def test_rewrite_never_crashes_and_is_idempotent(s):
    """Any input: no exception; literals/comments pass through unchanged;
    a second rewrite is a no-op (rewritten names no longer match, and
    injected aliases sit in non-table positions)."""
    out = _rewrite_table_refs(s, A)
    assert _rewrite_table_refs(out, A) == out
    # odd parts of the literal split (strings, quoted idents, comments)
    # are byte-identical before and after
    from dbt_databricks_metrics_spark.sql_frontend import _split_literals

    assert _split_literals(s)[1::2] == _split_literals(out)[1::2]


@settings(max_examples=200, deadline=None)
@given(_SQLISH)
def test_rewrite_only_touches_cte_name_tokens(s):
    """The output differs from the input only at whole tokens equal to a
    CTE name (case-insensitively) — everything else is byte-preserved."""
    import re as _re

    out = _rewrite_table_refs(s, A)
    # erase every whole-token CTE-name occurrence and any rewrite of one
    # from both sides (the injected alias — inline `AS rev` or deferred
    # past a TABLESAMPLE clause — is always the CTE's own name, so it is
    # erased too); the residues must match modulo whitespace
    pat = _re.compile(
        r"_u_rev( AS rev)?|_u_cust( AS cust)?|(?<![\w.])(rev|cust)(?![\w.])",
        _re.IGNORECASE,
    )
    assert " ".join(pat.sub(" ", s).split()) == " ".join(pat.sub(" ", out).split())


def test_lateral_view_alias_list_commas_untouched():
    """Review r9 (2nd pass): commas after LATERAL VIEW separate its
    generated-column aliases, never another table reference."""
    s = "SELECT * FROM t LATERAL VIEW posexplode(m) x AS k, rev"
    assert _rewrite_table_refs(s, A) == s
    # ...and a CTE in the main table slot still rewrites first
    got = _rewrite_table_refs(
        "SELECT * FROM rev LATERAL VIEW explode(xs) e AS a, cust", A
    )
    assert got == (
        "SELECT * FROM _u_rev AS rev LATERAL VIEW explode(xs) e AS a, cust"
    )


def test_tablesample_defers_alias_injection():
    """Review r9 (passes 2+3): Spark's sample clause comes BEFORE the
    table alias, so the declared name is injected AFTER the sample's
    closing paren — qualified refs keep resolving; a user alias after
    the sample clause suppresses the injection."""
    got = _rewrite_table_refs(
        "SELECT rev.x FROM rev TABLESAMPLE (10 PERCENT)", A
    )
    assert got == "SELECT rev.x FROM _u_rev TABLESAMPLE (10 PERCENT) rev"
    got2 = _rewrite_table_refs(
        "SELECT r.x FROM rev TABLESAMPLE (10 PERCENT) r", A
    )
    assert got2 == "SELECT r.x FROM _u_rev TABLESAMPLE (10 PERCENT) r"
    # nested parens inside the sample clause (e.g. a bucket expr)
    got3 = _rewrite_table_refs(
        "SELECT 1 FROM rev TABLESAMPLE (BUCKET 1 OUT OF (4)) WHERE rev.k > 0",
        A,
    )
    assert got3 == (
        "SELECT 1 FROM _u_rev TABLESAMPLE (BUCKET 1 OUT OF (4)) rev "
        "WHERE rev.k > 0"
    )


def test_backtick_identifiers_are_visible_tokens():
    """Review r9 (3rd pass): quoted identifiers consume the table slot
    and serve as alias lookahead — but are never rewritten."""
    # quoted table consumed the slot; the CTE after JOIN still rewrites
    got = _rewrite_table_refs("SELECT * FROM `t` JOIN rev ON rev.k = 1", A)
    assert got == "SELECT * FROM `t` JOIN _u_rev AS rev ON rev.k = 1"
    # quoted table, then GROUP BY commas stay item separators
    s = "SELECT a, cust FROM `t` GROUP BY a, cust"
    assert _rewrite_table_refs(s, A) == s
    # quoted user alias is visible to the lookahead — no injection
    got2 = _rewrite_table_refs("SELECT 1 FROM rev `r`", A)
    assert got2 == "SELECT 1 FROM _u_rev `r`"
    # a quoted name never matches a CTE (quoting is exact-identifier)
    s2 = "SELECT 1 FROM `rev`"
    assert _rewrite_table_refs(s2, A) == s2


def test_parenthesized_join_relation_rewrites_first_table():
    """Review r9 (2nd pass): `FROM (rev JOIN cust …)` is a parenthesized
    relation — its first token is a table slot too."""
    got = _rewrite_table_refs("SELECT * FROM (rev JOIN cust USING (k)) j", A)
    assert got == (
        "SELECT * FROM (_u_rev AS rev JOIN _u_cust AS cust USING (k)) j"
    )
    # a parenthesized SUBQUERY is still recognized as such — commas in
    # its select list are not table slots
    s = "SELECT * FROM (SELECT a, cust FROM t) x"
    assert _rewrite_table_refs(s, A) == s
