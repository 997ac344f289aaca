"""MEASURE() over live streams (streaming/metric_stream.py): the same
MetricViewSpec answers in batch and in availableNow streaming mode with
identical results, derived measures project after the windowed agg, and
frame-crossing (window-clause) measures are honestly refused."""

from __future__ import annotations

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.plans.compiler import QueryError
from dbt_databricks_metrics_spark.specs import MetricViewSpec
from dbt_databricks_metrics_spark.streaming.metric_stream import (
    streaming_metric_view,
)

SPEC_YAML = """
version: 0.1
source: live_events
dimensions:
  - name: event_type
    expr: event_type
  - name: event_day
    expr: cast(ts as date)
measures:
  - name: n_events
    expr: count(*)
  - name: value_cents
    expr: sum(cast(round(value * 100) as bigint))
  - name: avg_cents
    expr: value_cents / n_events
    derived: true
  - name: trailing_value
    expr: sum(value)
    window:
      - order: event_day
        range: trailing 7 day
        semiadditive: last
"""


@pytest.fixture(scope="module")
def spec():
    return MetricViewSpec.from_yaml(SPEC_YAML, name="mv_live")


def _events(spark):
    rows = [
        (i, f"u{i % 5}", ["click", "view", "purchase"][i % 3],
         float(i) + 0.25, f"2024-03-01 0{i % 8}:{10 + i % 45}:00")
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, value double, ts_s string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")


def _normalize(df):
    # None-safe sort key (left joins produce NULL dims)
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def test_batch_mode_matches_manual_agg(spark, spec):
    ev = _events(spark)
    got = streaming_metric_view(
        ev, spec, ts_col="ts", window_duration="1 hour",
        dimensions=["event_type"],
        measures=["n_events", "value_cents", "avg_cents"],
    )
    exp = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "value_cents",
            (F.col("value_cents") / F.col("n_events")).alias("avg_cents"),
        )
    )
    assert _normalize(got) == _normalize(exp)


def test_stream_mode_matches_batch_mode(spark, spec, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "ev")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    live = streaming_metric_view(
        stream, spec, ts_col="ts", window_duration="1 hour",
        watermark="10 minutes",
    )
    assert live.isStreaming
    name = f"live_mv_{uuid.uuid4().hex[:8]}"
    q = (
        live.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(300)
    batch = streaming_metric_view(
        ev, spec, ts_col="ts", window_duration="1 hour"
    )
    # append mode emits exactly the windows the FINAL watermark closed
    # (window_end <= max(ts) - delay); open windows stay in state — the
    # documented streaming semantics, so the batch side filters to the
    # same closed set
    cutoff = ev.agg(F.max("ts")).first()[0]
    closed = batch.filter(
        F.col("window_end") <= F.lit(cutoff) - F.expr("INTERVAL 10 minutes")
    )
    got = _normalize(spark.table(name))
    assert got == _normalize(closed)
    assert 0 < len(got) < batch.count()  # some windows really were open


def test_sliding_window_and_subset(spark, spec):
    ev = _events(spark)
    got = streaming_metric_view(
        ev, spec, ts_col="ts", window_duration="2 hours", slide="1 hour",
        dimensions=[], measures=["n_events"],
    )
    # every event lands in exactly two 2h/1h sliding windows
    assert got.agg(F.sum("n_events")).first()[0] == 2 * ev.count()
    assert got.columns == ["window_start", "window_end", "n_events"]


def test_refusals(spark, spec):
    ev = _events(spark)
    with pytest.raises(QueryError, match="window clauses"):
        streaming_metric_view(
            ev, spec, ts_col="ts", window_duration="1 hour",
            measures=["trailing_value"],
        )
    with pytest.raises(QueryError, match="undeclared dimension"):
        streaming_metric_view(
            ev, spec, ts_col="ts", window_duration="1 hour",
            dimensions=["nope"],
        )
    with pytest.raises(QueryError, match="plain aggregate"):
        streaming_metric_view(
            ev, spec, ts_col="ts", window_duration="1 hour",
            measures=["avg_cents"],
        )
    with pytest.raises(QueryError, match="at least one measure"):
        streaming_metric_view(
            ev, spec, ts_col="ts", window_duration="1 hour", measures=[],
        )
    # derived requested without the measure it references (review r7:
    # the alongside-rule is enforced, not just documented)
    with pytest.raises(QueryError, match="not in the requested set"):
        streaming_metric_view(
            ev, spec, ts_col="ts", window_duration="1 hour",
            measures=["avg_cents", "n_events"],
        )


def test_batch_plan_shape(spark, spec):
    """Scale posture: the compiled plan is ONE keyed shuffle with
    map-side partial aggregation (the window+dims groupBy), no
    cartesian products, no Python in the path — the shape that holds at
    1000 executors."""
    ev = _events(spark)
    df = streaming_metric_view(
        ev, spec, ts_col="ts", window_duration="1 hour"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert plan.count("Exchange") == 1, plan[:2000]
    # partial aggregation before the exchange (map-side combine)
    assert "partial" in plan.lower(), plan[:2000]


def test_measure_over_stream_stream_join(spark, spec, tmp_path):
    """The flagship composition: MEASURE() over a watermarked
    stream-stream interval join — windowed attribution metrics — equals
    the batch expression of the same spec over the batch join.

    Chained stateful operators (join then windowed agg) finalize one
    watermark advance late: the first availableNow run emits NOTHING
    because the agg sees the batch-start watermark. The flush recipe —
    append a far-future sentinel on each join side (disjoint users, so
    it contributes no joined rows) and run availableNow again on the
    same checkpoint — closes every original window, making the emitted
    set equal the COMPLETE batch answer."""
    from dbt_databricks_metrics_spark.streaming.joins import (
        stream_stream_interval_join,
    )

    join_spec = MetricViewSpec.from_yaml(
        """
version: 0.1
source: attributed
dimensions:
  - name: gap_hours
    expr: cast((unix_micros(p_ts) - unix_micros(c_ts)) div 3600000000 as int)
measures:
  - name: conversions
    expr: count(*)
  - name: attributed_cents
    expr: sum(cast(round(p_value * 100) as bigint))
""",
        name="mv_attr",
    )
    ev = _events(spark)
    src = str(tmp_path / "ev2")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    ev.write.parquet(src)

    def sides(df_or_stream):
        c = df_or_stream.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        p = df_or_stream.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        )
        return c, p

    def run_once():
        sc, sp = sides(spark.readStream.schema(ev.schema).parquet(src))
        joined_live = stream_stream_interval_join(
            sc, sp, key="user_id", ts_col="ts", max_gap="4 hours",
            watermark="30 minutes", left_prefix="c", right_prefix="p",
        )
        # watermark=None: the join already watermarked both inputs, and
        # Spark disallows redefining one downstream of a stateful op
        live = streaming_metric_view(
            joined_live, join_spec, ts_col="p_ts",
            window_duration="1 hour", watermark=None,
        )
        q = (
            live.writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(300)

    run_once()
    # one far-future click + purchase on DISJOINT users: advances both
    # sides' watermarks past every original window, joins nothing
    spark.createDataFrame(
        [(9000, "zz", "click", 0.0, "2024-03-03 00:00:00"),
         (9001, "zz2", "purchase", 0.0, "2024-03-03 00:00:00")],
        "event_id long, user_id string, event_type string, value double, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop(
        "ts_s"
    ).write.mode("append").parquet(src)
    run_once()

    bc, bp = sides(ev)
    joined_batch = stream_stream_interval_join(
        bc, bp, key="user_id", ts_col="ts", max_gap="4 hours",
        left_prefix="c", right_prefix="p",
    )
    batch = streaming_metric_view(
        joined_batch, join_spec, ts_col="p_ts", window_duration="1 hour"
    )
    got = _normalize(spark.read.parquet(sink))
    assert got == _normalize(batch)
    assert len(got) > 0

FILTERED_SPEC_YAML = """
version: 0.1
source: live_events
filter: event_type <> 'view'
dimensions:
  - name: event_type
    expr: event_type
  - name: event_day
    expr: cast(ts as date)
measures:
  - name: n_events
    expr: count(*)
  - name: value_cents
    expr: sum(cast(round(value * 100) as bigint))
  - name: avg_cents
    expr: value_cents / n_events
    derived: true
  - name: avg_dollars
    expr: avg_cents / 100
    derived: true
  - name: trailing_value
    expr: sum(value)
    window:
      - order: event_day
        range: trailing 7 day
  - name: trailing_avg
    expr: trailing_value / n_events
    derived: true
"""


@pytest.fixture(scope="module")
def filtered_spec():
    return MetricViewSpec.from_yaml(FILTERED_SPEC_YAML, name="mv_filtered")


def test_spec_filter_applied_batch_and_stream(spark, filtered_spec, tmp_path):
    """ADVICE r7 (high): spec.filter must reach the streaming plan — a
    filtered spec previously streamed silently-unfiltered aggregates.
    Batch/stream parity on the same filtered spec proves the fix."""
    ev = _events(spark)
    batch = streaming_metric_view(
        ev, filtered_spec, ts_col="ts", window_duration="1 hour",
        dimensions=["event_type"], measures=["n_events"],
    )
    # no 'view' rows survive the spec filter
    assert batch.filter(F.col("event_type") == "view").count() == 0
    manual = (
        ev.filter("event_type <> 'view'")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events",
        )
    )
    assert _normalize(batch) == _normalize(manual)

    src = str(tmp_path / "evf")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    live = streaming_metric_view(
        stream, filtered_spec, ts_col="ts", window_duration="1 hour",
        watermark="10 minutes", dimensions=["event_type"],
        measures=["n_events"],
    )
    assert live.isStreaming
    name = f"live_filtered_{uuid.uuid4().hex[:8]}"
    q = (
        live.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(300)
    cutoff = ev.agg(F.max("ts")).first()[0]
    closed = batch.filter(
        F.col("window_end") <= F.lit(cutoff) - F.expr("INTERVAL 10 minutes")
    )
    assert _normalize(spark.table(name)) == _normalize(closed)


JOINED_SPEC_YAML = """
version: 0.1
source: live_events
joins:
  - name: customer
    source: dim_customer
    on: source.user_id = customer.id
dimensions:
  - name: event_type
    expr: event_type
  - name: segment
    expr: customer.segment
measures:
  - name: n_events
    expr: count(*)
  - name: seg_chars
    expr: sum(length(customer.segment))
"""


@pytest.fixture(scope="module")
def joined_spec():
    return MetricViewSpec.from_yaml(JOINED_SPEC_YAML, name="mv_joined")


def _dim_customer(spark):
    return spark.createDataFrame(
        [(f"u{i}", ["RETAIL", "ENTERPRISE"][i % 2]) for i in range(4)],
        "id string, segment string",
    )  # u4 is deliberately absent: left join → NULL segment


def test_spec_with_joins_needs_resolver(spark, joined_spec):
    """ADVICE r7: a spec declaring joins must never compile joinless —
    without a resolver it refuses loudly."""
    ev = _events(spark)
    with pytest.raises(QueryError, match="declares joins"):
        streaming_metric_view(
            ev, joined_spec, ts_col="ts", window_duration="1 hour"
        )


def test_stream_static_join_batch_parity(spark, joined_spec):
    """r8: spec.joins resolve to STATIC frames — the same left-join tree
    as the batch compiler, stateless ahead of the watermark."""
    ev = _events(spark)
    dim = _dim_customer(spark)
    got = streaming_metric_view(
        ev, joined_spec, ts_col="ts", window_duration="1 hour",
        dimensions=["segment"], measures=["n_events"],
        resolve=lambda n: dim,
    )
    exp = (
        ev.join(dim, ev.user_id == dim.id, "left")
        .groupBy(F.window("ts", "1 hour").alias("w"), "segment")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "segment", "n_events",
        )
    )
    assert _normalize(got) == _normalize(exp)
    # the unmatched user (u4) survives with a NULL segment (left join)
    assert any(r["segment"] is None for r in got.collect())


def test_stream_static_join_streams(spark, joined_spec, tmp_path):
    """The joined spec answers in availableNow streaming mode with the
    batch answer on watermark-closed windows."""
    ev = _events(spark)
    dim = _dim_customer(spark)
    src = str(tmp_path / "evj")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    live = streaming_metric_view(
        stream, joined_spec, ts_col="ts", window_duration="1 hour",
        watermark="10 minutes", dimensions=["segment"],
        measures=["n_events"], resolve=lambda n: dim,
    )
    assert live.isStreaming
    name = f"live_joined_{uuid.uuid4().hex[:8]}"
    q = (
        live.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(300)
    batch = streaming_metric_view(
        ev, joined_spec, ts_col="ts", window_duration="1 hour",
        dimensions=["segment"], measures=["n_events"],
        resolve=lambda n: dim,
    )
    cutoff = ev.agg(F.max("ts")).first()[0]
    closed = batch.filter(
        F.col("window_end") <= F.lit(cutoff) - F.expr("INTERVAL 10 minutes")
    )
    assert _normalize(spark.table(name)) == _normalize(closed)


def test_stream_stream_join_source_refused(spark, joined_spec, tmp_path):
    """A declared join resolving to a STREAM refuses loudly."""
    ev = _events(spark)
    src = str(tmp_path / "evs")
    ev.write.parquet(src)
    stream_dim = spark.readStream.schema(ev.schema).parquet(src)
    with pytest.raises(QueryError, match="resolves to a STREAM"):
        streaming_metric_view(
            ev, joined_spec, ts_col="ts", window_duration="1 hour",
            resolve=lambda n: stream_dim,
        )


def test_derived_chain_orders_topologically(spark, filtered_spec):
    """ADVICE r7 (low): avg_dollars references avg_cents, itself
    derived. Requesting avg_dollars BEFORE avg_cents must still resolve
    (dependency-ordered projection), and the output keeps request
    order."""
    ev = _events(spark)
    got = streaming_metric_view(
        ev, filtered_spec, ts_col="ts", window_duration="1 hour",
        dimensions=[],
        measures=["avg_dollars", "avg_cents", "n_events", "value_cents"],
    )
    assert got.columns == [
        "window_start", "window_end",
        "avg_dollars", "avg_cents", "n_events", "value_cents",
    ]
    row = got.orderBy("window_start").first()
    assert row["avg_cents"] == row["value_cents"] / row["n_events"]
    assert row["avg_dollars"] == row["avg_cents"] / 100


def test_default_measures_drop_underivable_derived(spark, filtered_spec):
    """ADVICE r7 (low): measures=None must not error on a spec whose
    derived measure references a windowed one — trailing_avg is
    excluded from the default set (transitively underivable), while the
    derivable chain avg_cents/avg_dollars stays in."""
    ev = _events(spark)
    got = streaming_metric_view(
        ev, filtered_spec, ts_col="ts", window_duration="1 hour",
        dimensions=[],
    )
    assert "trailing_avg" not in got.columns
    assert "trailing_value" not in got.columns
    for c in ("n_events", "value_cents", "avg_cents", "avg_dollars"):
        assert c in got.columns
    # explicit request of the underivable derived still refuses loudly
    with pytest.raises(QueryError):
        streaming_metric_view(
            ev, filtered_spec, ts_col="ts", window_duration="1 hour",
            measures=["trailing_avg", "n_events"],
        )


def test_joined_measure_expr_rewritten(spark, joined_spec):
    """Measure exprs over JOINED columns rewrite through the same
    dotted-path flattening as dims (batch-compiler parity) — and the
    resolver is consulted once per source (memoized), not once per
    validation + once per join."""
    ev = _events(spark)
    dim = _dim_customer(spark)
    calls = []

    def resolve(name):
        calls.append(name)
        return dim

    got = streaming_metric_view(
        ev, joined_spec, ts_col="ts", window_duration="1 hour",
        dimensions=["segment"], measures=["n_events", "seg_chars"],
        resolve=resolve,
    )
    rows = {r["segment"]: r for r in got.collect()}
    for seg, r in rows.items():
        if seg is not None:
            assert r["seg_chars"] == len(seg) * r["n_events"]
    assert calls.count("dim_customer") == 1

def test_joined_plan_shape(spark, joined_spec):
    """Scale posture for the joined path: the dim side broadcasts (no
    shuffle of the stream side for the join) and the windowed agg is the
    ONE keyed exchange, with map-side partial aggregation."""
    ev = _events(spark)
    dim = _dim_customer(spark)
    df = streaming_metric_view(
        ev, joined_spec, ts_col="ts", window_duration="1 hour",
        dimensions=["segment"], measures=["n_events"],
        resolve=lambda n: dim,
    )
    # a createDataFrame dim has no size stats, so the STATIC plan can
    # pick SMJ; AQE converts to broadcast at runtime — gate the FINAL
    # adaptive plan (after execution), which is what actually runs
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "partial" in plan.lower()
