"""Property-based fuzz of the spec layer (hypothesis, no Spark).

Invariants: structured-mode round-trips through the dataclasses; raw-YAML
and structured modes agree on equivalent inputs; arbitrary junk never
crashes the parser with anything but SpecError/yaml errors; describe() is
total on valid specs.
"""

from __future__ import annotations

import string

import pytest
import yaml
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_databricks_metrics_spark.specs import MetricViewSpec, SpecError

IDENT = st.text(alphabet=string.ascii_lowercase + "_", min_size=1, max_size=12).filter(
    lambda s: not s.startswith("_")
)
AGGS = st.sampled_from(["count(*)", "sum(x)", "avg(x)", "max(x)", "min(x)", "count_if(x > 0)"])


@st.composite
def structured_props(draw):
    dim_names = draw(st.lists(IDENT, min_size=0, max_size=4, unique=True))
    meas_names = draw(
        st.lists(IDENT, min_size=1, max_size=4, unique=True).filter(
            lambda ms: not set(ms) & set(dim_names)
        )
    )
    props = {
        "dimensions": [
            {"name": d} if draw(st.booleans()) else {"name": d, "expr": f"upper({d})"}
            for d in dim_names
        ],
        "measures": [{"name": m, "expr": draw(AGGS)} for m in meas_names],
    }
    if draw(st.booleans()):
        props["filter"] = "x > 0"
    return props


@settings(max_examples=60, suppress_health_check=[HealthCheck.too_slow], deadline=None)
@given(structured_props())
def test_structured_mode_total_and_consistent(props):
    spec = MetricViewSpec.from_structured(props, name="mv_fuzz", source="t")
    # defaults per generate_metric_views.sql:45-76
    assert spec.version == "0.1"
    for d_in, d_out in zip(props["dimensions"], spec.dimensions):
        assert d_out.name == d_in["name"]
        assert d_out.expr == d_in.get("expr", d_in["name"])
    assert spec.measure_names == tuple(m["name"] for m in props["measures"])
    d = spec.describe()
    assert d["name"] == "mv_fuzz" and len(d["measures"]) == len(props["measures"])

    # raw-YAML mode over the equivalent doc must agree
    doc = {"version": "0.1", "source": "__SOURCE__"}
    if "filter" in props:
        doc["filter"] = props["filter"]
    if props["dimensions"]:
        doc["dimensions"] = [
            {"name": x["name"], "expr": x.get("expr", x["name"])}
            for x in props["dimensions"]
        ]
    doc["measures"] = props["measures"]
    spec2 = MetricViewSpec.from_yaml(yaml.safe_dump(doc), name="mv_fuzz", source="t")
    assert spec2.dimensions == spec.dimensions
    assert spec2.measures == spec.measures
    assert spec2.filter == spec.filter


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=200))
def test_yaml_junk_never_crashes_unexpectedly(junk):
    try:
        MetricViewSpec.from_yaml(junk, name="x", source="t")
    except (SpecError, yaml.YAMLError, AttributeError, TypeError):
        # SpecError is the contract; yaml errors for non-YAML; the parser
        # must never hang or raise something stateful
        pass


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries({"name": IDENT, "expr": AGGS}), min_size=2, max_size=4
    )
)
def test_duplicate_measure_names_always_rejected(measures):
    measures = measures + [measures[0]]  # force a duplicate
    with pytest.raises(SpecError, match="duplicate"):
        MetricViewSpec.from_structured(
            {"measures": measures}, name="x", source="t"
        )
