"""Property-based SCD test: scd_apply must agree with an independent
pure-Python reference model on arbitrary snapshot histories.

The model re-states the reference semantics (reference
jobs/create_employee_all.py:128-150, with the corrected per-entity
islands): CASE order New > Deleted > Changed > No Change; Deleted on
an entity's last row when it predates the global max; change date =
island start, Deleted rows carry their own date.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark_scd_spark.operators import scd

BASE = dt.date(2021, 6, 1)


def python_scd_model(obs: dict[tuple[int, int], str]):
    """obs: (entity, day) -> value. Returns (entity, day) ->
    (status, change_day)."""
    if not obs:
        return {}
    global_max = max(d for _, d in obs)
    out = {}
    entities = {e for e, _ in obs}
    for e in sorted(entities):
        rows = sorted((d, v) for (ee, d), v in obs.items() if ee == e)
        # islands: contiguous runs of equal value in row order
        island_start = {}
        for i, (d, v) in enumerate(rows):
            if i > 0 and rows[i - 1][1] == v:
                island_start[d] = island_start[rows[i - 1][0]]
            else:
                island_start[d] = d
        for i, (d, v) in enumerate(rows):
            last = i == len(rows) - 1
            if i == 0:
                status = "New"
            elif last and rows[-1][0] != global_max:
                status = "Deleted"
            elif v != rows[i - 1][1]:
                status = "Changed"
            else:
                status = "No Change"
            change_day = d if status == "Deleted" else island_start[d]
            out[(e, d)] = (status, change_day)
    return out


@st.composite
def histories(draw):
    n_entities = draw(st.integers(1, 4))
    n_days = draw(st.integers(1, 6))
    obs = {}
    for e in range(n_entities):
        for d in range(n_days):
            present = draw(st.booleans())
            if present:
                obs[(e, d)] = draw(st.sampled_from(["a", "b", "c"]))
    return obs


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(obs=histories())
def test_scd_apply_matches_model(spark, obs):
    if not obs:
        return
    rows = [
        (e, BASE + dt.timedelta(days=d), v) for (e, d), v in obs.items()
    ]
    df = spark.createDataFrame(rows, ["entity", "snap_date", "val"])
    got = {
        (r["entity"], (r["snap_date"] - BASE).days): (
            r["change_status"],
            (r["changed_status_date"] - BASE).days,
        )
        for r in scd.scd_apply(
            df, key_cols=["entity"], time_col="snap_date", hash_cols=["val"]
        ).collect()
    }
    want = python_scd_model(obs)
    assert got == want
