"""Day-over-day retention from daily theta sketches
(operators/retention.py): estimates vs exact set algebra, edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _panel(day_users: dict[str, range]) -> pd.DataFrame:
    frames = []
    for day, users in day_users.items():
        frames.append(pd.DataFrame({
            "user": [f"u{u}" for u in users],
            "ts": pd.Timestamp(f"{day} 12:00:00"),
        }))
    return pd.concat(frames, ignore_index=True)


def test_retention_report_matches_exact_set_algebra(spark):
    """Planted overlap panel: day1 has users 0..999, day2 keeps 600
    (retains) and adds 400 new, day3 keeps 300 of day2. Every estimate
    lands within 4 rse of the exact set sizes; duplicate rows per
    (user, day) must not inflate anything (distinct semantics)."""
    from zetasketch_spark.operators.retention import retention_report

    pdf = _panel({
        "2024-05-01": range(0, 1000),
        "2024-05-02": range(400, 1400),   # 600 retained, 400 new
        "2024-05-03": range(1100, 1600),  # 300 of day2, 200 new
    })
    pdf = pd.concat([pdf, pdf.iloc[::3]], ignore_index=True)  # dupes
    df = spark.createDataFrame(pdf).repartition(8)
    rows = {(r["day_prev"], r["day"]): r
            for r in retention_report(df, "user", "ts", k=2048).collect()}
    assert set(rows) == {("2024-05-01", "2024-05-02"),
                         ("2024-05-02", "2024-05-03")}

    exact = {
        ("2024-05-01", "2024-05-02"): (1000, 1000, 600, 400, 400),
        ("2024-05-02", "2024-05-03"): (1000, 500, 300, 200, 700),
    }
    for pair, (ap, ac, ret, new, churn) in exact.items():
        r = rows[pair]
        tol = 4 * r["rse"]
        assert abs(r["active_prev"] / ap - 1) <= tol, (pair, r)
        assert abs(r["active"] / ac - 1) <= tol, (pair, r)
        assert abs(r["retained"] / ret - 1) <= tol, (pair, r)
        assert abs(r["new_users"] / new - 1) <= tol, (pair, r)
        assert abs(r["churned"] / churn - 1) <= tol, (pair, r)
        assert abs(r["retention_rate"] - ret / ap) <= tol, (pair, r)


def test_retention_report_single_day_and_empty(spark):
    from zetasketch_spark.operators.retention import retention_report

    one = spark.createDataFrame(_panel({"2024-05-01": range(50)}))
    assert retention_report(one, "user", "ts").collect() == []
    assert retention_report(one.filter("user = 'nope'"),
                            "user", "ts").collect() == []


def test_retention_report_disjoint_days_full_churn(spark):
    """Zero overlap: retained ~ 0, churn ~ all of prev, new ~ all of
    cur — the degenerate ends of the rate are well-behaved."""
    from zetasketch_spark.operators.retention import retention_report

    df = spark.createDataFrame(_panel({
        "2024-05-01": range(0, 500),
        "2024-05-02": range(500, 900),
    }))
    [r] = retention_report(df, "user", "ts", k=2048).collect()
    tol = 4 * max(r["rse"], 0.05)
    assert r["retained"] <= 500 * tol
    assert abs(r["churned"] / 500 - 1) <= tol
    assert abs(r["new_users"] / 400 - 1) <= tol
    assert r["retention_rate"] <= tol


def test_retention_report_sampling_regime(spark):
    """k far below the distinct count (5000 users, k=512) so KMV
    actually samples: estimates land within 4 rse of exact, and rse
    reflects the intersection sample (larger than the per-day rse)."""
    from zetasketch_spark.operators.retention import retention_report

    df = spark.createDataFrame(_panel({
        "2024-05-01": range(0, 5000),
        "2024-05-02": range(2000, 7000),  # 3000 retained, 2000 new
    })).repartition(8)
    [r] = retention_report(df, "user", "ts", k=512).collect()
    assert r["rse"] >= 1.0 / (512 ** 0.5)  # genuinely sampling
    tol = 4 * r["rse"]
    assert abs(r["active_prev"] / 5000 - 1) <= tol
    assert abs(r["active"] / 5000 - 1) <= tol
    assert abs(r["retained"] / 3000 - 1) <= tol
    assert abs(r["new_users"] / 2000 - 1) <= tol
    assert abs(r["churned"] / 2000 - 1) <= tol


def test_retention_report_cohort_horizons(spark):
    """horizons=(1, 3): all horizons reuse the same daily sketches; the
    3-day pair skips the missing intermediate days and matches its own
    exact overlap; horizon < 1 is rejected."""
    import pytest

    from zetasketch_spark.operators.retention import retention_report

    df = spark.createDataFrame(_panel({
        "2024-05-01": range(0, 800),
        "2024-05-02": range(600, 1200),   # h=1: 200 retained
        "2024-05-04": range(700, 1500),   # h=3 from 05-01: 100 retained
    }))
    rows = {(r["horizon"], r["day_prev"], r["day"]): r
            for r in retention_report(df, "user", "ts", k=2048,
                                      horizons=(1, 3)).collect()}
    assert set(rows) == {
        (1, "2024-05-01", "2024-05-02"),
        (3, "2024-05-01", "2024-05-04"),
    }  # 05-02 -> 05-04 is h=2: not requested; 05-02 h=3 day absent
    r1 = rows[(1, "2024-05-01", "2024-05-02")]
    r3 = rows[(3, "2024-05-01", "2024-05-04")]
    assert abs(r1["retained"] / 200 - 1) <= 4 * max(r1["rse"], 0.05)
    assert abs(r3["retained"] / 100 - 1) <= 4 * max(r3["rse"], 0.08)

    with pytest.raises(ValueError):
        retention_report(df, "user", "ts", horizons=(0,)).collect()


def test_retention_report_per_group_curves(spark):
    """group_keys=['role']: independent curves per group from the same
    one-scan build — planted overlaps differ per role and each group's
    estimates match ITS exact algebra; null group renders '(null)'."""
    from zetasketch_spark.operators.retention import retention_report

    frames = []
    for role, (d1, d2) in {
        "user": (range(0, 600), range(300, 900)),       # 300 retained
        "assistant": (range(0, 400), range(380, 780)),  # 20 retained
        None: (range(0, 100), range(0, 100)),           # 100 retained
    }.items():
        for day, users in (("2024-05-01", d1), ("2024-05-02", d2)):
            frames.append(pd.DataFrame({
                "role": role,
                "user": [f"u{u}" for u in users],
                "ts": pd.Timestamp(f"{day} 09:00:00"),
            }))
    df = spark.createDataFrame(
        pd.concat(frames, ignore_index=True)).repartition(8)
    rows = {r["role"]: r for r in retention_report(
        df, "user", "ts", k=2048, group_keys=["role"]).collect()}
    assert set(rows) == {"user", "assistant", "(null)"}
    for role, want_ret, want_prev in (("user", 300, 600),
                                      ("assistant", 20, 400),
                                      ("(null)", 100, 100)):
        r = rows[role]
        tol = 4 * max(r["rse"], 0.05)
        assert abs(r["active_prev"] / want_prev - 1) <= tol, (role, r)
        assert abs(r["retained"] - want_ret) <= tol * want_prev + 2, (role, r)
