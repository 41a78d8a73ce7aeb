"""The bench harness's cross-round plumbing (bench.py): the
calibration-aware regression detector must not false-fire on a box-speed
change (the round-4 `top_customers` flag: 0.45->1.04 s at byte-identical
code on a ~2x-slower box) while a genuine single-query regression still
fires; and the baseline loader must recover per-query baselines from a
driver record whose stdout tail capture was truncated mid-line
(BENCH_r04.json came back "parsed": null).

Pure functions — no Spark session needed.
"""

from __future__ import annotations

import json
import os

from bench import _tail_parse, detect_regressions, load_prior_baseline

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the actual round-3 (baseline) and round-4 (measured) headline rows, from
# BENCH_r03.json "parsed" and the BENCH_r04.json stdout tail: every
# pure-JVM row shifted by one common ~2x factor (machine change, proven by
# the fixed pure-JVM calibration row), no code change on any of them
R3_QUERIES = {
    "transcripts_hll_role_day": 2.888, "pricing_summary": 0.361,
    "top_customers": 0.45, "events_summary": 0.207,
    "events_daily_top": 0.333, "revenue_filter": 0.224,
    "docs_quality": 0.211, "docs_fingerprints": 0.166,
    "embedding_norms": 0.161, "ann_cosine_topk": 0.668,
    "hll_users_by_type": 0.507, "hll_users_by_type_day": 1.638,
    "cm_heavy_hitter_users": 0.446,
}
R4_QUERIES = {
    "transcripts_hll_role_day": 2.364, "pricing_summary": 0.764,
    "top_customers": 1.04, "events_summary": 0.499,
    "events_daily_top": 0.658, "revenue_filter": 0.504,
    "docs_quality": 0.426, "docs_fingerprints": 0.37,
    "embedding_norms": 0.458, "ann_cosine_topk": 0.768,
    "hll_users_by_type": 0.579, "hll_users_by_type_day": 1.66,
    "cm_heavy_hitter_users": 0.568,
}
R4_CAL = 0.353  # the r4 box's pure-JVM calibration row
# the r3 box had no calibration row recorded; the r4 VERDICT's box-speed
# analysis put the r4 box at ~2x slower, i.e. an implied r3 cal of ~0.18
R3_CAL_IMPLIED = 0.18


def test_no_false_fire_on_box_speed_change_with_calibration():
    """The exact r3->r4 `top_customers` false positive, retired: with the
    prior record carrying a calibration row, a uniform ~2x box slowdown
    at identical code flags nothing."""
    flags = detect_regressions(R4_QUERIES, R3_QUERIES, calibration=R4_CAL,
                               prior_cal=R3_CAL_IMPLIED, solo=True)
    assert flags == {}


def test_no_false_fire_via_median_fallback_without_calibration():
    """Pre-r4 baselines carry no calibration row: the median-ratio box
    estimate must absorb the same uniform shift."""
    flags = detect_regressions(R4_QUERIES, R3_QUERIES, calibration=R4_CAL,
                               prior_cal=None, solo=True)
    assert "top_customers" not in flags
    assert flags == {}


def test_genuine_single_query_regression_still_fires():
    """A real 3x regression on ONE query sticks out above the box factor
    under both the calibration path and the median fallback."""
    now = dict(R4_QUERIES)
    now["hll_users_by_type_day"] = R3_QUERIES["hll_users_by_type_day"] * 3 * 2
    for prior_cal in (R3_CAL_IMPLIED, None):
        flags = detect_regressions(now, R3_QUERIES, calibration=R4_CAL,
                                   prior_cal=prior_cal, solo=True)
        assert set(flags) == {"hll_users_by_type_day"}, (prior_cal, flags)


def test_contended_run_flags_nothing():
    now = {k: v * 5 for k, v in R3_QUERIES.items()}
    assert detect_regressions(now, R3_QUERIES, calibration=R4_CAL,
                              prior_cal=R3_CAL_IMPLIED, solo=False) == {}


def test_tail_parse_recovers_truncated_r4_record():
    """BENCH_r04.json's tail starts mid-line; the regex fallback must
    still recover the per-query baselines and the calibration row."""
    with open(os.path.join(REPO, "BENCH_r04.json")) as fh:
        rec = json.load(fh)
    assert rec["parsed"] is None  # the round-4 failure this guards against
    got = _tail_parse(rec["tail"])
    assert got["calibration_sec"] == 0.353
    assert got["queries"]["top_customers"] == 1.04
    assert got["queries"]["transcripts_hll_role_day"] == 2.364
    assert got["sf1_queries"]["minhash_near_dups"] == 10.349


def test_load_prior_baseline_prefers_parsed_and_falls_back_to_tail(tmp_path):
    # parsed object present -> used directly
    (tmp_path / "BENCH_r01.json").write_text(json.dumps({
        "tail": "garbage", "parsed": {"queries": {"a": 1.0},
                                      "calibration_sec": 0.2}}))
    got = load_prior_baseline(str(tmp_path))
    assert got["queries"] == {"a": 1.0} and got["calibration_sec"] == 0.2
    assert got["name"] == "BENCH_r01.json"
    # newer record with parsed null -> tail fallback wins (newest round)
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({
        "parsed": None,
        "tail": 'x, "queries": {"b": 2.5}, "calibration_sec": 0.4, y'}))
    got = load_prior_baseline(str(tmp_path))
    assert got["name"] == "BENCH_r02.json"
    assert got["queries"] == {"b": 2.5} and got["calibration_sec"] == 0.4


def test_load_prior_baseline_reads_compact_line_via_detail_file(tmp_path):
    """Round 5+ records carry a compact line pointing at the full-detail
    file; sf1 baselines come from there."""
    os.makedirs(tmp_path / "BENCH")
    (tmp_path / "BENCH" / "full_r05.json").write_text(json.dumps({
        "queries": {"a": 1.0}, "sf1_queries": {"a": 9.0},
        "calibration_sec": 0.3}))
    (tmp_path / "BENCH_r05.json").write_text(json.dumps({
        "parsed": {"queries": {"a": 1.0}, "calibration_sec": 0.3,
                   "full": "BENCH/full_r05.json"}}))
    got = load_prior_baseline(str(tmp_path))
    assert got["sf1_queries"] == {"a": 9.0}
    assert got["queries"] == {"a": 1.0}


def test_load_prior_baseline_detail_file_backfills_truncated_compact(tmp_path):
    """When the compact line's size guard truncated the queries dict to
    the slowest rows, the detail file must supply the FULL dict (a
    per-key only-if-missing merge would silently drop every fast query's
    baseline, blinding the detector to regressions there); and the
    pointer targets the run's immutable full_<stamp>.json, so a later
    quick-loop run clobbering latest_full.json must not matter."""
    os.makedirs(tmp_path / "BENCH")
    full = {"queries": {"slow": 9.0, "fast": 0.3},
            "sf1_queries": {"slow": 30.0}, "calibration_sec": 0.3}
    (tmp_path / "BENCH" / "full_20260818T000000Z.json").write_text(
        json.dumps(full))
    # a later quick-loop run overwrote latest_full.json with empty sf1
    (tmp_path / "BENCH" / "latest_full.json").write_text(json.dumps({
        "queries": {"slow": 99.0}, "sf1_queries": {},
        "calibration_sec": 9.9}))
    (tmp_path / "BENCH_r06.json").write_text(json.dumps({
        "parsed": {"queries": {"slow": 9.0},  # guard-truncated
                   "calibration_sec": 0.3,
                   "full": "BENCH/full_20260818T000000Z.json"}}))
    got = load_prior_baseline(str(tmp_path))
    assert got["queries"] == {"slow": 9.0, "fast": 0.3}
    assert got["sf1_queries"] == {"slow": 30.0}
    assert got["calibration_sec"] == 0.3
