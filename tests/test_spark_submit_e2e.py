"""End-to-end `spark-submit --py-files` contract (the north_rule's literal
run shape).

Runs jobs/transcripts_hll_job.py as a real spark-submit subprocess — the
package is shipped ONLY via the --py-files zip (PYTHONPATH scrubbed, cwd
outside the repo, and the job script lives in jobs/ which does not contain
the package) — twice over the same input + checkpoint dir, and asserts:

* run 1 computes every partition, writes parquet, and every per-role
  estimate lands inside the published HLL++ envelope vs the exact
  DuckDB COUNT(DISTINCT);
* run 2 resumes from checkpoint (computes 0 partitions, resumes all) and
  produces byte-identical rows.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
JOB = os.path.join(REPO, "jobs", "transcripts_hll_job.py")

spark_submit = shutil.which("spark-submit")


def _run_job(zip_path, args):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    proc = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, JOB] + args,
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(zip_path), env=env)
    assert proc.returncode == 0, proc.stderr[-4000:]
    metrics = None
    for line in proc.stdout.splitlines():
        if line.startswith("METRICS "):
            metrics = json.loads(line[len("METRICS "):])
    return metrics


@pytest.mark.skipif(spark_submit is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_checkpoint_resume(tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from tools.make_pyfiles_zip import main as make_zip
    from zetasketch_spark.sources.transcripts import write_transcripts_parquet

    zip_path = make_zip(str(tmp_path / "zetasketch_spark.zip"))
    inp = str(tmp_path / "transcripts")
    write_transcripts_parquet(inp, n_turns=20_000, seed=7, n_convs=500)

    ckpt = str(tmp_path / "ckpt")
    out1, out2 = str(tmp_path / "out1"), str(tmp_path / "out2")
    common = ["--input", inp, "--keys", "role", "--col", "conv_id",
              "--precision", "13", "--checkpoint-dir", ckpt]

    m1 = _run_job(zip_path, common + ["--output", out1])
    assert m1 is not None
    assert m1["partitions_computed"] > 0 and m1["partitions_resumed"] == 0

    m2 = _run_job(zip_path, common + ["--output", out2])
    assert m2["partitions_computed"] == 0
    assert m2["partitions_resumed"] == m1["n_partitions"]

    t1 = pq.read_table(out1)
    t2 = pq.read_table(out2)
    got1 = {r["role"]: r["estimate"] for r in t1.to_pylist()}
    got2 = {r["role"]: r["estimate"] for r in t2.to_pylist()}
    assert got1 == got2 and got1

    con = duckdb.connect()
    exact = dict(con.execute(
        "SELECT role, count(DISTINCT conv_id) FROM "
        f"read_parquet('{inp}/*.parquet') GROUP BY role").fetchall())
    assert set(got1) == set(exact)
    envelope = 1.04 / (2 ** 13) ** 0.5
    for role, est in got1.items():
        assert abs(est / exact[role] - 1) <= envelope, (role, est, exact[role])


@pytest.mark.skipif(spark_submit is None, reason="spark-submit not on PATH")
def test_spark_submit_sketch_table_delta_maintenance(tmp_path):
    """--sketch-table mode: each job run folds its --input in as a delta
    (idempotent per input fingerprint), never rescanning history."""
    import duckdb
    import pyarrow.parquet as pq

    from tools.make_pyfiles_zip import main as make_zip
    from zetasketch_spark.sources.transcripts import write_transcripts_parquet

    zip_path = make_zip(str(tmp_path / "zetasketch_spark.zip"))
    d1, d2 = str(tmp_path / "delta1"), str(tmp_path / "delta2")
    write_transcripts_parquet(d1, n_turns=8_000, seed=11, n_convs=300)
    write_transcripts_parquet(d2, n_turns=8_000, seed=12, n_convs=300)

    table = str(tmp_path / "sketch_table")
    out = str(tmp_path / "out")
    common = ["--keys", "role", "--col", "conv_id", "--precision", "13",
              "--sketch-table", table, "--output", out]

    m1 = _run_job(zip_path, ["--input", d1] + common)
    assert m1["applied"] and m1["version"] == 1

    # replaying the same delta is a committed no-op
    m1b = _run_job(zip_path, ["--input", d1] + common)
    assert m1b["applied"] is False and m1b["version"] == 1

    m2 = _run_job(zip_path, ["--input", d2] + common)
    assert m2["applied"] and m2["version"] == 2

    got = {r["role"]: r["estimate"] for r in pq.read_table(out).to_pylist()}
    con = duckdb.connect()
    exact = dict(con.execute(
        "SELECT role, count(DISTINCT conv_id) FROM read_parquet("
        f"['{d1}/*.parquet', '{d2}/*.parquet']) GROUP BY role").fetchall())
    assert set(got) == set(exact)
    envelope = 1.04 / (2 ** 13) ** 0.5
    for role, est in got.items():
        assert abs(est / exact[role] - 1) <= envelope, (role, est, exact[role])


@pytest.mark.skipif(spark_submit is None, reason="spark-submit not on PATH")
def test_spark_submit_multi_one_scan(tmp_path):
    """--multi mode: one scan computes every spec'd family
    (multi_sketch_agg_rdd through the real spark-submit surface); HLL
    stays in its envelope, rows_seen is exact, and the DDSketch median
    of length(text) is within alpha of the exact order statistic."""
    import duckdb
    import pyarrow.parquet as pq

    from tools.make_pyfiles_zip import main as make_zip
    from zetasketch_spark.sources.transcripts import write_transcripts_parquet

    zip_path = make_zip(str(tmp_path / "zetasketch_spark.zip"))
    inp = str(tmp_path / "transcripts")
    write_transcripts_parquet(inp, n_turns=20_000, seed=9, n_convs=500)

    out = str(tmp_path / "out")
    _run_job(zip_path, [
        "--input", inp, "--keys", "role", "--precision", "13",
        "--multi", "convs=hll:conv_id,lens=ddsketch:length(text)",
        "--output", out])

    got = {r["role"]: r for r in pq.read_table(out).to_pylist()}
    con = duckdb.connect()
    exact = {role: (d, n, med) for role, d, n, med in con.execute(
        "SELECT role, count(DISTINCT conv_id), count(*), "
        "median(length(text)) FROM "
        f"read_parquet('{inp}/*.parquet') GROUP BY role").fetchall()}
    assert set(got) == set(exact)
    envelope = 1.04 / (2 ** 13) ** 0.5
    for role, r in got.items():
        d, n, med = exact[role]
        assert abs(r["convs_estimate"] / d - 1) <= envelope, (role, r)
        assert r["rows_seen"] == n
        assert abs(r["lens_q50"] - med) <= 0.02 * med + 1.0, (role, r, med)

    # --trending over the same input/zip: exact dyadic decayed top tools
    # certified by the weighted CM (operators/trending.py), through the
    # same spark-submit surface
    tout = str(tmp_path / "trend_out")
    _run_job(zip_path, ["--input", inp, "--trending", "--col", "tool",
                        "--top", "5", "--output", tout])
    trows = sorted(pq.read_table(tout).to_pylist(), key=lambda r: r["rank"])
    assert [r["rank"] for r in trows] == [1, 2, 3, 4, 5]
    assert all(r["trend_est_ok"] and r["trend_in_candidates"]
               for r in trows)
    # the synthetic transcripts span few days, so age 0 dominates and the
    # decayed ranking's top key must be the raw-frequency top tool among
    # anchor-week rows — recompute the exact dyadic score in DuckDB
    (top_tool, top_w), = con.execute(
        "WITH a AS (SELECT CAST(max(ts) AS DATE) AS d FROM "
        f"read_parquet('{inp}/*.parquet')) "
        "SELECT tool, CAST(sum(CAST(pow(2, 40 - CAST(floor(datediff('day',"
        " CAST(ts AS DATE), (SELECT d FROM a)) / 7.0) AS BIGINT)) AS "
        "BIGINT)) AS BIGINT) AS w FROM "
        f"read_parquet('{inp}/*.parquet') WHERE tool IS NOT NULL "
        "GROUP BY tool ORDER BY w DESC, tool LIMIT 1").fetchall()
    assert trows[0]["key"] == top_tool
    assert trows[0]["decayed_weight"] == top_w

    # --retention over the same input/zip: day-over-day conv_id overlap
    # estimates within the KMV envelope of DuckDB's exact set algebra
    rout = str(tmp_path / "ret_out")
    _run_job(zip_path, ["--input", inp, "--retention", "--col", "conv_id",
                        "--output", rout])
    rrows = {(r["day_prev"], r["day"]): r
             for r in pq.read_table(rout).to_pylist()}
    exact_pairs = dict(con.execute(
        "WITH d AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, "
        f"conv_id FROM read_parquet('{inp}/*.parquet')) "
        "SELECT a.day, count(*) FROM d a JOIN d b ON b.conv_id = a.conv_id "
        "AND CAST(b.day AS DATE) = CAST(a.day AS DATE) + INTERVAL 1 DAY "
        "GROUP BY a.day").fetchall())
    assert rrows, "no consecutive-day pairs in the synthetic input"
    for (prev, _cur), r in rrows.items():
        want = exact_pairs.get(prev, 0)
        assert abs(r["retained"] - want) <= 4 * r["rse"] * max(want, 50) + 2

    # --window-activity over the same input/zip: per-role trailing-window
    # distinct conv_ids from one temporal theta sketch vs DuckDB's exact
    # last-seen-day recompute
    wout = str(tmp_path / "win_out")
    _run_job(zip_path, ["--input", inp, "--window-activity",
                        "--col", "conv_id", "--keys", "role",
                        "--windows", "2,7", "--output", wout])
    wrows = {(r["role"], r["window_days"]): r
             for r in pq.read_table(wout).to_pylist()}
    assert wrows and all(w in (2, 7) for _, w in wrows)
    exact_w = {(role, w): n for role, w, n in con.execute(
        "WITH lastd AS (SELECT role, conv_id, max(CAST(ts AS DATE)) AS l "
        f"FROM read_parquet('{inp}/*.parquet') GROUP BY 1, 2), "
        "mx AS (SELECT max(l) AS m FROM lastd) "
        "SELECT role, w, count(*) FROM lastd, mx, (VALUES (2), (7)) v(w) "
        "WHERE l >= m - (w - 1) * INTERVAL 1 DAY "
        "GROUP BY role, w").fetchall()}
    for key, r in wrows.items():
        want = exact_w.get(key, 0)
        assert abs(r["active"] - want) <= 4 * r["sd"] + 2, (key, r, want)


@pytest.mark.skipif(spark_submit is None, reason="spark-submit not on PATH")
def test_spark_submit_multi_sketch_table(tmp_path):
    """--multi + --sketch-table: one delta scan maintains a persistent
    table per spec; the shared fingerprint replays as a per-table no-op,
    and a second delta folds in (HLL estimate over both deltas in
    envelope)."""
    import duckdb
    import pyarrow.parquet as pq

    from tools.make_pyfiles_zip import main as make_zip
    from zetasketch_spark.sources.transcripts import write_transcripts_parquet

    zip_path = make_zip(str(tmp_path / "zetasketch_spark.zip"))
    d1, d2 = str(tmp_path / "delta1"), str(tmp_path / "delta2")
    write_transcripts_parquet(d1, n_turns=8_000, seed=21, n_convs=300)
    write_transcripts_parquet(d2, n_turns=8_000, seed=22, n_convs=300)

    tdir, out = str(tmp_path / "tables"), str(tmp_path / "out")
    common = ["--keys", "role", "--precision", "13",
              "--multi", "convs=hll:conv_id,lens=ddsketch:length(text)",
              "--sketch-table", tdir, "--output", out]

    m1 = _run_job(zip_path, ["--input", d1] + common)
    assert all(v["applied"] and v["version"] == 1 for v in m1.values())
    m1b = _run_job(zip_path, ["--input", d1] + common)
    assert all(v["applied"] is False for v in m1b.values())
    m2 = _run_job(zip_path, ["--input", d2] + common)
    assert all(v["applied"] and v["version"] == 2 for v in m2.values())

    got = {r["role"]: r["estimate"] for r in
           pq.read_table(f"{out}/convs").to_pylist()}
    con = duckdb.connect()
    exact = dict(con.execute(
        "SELECT role, count(DISTINCT conv_id) FROM read_parquet("
        f"['{d1}/*.parquet', '{d2}/*.parquet']) GROUP BY role").fetchall())
    assert set(got) == set(exact)
    envelope = 1.04 / (2 ** 13) ** 0.5
    for role, est in got.items():
        assert abs(est / exact[role] - 1) <= envelope, (role, est, exact[role])
    lens = {r["role"]: r for r in pq.read_table(f"{out}/lens").to_pylist()}
    assert set(lens) == set(exact) and all(
        r["n"] > 0 and r["q50"] > 0 for r in lens.values())
