"""Sketch-accelerated scan pruning (operators/scanindex.py): the
zero-false-negative invariant — pruned_read == full-scan filter for any
IN-list or range predicate — plus pruning effectiveness, the
full-scan fallback, string columns, and null handling."""

import os

import pyspark.sql.functions as F
import pytest

from zetasketch_spark.operators.scanindex import (
    build_scan_index,
    expected_file_fpr,
    prune_candidates,
    pruned_read,
)

N_FILES = 16
N_ROWS = 8000


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """A 16-file parquet table with keys CLUSTERED per file (each file
    covers a distinct key range — the layout where pruning pays) plus a
    small string column and some nulls."""
    d = str(tmp_path_factory.mktemp("sgi") / "t")
    df = (spark.range(N_ROWS)
          .withColumn("key", F.col("id") * 7)  # sparse key space
          .withColumn("bucket", (F.col("id") / (N_ROWS // N_FILES))
                      .cast("int"))
          .withColumn("name", F.concat(F.lit("u"), F.col("id")))
          .withColumn("key_n",
                      F.when(F.col("id") % 97 == 0, None)
                      .otherwise(F.col("id") * 7)))
    # one task per bucket -> one file per key range, deterministic
    df.repartition(N_FILES, "bucket").write.mode("overwrite").parquet(d)
    assert len([f for f in os.listdir(d) if f.endswith(".parquet")]) > 1
    return d


def _assert_same(a, b, cols):
    ra = sorted(tuple(r) for r in a.select(*cols).collect())
    rb = sorted(tuple(r) for r in b.select(*cols).collect())
    assert ra == rb


def test_inlist_pruned_equals_full_and_prunes(spark, table, tmp_path):
    idx = str(tmp_path / "idx")
    meta = build_scan_index(spark, table, "key", idx, fpr=0.001)
    assert meta["n_files"] >= 2
    # keys from two distant ranges + absent keys (not multiples of 7)
    probe = [0, 7, 70, 7 * (N_ROWS - 1), 3, 5, 9999991]
    full = spark.read.parquet(table).where(F.col("key").isin(probe))
    pruned = pruned_read(spark, table, idx, values=probe)
    _assert_same(full, pruned, ["id", "key", "name"])

    kept, stats = prune_candidates(spark, idx, values=probe)
    assert kept is not None
    # present keys live in exactly 2 of the clustered files; a few Bloom
    # false positives are allowed, a full keep is not
    assert 1 <= stats["n_kept"] <= meta["n_files"] // 2


def test_absent_keys_prune_everything(spark, table, tmp_path):
    idx = str(tmp_path / "idx")
    build_scan_index(spark, table, "key", idx, fpr=0.001)
    # in-range but absent (non-multiples of 7): min/max can't help,
    # only the Blooms can — at fpr 1e-3 all files pruned w.h.p.
    probe = [1, 2, 3, 4, 5, 6, 8, 9]
    kept, stats = prune_candidates(spark, idx, values=probe)
    assert kept is not None and stats["n_kept"] <= 2
    out = pruned_read(spark, table, idx, values=probe)
    assert out.count() == 0
    assert out.columns == spark.read.parquet(table).columns


def test_range_pruning_equals_full(spark, table, tmp_path):
    idx = str(tmp_path / "idx")
    build_scan_index(spark, table, "key", idx, fpr=0.01)
    lo, hi = 7 * 100, 7 * 260  # spans a file boundary
    full = spark.read.parquet(table).where(
        (F.col("key") >= lo) & (F.col("key") <= hi))
    pruned = pruned_read(spark, table, idx, lo=lo, hi=hi)
    _assert_same(full, pruned, ["id", "key"])
    kept, stats = prune_candidates(spark, idx, lo=lo, hi=hi)
    assert kept is not None and 1 <= stats["n_kept"] <= 3


def test_wide_predicate_falls_back_to_full_scan(spark, table, tmp_path):
    idx = str(tmp_path / "idx")
    build_scan_index(spark, table, "key", idx, fpr=0.01)
    kept, stats = prune_candidates(spark, idx, lo=0, hi=7 * N_ROWS)
    assert kept is None and stats["kept_fraction"] == 1.0
    # pruned_read still answers correctly through the fallback
    n = pruned_read(spark, table, idx, lo=0, hi=7 * N_ROWS).count()
    assert n == N_ROWS


def test_string_column_index(spark, table, tmp_path):
    idx = str(tmp_path / "idx")
    build_scan_index(spark, table, "name", idx, fpr=0.001)
    probe = ["u0", "u4242", "nope", "u999999"]
    full = spark.read.parquet(table).where(F.col("name").isin(probe))
    pruned = pruned_read(spark, table, idx, values=probe)
    _assert_same(full, pruned, ["id", "key", "name"])
    assert pruned.count() == 2


def test_nullable_column_zero_false_negatives(spark, table, tmp_path):
    # key_n has nulls: Arrow promotes its batches to float64 — the
    # pinned hash domain must keep build and probe recipes equal, and
    # IN must still never match the nulls
    idx = str(tmp_path / "idx")
    build_scan_index(spark, table, "key_n", idx, fpr=0.001)
    probe = [7 * 5, 7 * 4000, 11]
    full = spark.read.parquet(table).where(F.col("key_n").isin(probe))
    pruned = pruned_read(spark, table, idx, values=probe)
    _assert_same(full, pruned, ["id", "key_n"])
    assert pruned.count() == full.count() >= 1


def test_meta_and_fpr_accounting(spark, table, tmp_path):
    idx = str(tmp_path / "idx")
    meta = build_scan_index(spark, table, "key", idx, fpr=0.01)
    assert meta["coltype"] == "bigint"
    assert meta["max_rows"] >= N_ROWS // N_FILES
    assert expected_file_fpr(meta) <= 0.015  # sized at target
    assert os.path.exists(os.path.join(idx, "index.parquet"))
    assert os.path.exists(os.path.join(idx, "meta.json"))
