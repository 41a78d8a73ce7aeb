"""Incremental sketch-table maintenance: a persistent ``(keys -> sketch)``
parquet table updated delta-by-delta, never rescanning history.

This is the production pattern mergeable sketches exist for (the reference
states it as the point of the serialized aggregator contract,
``HyperLogLogPlusPlus.java:60-96``: serialize partial state, merge later):
at 10^12-turn scale you cannot re-aggregate the full history when a day of
data arrives. Instead a snapshot table holds one serialized sketch per key
group; each arriving delta is sketched alone (one scan of the delta only)
and merged into the snapshot (one shuffle on the key columns, prior rows +
delta partials co-located by key). Cost per update is O(delta + n_keys),
independent of history size.

Storage layout (parquet stand-in for an Iceberg snapshot table, same seam
note as ``operators/checkpoint.py``)::

    table_dir/
      v00001/…parquet        keys…, sketch binary, rows_seen long
      v00002/…parquet
      snapshots.jsonl        append-only: version, applied fingerprints, ts
      LATEST                 commit pointer — written last, atomically

Crash safety: a version directory is garbage until ``LATEST`` names it.
``update`` writes the new version's parquet first, then appends the
snapshot record, then atomically replaces ``LATEST``; a crash anywhere
before that last rename leaves the previous snapshot fully readable, and
the next update writes to a fresh version number (max existing dir + 1),
never reusing the orphan.

Idempotence: pass ``fingerprint`` (e.g. the delta's
``checkpoint.input_fingerprint`` or an Iceberg snapshot id) and a replayed
delta becomes a no-op — exactly-once table state under at-least-once
delivery of update jobs.
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from zetasketch_spark.operators.agg import (
    PARTITION_COL,
    ROWS_COL,
    SKETCH_COL,
    sketch_merge,
    sketch_partial,
    sketch_result,
)
from zetasketch_spark.sketches.base import SketchFamily

_VDIR = re.compile(r"v(\d{5})$")


class SketchTable:
    """A versioned parquet table of serialized sketch states per key group.

    One instance = one (keys, value column, family) aggregation identity.
    ``update`` folds a delta DataFrame in; ``read`` returns the latest
    snapshot as ``keys… , sketch, rows_seen``; ``results`` extracts the
    family's result fields (estimates stay exact across any delta split —
    merge associativity is the core sketch contract).
    """

    def __init__(self, table_dir: str, keys: list[str], col: str,
                 family: SketchFamily):
        self.table_dir = table_dir
        self.keys = list(keys)
        self.col = col
        self.family = family
        os.makedirs(table_dir, exist_ok=True)

    # -- snapshot bookkeeping -------------------------------------------

    def latest_version(self) -> int:
        """Committed version (0 = empty table). Only ``LATEST`` counts:
        orphan v-dirs from a crashed writer are invisible."""
        p = os.path.join(self.table_dir, "LATEST")
        if not os.path.exists(p):
            return 0
        with open(p) as f:
            return int(f.read().strip())

    def _next_version(self) -> int:
        """1 + max over ALL version dirs (committed or orphaned) so a
        rewrite after a crash never collides with a half-written dir."""
        versions = [0]
        for name in os.listdir(self.table_dir):
            m = _VDIR.fullmatch(name)
            if m:
                versions.append(int(m.group(1)))
        return max(versions) + 1

    def applied_fingerprints(self) -> set[str]:
        """Fingerprints folded into the committed snapshot chain."""
        committed = self.latest_version()
        out: set[str] = set()
        log = os.path.join(self.table_dir, "snapshots.jsonl")
        if os.path.exists(log):
            with open(log) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec["version"] <= committed:
                        out.update(rec.get("fingerprints", []))
        return out

    def _vpath(self, version: int) -> str:
        return os.path.join(self.table_dir, f"v{version:05d}")

    # -- core operations ------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame | None:
        """Latest committed snapshot (``keys…, sketch, rows_seen``), or
        None for an empty table."""
        v = self.latest_version()
        if v == 0:
            return None
        return spark.read.parquet(self._vpath(v))

    def update(self, spark: SparkSession, delta: DataFrame,
               fingerprint: str | None = None,
               tree_levels: int = 1) -> dict:
        """Fold ``delta`` into the table; returns a metrics dict.

        The plan scans ONLY the delta (stage-1 partials) plus the prior
        snapshot (already one compact row per key), then shuffles once on
        the key columns. ``tree_levels=2`` salts the merge for hot keys,
        same contract as ``sketch_agg``. With ``fingerprint`` set, a
        replay of an already-applied delta is a committed no-op.
        """
        t0 = time.time()
        applied = self.applied_fingerprints()
        if fingerprint is not None and fingerprint in applied:
            return {"version": self.latest_version(), "applied": False,
                    "reason": "fingerprint already applied",
                    "fingerprint": fingerprint}

        partials = sketch_partial(delta, self.keys, self.col, self.family)
        prior = self.read(spark)
        if prior is not None:
            # the prior snapshot is itself a valid partial per key; tag it
            # with a partition id outside the delta's range so the salted
            # merge treats it as one more state to fold in
            prior = prior.withColumn(PARTITION_COL, F.lit(-1).cast("int"))
            partials = partials.unionByName(prior)
        merged = sketch_merge(partials, self.keys, self.family,
                              tree_levels=tree_levels)

        version = self._next_version()
        vpath = self._vpath(version)
        merged.select(*self.keys, SKETCH_COL, ROWS_COL) \
              .write.mode("errorifexists").parquet(vpath)

        n_keys = spark.read.parquet(vpath).count()
        fingerprints = sorted(applied | ({fingerprint} if fingerprint else set()))
        with open(os.path.join(self.table_dir, "snapshots.jsonl"), "a") as f:
            f.write(json.dumps({"version": version,
                                "fingerprints": fingerprints,
                                "n_keys": n_keys,
                                "ts": time.time()}) + "\n")
        # commit point: snapshot becomes visible only now
        tmp = os.path.join(self.table_dir, "LATEST.tmp")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.table_dir, "LATEST"))
        return {"version": version, "applied": True, "n_keys": n_keys,
                "fingerprint": fingerprint,
                "seconds": round(time.time() - t0, 3)}

    def results(self, spark: SparkSession,
                keep_sketch: bool = False) -> DataFrame | None:
        """Extract the family's result fields from the latest snapshot."""
        snap = self.read(spark)
        if snap is None:
            return None
        return sketch_result(snap, self.family, keep_sketch=keep_sketch)
