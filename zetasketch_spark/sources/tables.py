"""TableIO seam: Iceberg when the runtime has it, partitioned Parquet
otherwise (this sandbox has no network to fetch the Iceberg jar).

The north_rule targets Iceberg tables partitioned by ``days(ts)``; both
paths present the same API so the engine code never branches. Snapshot /
resume semantics on the Parquet path are provided by the checkpoint table
(`zetasketch_spark.operators.checkpoint`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j package access is lazy/truthy; force a real classload
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")  # noqa: SLF001
        return True
    except Exception:
        return False


class TableIO:
    """Read/write tables by name against a root (catalog or directory)."""

    def __init__(self, spark: SparkSession, root: str, use_iceberg: bool | None = None,
                 namespace: str | None = None):
        self.spark = spark
        self.root = root.rstrip("/")
        self.use_iceberg = iceberg_available(spark) if use_iceberg is None else use_iceberg
        #: explicit Iceberg catalog.namespace — identifiers must never be
        #: derived from a filesystem path (an absolute root would yield a
        #: leading-dot identifier no catalog accepts)
        self.namespace = namespace

    def _path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def _identifier(self, name: str) -> str:
        # Iceberg table identifiers are dot-separated (catalog.db.table)
        if not self.namespace:
            raise ValueError(
                "TableIO on the Iceberg path needs an explicit namespace, "
                "e.g. TableIO(spark, root, namespace='local.db')")
        return f"{self.namespace}.{name}"

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.format("iceberg").load(self._identifier(name))
        path = self._path(name)
        import os

        # accept either layout: a directory written by write(), or a
        # single-file '<name>.parquet' (the driver's testdata convention)
        if not os.path.exists(path) and os.path.exists(path + ".parquet"):
            path = path + ".parquet"
        return self.spark.read.parquet(path)

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None,
              mode: str = "append") -> None:
        if self.use_iceberg:
            ident = self._identifier(name)
            w = df.writeTo(ident)
            if mode == "append":
                if self.spark.catalog.tableExists(ident):
                    w.append()
                else:  # first append creates the table (with partition spec)
                    if partition_by:
                        w = w.partitionedBy(*[F.col(c) for c in partition_by])
                    w.create()
            else:
                if partition_by:  # partition spec is set at table creation
                    w = w.partitionedBy(*[F.col(c) for c in partition_by])
                w.createOrReplace()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def snapshot_id(self, name: str) -> int | None:
        """Current Iceberg snapshot id (None on the parquet path)."""
        if not self.use_iceberg:
            return None
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self._identifier(name)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1").collect()
        return int(rows[0][0]) if rows else None

    def input_fingerprint(self, name: str) -> str:
        """Checkpoint identity of the table's CURRENT contents.

        Iceberg path: the snapshot id — exact, O(1), and stable across
        replicas of the same snapshot (the lakehouse-native resume key).
        Parquet path: the file-listing fingerprint (name, size, mtime)
        from ``operators.checkpoint.input_fingerprint``.

        Feed this to ``checkpointed_sketch_agg(...,
        input_fingerprint_override=...)`` so resume identity follows the
        table, not the directory listing."""
        if self.use_iceberg:
            return f"iceberg:{self._identifier(name)}:{self.snapshot_id(name)}"
        import os

        from zetasketch_spark.operators.checkpoint import input_fingerprint

        path = self._path(name)
        if not os.path.exists(path) and os.path.exists(path + ".parquet"):
            path = path + ".parquet"
        return input_fingerprint([path])


def with_day(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Add the day-bucket column used for time-partitioned aggregation
    (the parquet stand-in for Iceberg's ``days(ts)`` partition transform)."""
    return df.withColumn("day", F.to_date(F.col(ts_col)))
