"""TableIO seam: parquet fallback read/write with day-partitioning (the
Iceberg stand-in; `iceberg_available` is False in this offline sandbox)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_tableio_roundtrip_partitioned(spark, transcripts_path, tmp_path):
    from zetasketch_spark.sources.tables import TableIO, iceberg_available, with_day
    from zetasketch_spark.sources.transcripts import load_transcripts

    assert iceberg_available(spark) is False  # offline sandbox
    io = TableIO(spark, str(tmp_path), use_iceberg=False)
    df = with_day(load_transcripts(spark, transcripts_path))
    io.write(df, "transcripts", partition_by=["day"], mode="overwrite")
    back = io.read("transcripts")
    assert back.count() == df.count()
    # partition pruning: a day filter reads only that partition's files
    one_day = back.select("day").distinct().limit(1).collect()[0]["day"]
    pruned = back.filter(F.col("day") == F.lit(one_day))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day" in plan.split("PartitionFilters")[1][:200]
