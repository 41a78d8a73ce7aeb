"""BigQuery-style sketch functions for DataFrame/SQL use.

ZetaSketch's production surface is BigQuery's ``HLL_COUNT.INIT`` /
``HLL_COUNT.MERGE_PARTIAL`` / ``HLL_COUNT.MERGE`` / ``HLL_COUNT.EXTRACT``
(see the reference README.md:22-27). This module mirrors that surface as
Spark functions, interoperable byte-for-byte with the engine's sketch
states (same ``AggregatorStateProto`` wire format):

* ``hll_init_agg(col, precision)``    — grouped-agg UDF: values -> sketch
* ``hll_merge_agg(sketch_col)``       — grouped-agg UDF: sketches -> sketch
* ``hll_estimate(sketch_col)``        — scalar UDF: sketch -> bigint
* ``register_sql(spark)``             — expose them to ``spark.sql`` as
  ``hll_merge_agg`` / ``hll_estimate``

The grouped-agg form shuffles raw values per group (Catalyst's own
aggregation path), which is the convenient-but-shuffle-heavy shape; for
10^12-row inputs use ``zetasketch_spark.operators.agg.sketch_agg`` (partial
sketches before the shuffle). The two produce byte-identical states —
asserted in tests — because merge is associative and order-insensitive
post-compact.

Usage::

    df.groupBy("role").agg(hll_init_agg("conv_id", 15).alias("sk"))
      .select("role", hll_estimate("sk"))
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf


def hll_init_agg(col, precision: int = 15, sparse_precision: int | None = None):
    """Grouped-aggregate: build an HLL++ sketch from a value column.
    Equivalent of BigQuery ``HLL_COUNT.INIT(col, precision)``."""

    @pandas_udf("binary")
    def _init(values: pd.Series) -> bytes:
        from zetasketch_spark.hll import HllSketch
        from zetasketch_spark.sketches.base import HllFamily

        fam = HllFamily(precision=precision, sparse_precision=sparse_precision)
        sk = fam.make()
        fam.update(sk, values)
        return sk.serialize()

    return _init(F.col(col) if isinstance(col, str) else col)


def hll_merge_agg(col):
    """Grouped-aggregate: merge serialized sketches. Equivalent of BigQuery
    ``HLL_COUNT.MERGE_PARTIAL``; compose with :func:`hll_estimate` for
    ``HLL_COUNT.MERGE``. Re-merging fine-grained sketches to coarser
    grouping levels is exact (sketch rollup property)."""

    @pandas_udf("binary")
    def _merge(states: pd.Series) -> bytes:
        from zetasketch_spark.hll import HllSketch

        acc = None
        for b in states:
            if b is None:
                continue
            sk = HllSketch.deserialize(bytes(b))
            if acc is None:
                acc = sk
            else:
                acc.merge(sk)
        return acc.serialize() if acc is not None else None

    return _merge(F.col(col) if isinstance(col, str) else col)


def _estimate_udf():
    # created lazily: pandas_udf needs an active SparkSession to parse the
    # return type, so module import must stay session-free
    @pandas_udf("long")
    def _estimate(states: pd.Series) -> pd.Series:
        from zetasketch_spark.hll import HllSketch

        return pd.Series([
            HllSketch.deserialize(bytes(b)).estimate() if b is not None else 0
            for b in states
        ])

    return _estimate


def hll_estimate(col):
    """Scalar: cardinality estimate from a serialized sketch. Equivalent of
    BigQuery ``HLL_COUNT.EXTRACT``."""
    return _estimate_udf()(F.col(col) if isinstance(col, str) else col)


def _num_values_udf():
    @pandas_udf("long")
    def _num_values(states: pd.Series) -> pd.Series:
        from zetasketch_spark.hll import HllSketch

        return pd.Series([
            HllSketch.deserialize(bytes(b)).num_values if b is not None else 0
            for b in states
        ])

    return _num_values


def hll_num_values(col):
    """Scalar: total values absorbed (`Aggregator.numValues`)."""
    return _num_values_udf()(F.col(col) if isinstance(col, str) else col)


def register_sql(spark) -> None:
    """Register the scalar/agg functions for use from ``spark.sql``."""
    spark.udf.register("hll_estimate", _estimate_udf())
    spark.udf.register("hll_num_values", _num_values_udf())

    @pandas_udf("binary")
    def _merge(states: pd.Series) -> bytes:
        from zetasketch_spark.hll import HllSketch

        acc = None
        for b in states:
            if b is None:
                continue
            sk = HllSketch.deserialize(bytes(b))
            if acc is None:
                acc = sk
            else:
                acc.merge(sk)
        return acc.serialize() if acc is not None else None

    spark.udf.register("hll_merge_agg", _merge)

    @pandas_udf("binary")
    def _init(values: pd.Series, precision: pd.Series) -> bytes:
        from zetasketch_spark.sketches.base import HllFamily

        p = int(precision.iloc[0]) if len(precision) else 15
        fam = HllFamily(precision=p)
        sk = fam.make()
        fam.update(sk, values)
        return sk.serialize()

    spark.udf.register("hll_init_agg", _init)

    # quantile-sketch surface: the same INIT / MERGE_PARTIAL / EXTRACT
    # triple over KLL states (fine-grain sketches re-merge exactly to
    # coarser groupings, like HLL)
    @pandas_udf("binary")
    def _kll_init(values: pd.Series, k: pd.Series) -> bytes:
        from zetasketch_spark.sketches.kll import KllSketch

        sk = KllSketch(k=int(k.iloc[0]) if len(k) else 200)
        sk.add_series(values.dropna().to_numpy(dtype="float64"))
        return sk.serialize()

    spark.udf.register("kll_init_agg", _kll_init)

    @pandas_udf("binary")
    def _kll_merge(states: pd.Series) -> bytes:
        from zetasketch_spark.sketches.kll import KllSketch

        acc = None
        for b in states:
            if b is None:
                continue
            sk = KllSketch.deserialize(bytes(b))
            if acc is None:
                acc = sk
            else:
                acc.merge(sk)
        return acc.serialize() if acc is not None else None

    spark.udf.register("kll_merge_agg", _kll_merge)

    @pandas_udf("double")
    def _kll_quantile(states: pd.Series, q: pd.Series) -> pd.Series:
        from zetasketch_spark.sketches.kll import KllSketch

        return pd.Series([
            KllSketch.deserialize(bytes(b)).quantile(float(qq))
            if b is not None else None
            for b, qq in zip(states, q)
        ])

    spark.udf.register("kll_quantile", _kll_quantile)
