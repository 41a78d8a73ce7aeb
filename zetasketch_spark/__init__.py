"""zetasketch_spark — PySpark-native distributed sketching.

The capabilities of google/zetasketch rebuilt Spark-first: mergeable,
serializable sketch state (HLL++ with reference wire-format parity,
Count-Min, KLL, t-digest, Bloom) updated in vectorized Arrow batches, with
explicit partial/merge aggregation pipelines, checkpointing, and streaming.
"""

from zetasketch_spark.hll import HllSketch, IncompatiblePrecisionError
from zetasketch_spark.sketches.base import (
    HllFamily,
    SketchFamily,
    get_family,
    register_family,
)

__all__ = [
    "HllSketch",
    "IncompatiblePrecisionError",
    "HllFamily",
    "SketchFamily",
    "get_family",
    "register_family",
    "__version__",
]

__version__ = "0.4.0"
