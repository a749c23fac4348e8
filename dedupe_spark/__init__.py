"""dedupe_spark — a PySpark-native record-linkage / dedup analytics engine.

A from-scratch reimplementation of the capabilities of zeveck/dedupe
(reference at /root/reference) as an idiomatic Spark pipeline:

    scan -> fingerprint (Arrow/pandas UDF) -> blocking (exact sha +
    MinHash-LSH bands) -> pairwise scoring (bit_count Hamming + MinHash
    Jaccard, consensus voting) -> iterative hash-min connected components
    -> representative selection (window argmax) -> outputs + metrics.

The reference is a single-threaded Python loop over image files
(hash_generator.py, duplicate_detector.py); this engine expresses the same
semantics as DataFrame transformations so Catalyst/Tungsten plan the
physical execution and the job scales horizontally.
"""

from dedupe_spark.config import PipelineConfig
from dedupe_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["PipelineConfig", "get_spark", "__version__"]
