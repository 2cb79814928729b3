"""ozone_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of apache/ozone (reference surveyed in SURVEY.md).

The reference is a distributed object store whose query surface is:
key-space listings (scan/filter/sort/limit/paginate), Recon analytics
(histograms, namespace rollups, container indexes, health classification),
snapshot diffs, a CDC-driven incremental-view pipeline, and a rule/TTL
engine.  This package re-expresses each of those idiomatically as Spark
DataFrame programs plus Structured Streaming for the CDC plane, and adds
the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Layout:
    session    — tuned SparkSession builder (AQE, shuffle partitions, UTC)
    tables     — loaders for the driver's parquet tables + the derived
                 Ozone-shaped namespace views (keys/containers/replicas/...)
    operators/ — listing, scan, snapshot-diff, container, namespace-rollup,
                 insight and lifecycle operators (SURVEY.md §2)
    functions/ — scalar/bin/path/text/dedup/similarity function library
    streaming/ — CDC incremental view maintenance + windowed event analytics
    registry   — (name -> spark query, oracle SQL) pairs consumed by
                 __spark_entry__.py and the driver's correctness gate
"""

__version__ = "0.1.0"
