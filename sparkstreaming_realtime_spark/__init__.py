"""PySpark-native analytics engine with the query and data-processing
capabilities of YetZH/SparkStreaming-realtime, re-expressed Spark-first.

The reference (surveyed in SURVEY.md) is a Lambda-architecture
real-time warehouse: Kafka DStream jobs + Redis state + Elasticsearch
serving. This package re-expresses every capability on the DataFrame /
SQL / Catalyst / Structured Streaming stack:

- ``schemas``     : schema registry for every reference bean (SURVEY §1.2)
- ``session``     : SparkSession factory + table loading
- ``functions``   : scalar helpers (ES-style match, date/hour, age-as-of,
                    deterministic hashing, vector math)
- ``operators``   : batch operators — log split, CDC routing, DAU
                    pipeline, order wide-table, dedup family, similarity
                    search, text analysis, multimodal plumbing
- ``plans``       : the query layer (the reference's REST/ES query
                    surface as engine functions) + the oracle registry
- ``sources``     : batch/stream source helpers (files, kafka)
- ``streaming``   : Structured Streaming pipelines (watermark dedup,
                    stream-stream join, idempotent sinks)

Design rules (see SURVEY §7): DataFrame-first, no RDDs; let Catalyst
optimize; broadcast small dims; Pandas UDFs only where built-ins can't
express the semantics; every operator designed for a 1000-executor /
100 TB deployment even though tests run on local[32].
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
