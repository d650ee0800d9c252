"""Batch operators re-expressing the reference's DStream pipelines as
DataFrame transforms (SURVEY §2-3), plus the large-scale
training-data-pipeline extensions (dedup family, similarity search,
text analysis, multimodal plumbing).

Each module exposes pure ``DataFrame -> DataFrame`` functions so the
same logic binds to ``spark.read`` (batch) and ``spark.readStream``
(see ``streaming/``) — the Spark-first replacement for the
reference's duplicated per-app DStream wiring.
"""
