"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference repo (a Hadoop MapReduce implementation of
directed-triangle counting and path-2 cardinality over a Twitter follower
graph), re-expressed Spark-first, plus the large-scale training-data
pipeline extensions (dedup, similarity search, text analysis, multimodal
plumbing, streaming).

Layout
------
- ``session``    : SparkSession factory (AQE on, tuned shuffle partitions)
- ``sources``    : typed readers/writers + the canonical ``edges`` derivation
- ``operators``  : graph core (triangles / path-2), dedup, similarity,
                   text analysis, relational/window demos, multimodal stubs
- ``functions``  : portable scalar/hash/vector expression helpers
- ``plans``      : reference-parity constants + plan-shape assertion helpers
- ``streaming``  : Structured Streaming variants
"""

__version__ = "0.1.0"
