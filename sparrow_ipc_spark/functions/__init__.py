"""Training-data pipeline operators over document/transcript tables:
text analysis, deduplication (exact / minhash-LSH / simhash / n-gram
Jaccard), embedding similarity search, multimodal column plumbing.

All operators are DataFrame-native (JVM-side expressions inside
whole-stage codegen) except where vectorized pandas UDFs are genuinely
required (embedding math fallbacks, multimodal decode stubs).
"""

from sparrow_ipc_spark.functions import dedup, multimodal, similarity, text  # noqa: F401
