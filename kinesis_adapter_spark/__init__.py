"""kinesis_adapter_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the ``adzerk-oss/kinesis-adapter`` reference (an
S3→Kinesis streaming ETL adapter), extended with a full relational
operator surface and LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) per SURVEY.md §2.

NOTE ON CITATIONS: the reference snapshot at /root/reference was empty
at survey time (SURVEY.md §0.1), so no file:line citations into it are
possible. Docstrings cite SURVEY.md sections instead, which record the
reconstruction and the driver contract.

Design principles (SURVEY.md §7.1):
- DataFrame-first: every operator is declarative DataFrame/SQL; Catalyst
  picks physical strategies. Zero custom Catalyst rules.
- Streaming is Structured Streaming; the reference's scheduler/
  checkpoint/batcher/retry collapse into trigger policy +
  checkpointLocation + foreachBatch.
- UDFs only where built-ins can't express the semantics, and then
  Arrow-vectorized (pandas_udf / mapInPandas), never row-at-a-time in
  hot paths.
- Scale posture: partition/bucket by join keys, broadcast bounded dims,
  salt hot keys, no driver-side collect() in any operator path.
"""

from kinesis_adapter_spark.session import build_spark, prepare_session

__all__ = ["build_spark", "prepare_session"]
