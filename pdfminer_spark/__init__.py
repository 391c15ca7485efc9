"""pdfminer_spark: a PySpark-native main-content extraction engine.

Re-implements the query/data-processing capabilities of euske/pdfminer
(text + layout extraction from PDF payloads) as vectorized stages over
Spark DataFrames, plus HTML boilerplate stripping and large-scale
training-data operators (dedup, similarity, text quality).

The document-local machinery (lexing, object parsing, content-stream
interpretation, layout analysis) lives in ``pdfminer_spark.pdf`` and is
invoked from Arrow-batched pandas UDFs in ``pdfminer_spark.spark``.
"""

__version__ = "0.1.0"
