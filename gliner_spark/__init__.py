"""gliner_spark — a from-scratch PySpark-native knowledge-graph construction
engine with the query/data-processing capabilities of the GLiNER reference
(span-based zero-shot NER → relation induction → entity linking →
canonicalization → graph materialization), re-expressed Spark-first.

Layout:
    kernel/     pure numpy/python reference-semantics oracle (no Spark)
    functions/  column-level helpers built on pyspark.sql.functions
    operators/  DataFrame→DataFrame operators (NER, relations, linking, dedup…)
    sources/    synthetic transcripts source, catalog (parquet w/ Iceberg probe)
    plans/      session builder + staged, lineage-tracked pipeline driver
    streaming/  Structured Streaming variants of the extraction stage
"""

__version__ = "0.1.0"
