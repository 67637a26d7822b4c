"""dedupe_spark — a from-scratch PySpark-native record-linkage / dedup engine.

Re-expresses the semantics of the C++ storage-dedup reference (wawababe/Dedupe,
see /root/reference and SURVEY.md) as idiomatic Spark DataFrame stages:

    blocking keys (MinHash/LSH over normalized-text shingles)
        -> salted skew-aware candidate self-join with bloom pre-pruning
        -> vectorized pandas-UDF pair scoring (Jaro-Winkler / Levenshtein /
           token-Jaccard; cheap-predicate-first, mirroring blocks_cmp)
        -> thresholded edges -> large-star/small-star connected components
        -> cluster / membership / unique-turn registry tables with
           reconstruction, GC and metrics (the reference's package lifecycle).

All hot-path logic is JVM-side (pyspark.sql.functions) or Arrow-batched
pandas UDFs; no per-row Python anywhere.
"""

__version__ = "0.1.0"
