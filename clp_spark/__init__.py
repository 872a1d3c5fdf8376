"""clp_spark — a from-scratch, PySpark-native re-expression of CLP's
(gibber9809/clp) compress-then-search pipeline as a parse → enrich →
route → aggregate dataflow over web-page tables.

Reference semantics (studied, not copied) live in:
  - tokenizer rules:   /root/reference/components/core/src/clp/ir/parsing.cpp:20-88
  - encoded variables: /root/reference/components/core/src/clp/EncodedVariableInterpreter.cpp:25-198
  - logtype escaping:  /root/reference/components/core/src/clp/ir/parsing.inc, types.hpp:17-22
  - GLT-style routing: /root/reference/components/core/src/glt/streaming_archive/writer/LogtypeTable.hpp

Architecture is Spark-first: DataFrame/SQL plans optimized by Catalyst,
Arrow-vectorized pandas UDFs only for the tokenize/encode/decode hot path,
broadcast joins for dictionary enrich, salted repartitioning for
hot-logtype skew, parquet (zstd) sink tables partitioned by sink_id.
"""

__version__ = "0.1.0"
