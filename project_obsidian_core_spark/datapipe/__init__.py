"""Large-scale training-data pipeline operators (SURVEY §7.2 phase 5).

Beyond reference parity: deduplication, similarity search, text analysis and
multimodal plumbing over the `documents` / `embeddings` tables. Everything is
expressed with built-in pyspark.sql.functions (JVM-side, codegen-friendly);
Python never touches row data except in the clearly-marked multimodal decode
stubs (`mapInPandas`).
"""
