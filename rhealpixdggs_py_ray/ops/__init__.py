"""Large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) — the operations a 100 TB pipeline needs
beyond the reference's grid queries.  All are Ray Data pipelines with
DuckDB-oracle parity where the math is SQL-expressible."""
