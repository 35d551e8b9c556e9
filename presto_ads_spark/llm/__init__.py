"""LLM training-data pipeline operators (BASELINE.json mandate, SURVEY M5).

Beyond Presto-parity: deduplication, similarity search, text analysis, and
multimodal column plumbing, built Spark-first over the ``documents`` and
``embeddings`` tables. Every deterministic operator here carries a DuckDB
oracle in queries/llm.py; hashing is md5-based so both engines compute
identical values.
"""

from . import dedup, similarity, text, multimodal, ml  # noqa: F401
