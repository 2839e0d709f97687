"""bpspark — PySpark-native analytics & ingestion engine.

A brand-new engine with the query and data-processing capabilities of the
reference module ``gravitonian/bp-metadata-ingestion`` (an Alfresco
book-metadata ZIP-ingestion pipeline; see SURVEY.md), rebuilt Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes; we don't hand-schedule)
- binary-file + Structured Streaming sources for the drop-folder model
- anti-join idempotency, semi-join validation, map-typed dynamic metadata
- the full relational operator surface (joins/aggs/windows/setops/functions)
- LLM-data-pipeline extensions: dedup (exact/MinHash/SimHash/embedding),
  similarity search, text analysis, multimodal column plumbing

Every operator is registered in :mod:`bpspark.registry` and exported through
``__spark_entry__.py`` with a DuckDB oracle where SQL-expressible.
"""

from bpspark.registry import all_ops, op, queries, oracle_sql  # noqa: F401

__version__ = "0.1.0"


def load_all() -> None:
    """Import every operator module so registrations are visible."""
    import bpspark.relational  # noqa: F401
    import bpspark.relational_ext  # noqa: F401
    import bpspark.layout  # noqa: F401
    import bpspark.analytics  # noqa: F401
    import bpspark.functions  # noqa: F401
    import bpspark.sources  # noqa: F401
    import bpspark.pipeline  # noqa: F401
    import bpspark.streaming  # noqa: F401
    import bpspark.llm_ops  # noqa: F401
    import bpspark.udfs  # noqa: F401
