"""Presto function-compatibility layer (SURVEY.md §2.4 / M2).

Reference inventory: presto-main/.../metadata/FunctionRegistry.java:418-660.
Three mechanisms, in order of preference:

1. *Pure renames* — handled in rewrite.py (zero runtime cost).
2. *SQL temp functions* (Spark 4 ``CREATE TEMPORARY FUNCTION … RETURN expr``)
   — expression-level shims that stay JVM-side inside whole-stage codegen;
   this is the default for everything expressible as a Spark expression.
3. *Python/pandas UDFs* — last resort (none needed so far; decode stubs for
   multimodal live in llm/multimodal.py).

``register_all(spark)`` installs the whole layer on a session; it is
idempotent and cheap, so the Engine calls it at construction.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .sql_udfs import SQL_FUNCTIONS
from .geospatial import GEOSPATIAL_SQL_FUNCTIONS
from . import datetime_compat  # noqa: F401  (re-export)


def register_all(spark: SparkSession) -> None:
    from .color import register_color_udfs
    from .geospatial import register_geospatial_python

    # geo_convex_hull must exist before st_convex_hull's body resolves
    register_geospatial_python(spark)
    for stmt in SQL_FUNCTIONS + GEOSPATIAL_SQL_FUNCTIONS:
        spark.sql(stmt)
    _register_python_udfs(spark)
    register_color_udfs(spark)


def _register_python_udfs(spark: SparkSession) -> None:
    """The (tiny) set of functions with no Spark-expression equivalent.
    Python UDFs — off the hot path by design; documented per function."""
    import unicodedata

    # Presto normalize(s[, form]) — Unicode normalization (NFC default).
    spark.udf.register(
        "normalize_unicode",
        lambda s, form="NFC": None if s is None else unicodedata.normalize(form, s),
        "string",
    )

    # Presto hmac_md5/sha1/sha256/sha512(varbinary, varbinary) -> varbinary
    # (VarbinaryFunctions.java hmacMd5/hmacSha1/hmacSha256/hmacSha512).
    # HMAC's keyed byte-level XOR has no Spark-expression form, so these are
    # Python UDFs; HMAC is never a hot-path analytic function, so the
    # serialization boundary is acceptable here.
    import hashlib
    import hmac as _hmac

    def _mk_hmac(algo):
        def fn(data, key):
            if data is None or key is None:
                return None
            return _hmac.new(bytes(key), bytes(data), algo).digest()

        return fn

    for name, algo in (
        ("hmac_md5", hashlib.md5),
        ("hmac_sha1", hashlib.sha1),
        ("hmac_sha256", hashlib.sha256),
        ("hmac_sha512", hashlib.sha512),
    ):
        spark.udf.register(name, _mk_hmac(algo), "binary")
