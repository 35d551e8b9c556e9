"""Engine facade — the rebuild's equivalent of Presto's query entry point.

Presto's lifecycle (SURVEY.md §3: /v1/statement → parse → analyze → plan →
optimize → fragment → schedule → execute) maps 1:1 onto what ``spark.sql``
already does (Catalyst parse/analyze/optimize + DAGScheduler stages), so the
engine is a thin facade: session management, catalog registration, the
Presto→Spark rewrite hook, and SET SESSION property translation
(reference: presto-main/.../SystemSessionProperties.java).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from . import catalog as _catalog
from .rewrite import rewrite
from .session import apply_runtime_conf, get_spark

# SET SESSION name → Spark conf key (subset of Presto's ~60 session props that
# have meaningful Spark equivalents; the rest are accepted and ignored with a
# warning, which matches how Presto treats unknown-catalog properties).
SESSION_PROPERTY_MAP: dict[str, str] = {
    "hash_partition_count": "spark.sql.shuffle.partitions",
    "join_distribution_type": "spark.sql.autoBroadcastJoinThreshold",  # see set_session
    "task_concurrency": "spark.sql.shuffle.partitions",
    "spill_enabled": "spark.sql.shuffle.spill",  # informational
    "query_max_memory": "spark.sql.adaptive.advisoryPartitionSizeInBytes",
}

_SET_SESSION_RE = re.compile(
    r"^\s*SET\s+SESSION\s+(\w+)\s*=\s*(.+?)\s*$", re.IGNORECASE | re.DOTALL
)
_SHOW_RE = re.compile(r"^\s*SHOW\s+(CATALOGS|SESSION)\s*$", re.IGNORECASE)


class Engine:
    """``engine.sql(text)`` — Presto-compatible SQL over Spark.

    >>> eng = Engine(sf_dir="/root/testdata/sf0.01")
    >>> eng.sql("SELECT count(*) AS n FROM lineitem").collect()
    """

    def __init__(
        self,
        spark: SparkSession | None = None,
        sf_dir: str | None = None,
        register_functions: bool = True,
    ) -> None:
        self.spark = spark or get_spark()
        apply_runtime_conf(self.spark)
        if sf_dir:
            _catalog.register_views(self.spark, sf_dir)
        if register_functions:
            from .functions import register_all

            register_all(self.spark)

    # -- statement entry point -------------------------------------------
    def sql(self, text: str) -> DataFrame:
        m = _SET_SESSION_RE.match(text)
        if m:
            return self.set_session(m.group(1), m.group(2).strip().strip("'"))
        m = _SHOW_RE.match(text)
        if m:
            return self._show(m.group(1).upper())
        return self.spark.sql(rewrite(text))

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    # -- session management ----------------------------------------------
    def set_session(self, name: str, value: str) -> DataFrame:
        if name.lower() == "join_distribution_type":
            # Presto: PARTITIONED disables broadcast; AUTOMATIC/BROADCAST use it.
            thr = "-1" if value.upper() == "PARTITIONED" else "10485760"
            self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        elif name.lower() in SESSION_PROPERTY_MAP:
            self.spark.conf.set(SESSION_PROPERTY_MAP[name.lower()], value)
        # Unknown properties are accepted and ignored (documented gap).
        return self.spark.range(0).select()

    # -- system / information_schema connectors (reference:
    #    presto-main/.../connector/system/, connector/informationSchema/) --
    def information_schema_columns(self) -> DataFrame:
        """information_schema.columns synthesized from the session catalog."""
        rows = []
        for tbl in self.spark.catalog.listTables():
            for col in self.spark.catalog.listColumns(tbl.name):
                rows.append(
                    (tbl.database or "default", tbl.name, col.name, col.dataType)
                )
        return self.spark.createDataFrame(
            rows, "table_schema string, table_name string, column_name string, data_type string"
        )

    def system_runtime_nodes(self) -> DataFrame:
        """system.runtime.nodes analogue from the Spark status tracker."""
        sc = self.spark.sparkContext
        infos = sc._jsc.sc().statusTracker().getExecutorInfos()  # JVM API
        rows = [
            (
                e.host(),
                e.numRunningTasks(),
                int(e.totalOnHeapStorageMemory()),
            )
            for e in infos
        ]
        return self.spark.createDataFrame(
            rows, "host string, running_tasks int, onheap_storage_bytes long"
        )

    # -- UDF registration (Plugin.getFunctions parity,
    #    reference presto-spi/.../Plugin.java:53) ------------------------
    def register_function(self, name: str, fn, return_type=None) -> None:
        """Register a user scalar function callable from SQL.

        Python UDFs are the slow path (SURVEY §2.4) — prefer
        ``register_sql_function`` for anything expressible as a Spark
        expression."""
        self.spark.udf.register(name, fn, return_type)

    def register_sql_function(self, create_stmt: str) -> None:
        """Register a SQL-bodied function (JVM-side, codegen-friendly)."""
        self.spark.sql(create_stmt)

    def _show(self, what: str) -> DataFrame:
        if what == "CATALOGS":
            return self.spark.createDataFrame(
                [(c.name,) for c in self.spark.catalog.listCatalogs()],
                "catalog string",
            )
        confs = [
            (k, self.spark.conf.get(k, None))
            for k in sorted(set(SESSION_PROPERTY_MAP.values()))
        ]
        return self.spark.createDataFrame(confs, "name string, value string")
