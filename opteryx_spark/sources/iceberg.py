"""Iceberg catalog configuration helper.

Reference parity: ``opteryx/connectors/iceberg_connector.py`` (Iceberg
tables with snapshot time travel, the ``Diachronic`` capability).  Spark
reads Iceberg natively once the runtime jar + catalog conf are present;
this module produces the builder configuration and the time-travel SQL.

The Iceberg runtime jar is not available in this container, so there is
deliberately no import-time dependency: :func:`catalog_conf` returns the
config dict to feed ``SparkSession.builder``, and :func:`time_travel_sql`
renders the ``FOR SYSTEM_TIME AS OF`` / ``VERSION AS OF`` statements Spark
executes against a configured catalog.
"""

from __future__ import annotations


def catalog_conf(
    name: str = "iceberg",
    catalog_type: str = "hadoop",
    warehouse: str | None = None,
    uri: str | None = None,
) -> dict[str, str]:
    """Builder conf for an Iceberg catalog (hadoop/hive/rest)."""
    base = f"spark.sql.catalog.{name}"
    conf = {
        base: "org.apache.iceberg.spark.SparkCatalog",
        f"{base}.type": catalog_type,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }
    if warehouse:
        conf[f"{base}.warehouse"] = warehouse
    if uri:
        conf[f"{base}.uri"] = uri
    return conf


def time_travel_sql(table: str, timestamp: str | None = None, snapshot_id: int | None = None) -> str:
    """SELECT with Iceberg time travel (reference temporal `FOR` on
    Iceberg resolves to snapshots, ``iceberg_connector.py:122``)."""
    if timestamp is not None:
        return f"SELECT * FROM {table} TIMESTAMP AS OF '{timestamp}'"
    if snapshot_id is not None:
        return f"SELECT * FROM {table} VERSION AS OF {snapshot_id}"
    return f"SELECT * FROM {table}"
