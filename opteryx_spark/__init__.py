"""opteryx_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mabel-dev/opteryx, re-architected for
Spark (DataFrame/SQL/Catalyst) and 100 TB scale.

Public API (mirrors the reference's surface, ``opteryx/__init__.py``):

    import opteryx_spark as ox
    cur = ox.query("SELECT ...")          # DBAPI-style cursor
    tbl = ox.query_to_arrow("SELECT ...") # pyarrow.Table
    ox.register_df("name", pandas_df)      # join in-memory frames
    ox.register_store("prefix", root=...)  # mount a data store
"""

from __future__ import annotations

__version__ = "0.1.0"

apilevel = "2.0"  # PEP-249 (reference: opteryx/__init__.py:118-122)
threadsafety = 2
paramstyle = "named"

from opteryx_spark.cursor import Connection, Cursor, connect, query, query_to_arrow
from opteryx_spark.errors import (
    DatabaseError,
    DataError,
    Error,
    IntegrityError,
    InterfaceError,
    InternalError,
    NotSupportedError,
    OperationalError,
    ProgrammingError,
    Warning,  # noqa: A004 - PEP-249 name
)
from opteryx_spark.session import get_session
from opteryx_spark.sources import register_arrow, register_df, register_store

__all__ = [
    "Connection",
    "Cursor",
    "connect",
    "get_session",
    "query",
    "query_to_arrow",
    "register_arrow",
    "register_df",
    "register_store",
    "apilevel",
    "paramstyle",
    "threadsafety",
    "Warning",
    "Error",
    "InterfaceError",
    "DatabaseError",
    "DataError",
    "OperationalError",
    "IntegrityError",
    "InternalError",
    "ProgrammingError",
    "NotSupportedError",
]
