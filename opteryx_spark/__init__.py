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


# Notebook cell magic (reference opteryx/__init__.py:297-314): in an
# IPython session, ``%%opteryx`` runs the cell body as a query through
# ``query()``.  Import-gated — a plain Python process skips silently.
try:  # pragma: no cover - needs a live IPython shell
    from IPython import get_ipython
    from IPython.core.magic import Magics, cell_magic, magics_class

    @magics_class
    class OpteryxSparkMagics(Magics):
        @cell_magic
        def opteryx(self, line, cell):
            import opteryx_spark

            result = opteryx_spark.query(cell)
            self.shell.push({"_opteryx_result": result})
            return result

    _ipython = get_ipython()
    if _ipython:
        _ipython.register_magics(OpteryxSparkMagics)
except (ImportError, ValueError, TypeError):  # pragma: no cover
    pass
