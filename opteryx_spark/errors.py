"""PEP-249 exception hierarchy (reference: opteryx exposes typed errors
on the module per DBAPI; ``opteryx/exceptions.py``)."""

from __future__ import annotations


class Warning(Exception):  # noqa: A001 - PEP-249 name
    pass


class Error(Exception):
    pass


class InterfaceError(Error):
    pass


class DatabaseError(Error):
    pass


class DataError(DatabaseError):
    pass


class OperationalError(DatabaseError):
    pass


class IntegrityError(DatabaseError):
    pass


class InternalError(DatabaseError):
    pass


class ProgrammingError(DatabaseError):
    """Bad SQL, missing table/column, mis-bound parameters."""


class NotSupportedError(DatabaseError):
    pass


def wrap_spark_error(exc: Exception) -> Error:
    """Map a PySpark exception onto the DBAPI hierarchy."""
    name = type(exc).__name__
    if name in ("ParseException", "AnalysisException"):
        return ProgrammingError(str(exc))
    if name in ("QueryExecutionException", "SparkRuntimeException"):
        return OperationalError(str(exc))
    return DatabaseError(str(exc))
