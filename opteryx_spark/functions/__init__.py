"""Scalar-function parity layer (SURVEY.md §2.8 gap list).

Most of the reference's ~140-function catalog maps 1:1 to Spark built-ins
(``opteryx/functions/__init__.py:508-656`` vs ``pyspark.sql.functions``).
This module provides the remainder:

- Column-expression helpers (JVM-side, codegen-friendly) for functions
  Spark spells differently or lacks as a single call;
- ``register_sql_functions(spark)`` exposing them to SQL queries through
  the cursor, implemented as pandas UDFs only where an expression cannot
  express the semantics (base85, humanize, IP-in-CIDR).

UDF policy at 100 TB: expression > pandas_udf > (never) row Python UDF.

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers
eval types from *runtime* annotations; stringified hints break it.
"""

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- expression-only helpers ------------------------------------------------


def ifnotnull(cond: Column, value: Column) -> Column:
    """Reference IFNOTNULL (``functions/__init__.py:597-606``)."""
    return F.when(cond.isNotNull(), value).otherwise(F.lit(None))


def iif(cond: Column, if_true: Column, if_false: Column) -> Column:
    return F.when(cond, if_true).otherwise(if_false)


def search(col: Column, needle: str) -> Column:
    """Reference SEARCH: case-insensitive containment."""
    return F.lower(col).contains(needle.lower())


def min_max(col: Column) -> Column:
    """Reference MIN_MAX aggregate → struct(min, max)."""
    return F.struct(F.min(col).alias("min"), F.max(col).alias("max"))


def product(col: Column) -> Column:
    """Reference PRODUCT aggregate via sign-tracked exp-sum-log.

    Distributive (partial-aggregatable) and JVM-side; exact only to double
    precision, like the reference's float fold.
    """
    absval = F.abs(col)
    log_sum = F.sum(F.when(absval > 0, F.log(absval)).otherwise(F.lit(0.0)))
    zeros = F.sum(F.when(col == 0, 1).otherwise(0))
    negs = F.sum(F.when(col < 0, 1).otherwise(0))
    sign = F.when(negs % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    # all-NULL group -> NULL (count = 0), like every other SQL aggregate
    return F.when(F.count(col) == 0, F.lit(None).cast("double")).when(
        zeros > 0, F.lit(0.0)
    ).otherwise(sign * F.exp(log_sum))


def date_diff_interval(end: Column, start: Column) -> Column:
    """Reference date−date → INTERVAL semantics
    (``binary_operators.py:173-191``): returns a day-time interval.
    Plain column subtraction — date/timestamp minus resolves to an
    interval natively (no string round-trip, Connect-compatible)."""
    return end - start


def time_bucket(ts: Column, width: str = "1 hour") -> Column:
    """Reference TIME_BUCKET (``functions/date_functions.py``) via the
    built-in window() start — streaming-compatible."""
    return F.window(ts, width)["start"]


def levenshtein_ratio(a: Column, b: Column) -> Column:
    dist = F.levenshtein(a, b).cast("double")
    longest = F.greatest(F.length(a), F.length(b)).cast("double")
    # two empty strings are identical: 1.0, not 0/0
    return F.when(longest == 0, F.lit(1.0)).otherwise(F.lit(1.0) - dist / longest)


# --- pandas-UDF-backed gap functions ---------------------------------------


def _make_pandas_udfs():
    import base64

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def base85_encode(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: base64.b85encode(v.encode() if isinstance(v, str) else v).decode()
            if v is not None
            else None
        )

    @pandas_udf("string")
    def base85_decode(s: pd.Series) -> pd.Series:
        def _d(v):
            if v is None:
                return None
            try:
                return base64.b85decode(v).decode()
            except (ValueError, UnicodeDecodeError):
                return None  # malformed input yields NULL, not a task abort

        return s.map(_d)

    @pandas_udf("string")
    def humanize(n: pd.Series) -> pd.Series:
        def _h(v):
            if v is None or pd.isna(v):
                return None
            for unit, div in (("billion", 1e9), ("million", 1e6), ("thousand", 1e3)):
                if abs(v) >= div:
                    return f"{v / div:.1f} {unit}"
            return f"{v:.0f}"

        return n.astype("float64").map(_h)

    @pandas_udf("boolean")
    def ip_in_cidr(ip: pd.Series, cidr: pd.Series) -> pd.Series:
        # reference semantics (compiled/list_ops/list_ip_in_cidr.pyx:46):
        # (ip & netmask) == base_ip with the base NOT normalized — a CIDR
        # whose base has host bits set matches nothing, it is not an error
        import socket
        import struct

        def _in(row):
            ip_v, cidr_v = row
            if ip_v is None or cidr_v is None:
                return None
            try:
                base_s, mask_s = str(cidr_v).split("/", 1)
                bits = int(mask_s)
                if not 0 <= bits <= 32:
                    return None
                netmask = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF if bits else 0
                base = struct.unpack("!I", socket.inet_aton(base_s))[0]
                ip_int = struct.unpack("!I", socket.inet_aton(str(ip_v)))[0]
                return (ip_int & netmask) == base
            except (ValueError, OSError):
                return None

        return pd.Series(map(_in, zip(ip, cidr)))

    @pandas_udf("string")
    def soundex_udf(s: pd.Series) -> pd.Series:
        # Spark has soundex built-in; this exists only for SQL registration
        # symmetry in environments where expressions are preferred.
        codes = {
            **dict.fromkeys("BFPV", "1"),
            **dict.fromkeys("CGJKQSXZ", "2"),
            **dict.fromkeys("DT", "3"),
            "L": "4",
            **dict.fromkeys("MN", "5"),
            "R": "6",
        }

        def _sx(v):
            if not v:
                return None
            v = v.upper()
            out = v[0]
            prev = codes.get(v[0], "")
            for ch in v[1:]:
                code = codes.get(ch, "")
                if code and code != prev:
                    out += code
                prev = code if ch not in "HW" else prev
                if len(out) == 4:
                    break
            return (out + "000")[:4]

        return s.map(_sx)

    from typing import Union

    @pandas_udf("boolean")
    def opx_search(col: Union[pd.Series, pd.DataFrame], needle: pd.Series) -> pd.Series:
        """Reference SEARCH (``functions/other_functions.py:27``): adapts to
        the field type — case-insensitive substring on strings, member
        containment on arrays, any-value containment on structs (struct
        columns arrive as a pandas DataFrame per Arrow batch)."""
        import numpy as np

        def _s(v, n):
            if v is None or n is None:
                return None
            n_l = str(n).lower()
            if isinstance(v, dict):
                v = list(v.values())
            if isinstance(v, (list, tuple, np.ndarray)):
                return any(e is not None and n_l in str(e).lower() for e in v)
            return n_l in str(v).lower()

        def _isnull(x):
            # pd.isna on an array-valued field returns an array -> bool()
            # ambiguity; any container is by definition non-null
            if isinstance(x, (list, tuple, dict, np.ndarray)):
                return False
            return x is None or pd.isna(x)

        if isinstance(col, pd.DataFrame):  # struct input
            vals = [
                None if all(_isnull(x) for x in row) else list(row)
                for row in col.itertuples(index=False)
            ]
        else:
            vals = list(col)
        return pd.Series([_s(v, n) for v, n in zip(vals, needle)], dtype="object")

    @pandas_udf("double")
    def opx_text_cosine(col: pd.Series, query: pd.Series) -> pd.Series:
        """Reference COSINE_SIMILARITY (``functions/other_functions.py:222``
        + ``compiled/functions/vectors.pyx``): lemmatized hashed-token
        1024-bin vectors, XXH3-64 positions, float32 cosine — exact value
        parity (see functions/textvec.py)."""
        from opteryx_spark.functions.textvec import cosine_similarities
        from opteryx_spark.virtual import _STOP_WORDS

        stops = frozenset(w.encode() for w in _STOP_WORDS)
        if len(col) == 0:
            return pd.Series([], dtype="float64")
        # the query side is a literal broadcast across the batch: group by
        # distinct query value so its vector is built once
        out = pd.Series([None] * len(col), dtype="object")
        null_q = query.isna()
        for qv in query[~null_q].unique():
            mask = (query == qv) & ~null_q
            out[mask] = cosine_similarities(list(col[mask]), qv, stops)
        # NULL query rows stay NULL (SQL propagation), never 0.0
        return out.astype("float64")

    return {
        "base85_encode": base85_encode,
        "base85_decode": base85_decode,
        "humanize": humanize,
        "ip_in_cidr": ip_in_cidr,
        "soundex_py": soundex_udf,
        "opx_search": opx_search,
        "opx_text_cosine": opx_text_cosine,
    }


_UDF_CACHE: dict | None = None


def register_sql_functions(spark) -> None:
    """Register the gap functions for SQL use (idempotent; the UDFs are
    built once per process and registered once per SparkSession, not per
    cursor).  The registered marker lives ON the session object — a plain
    ``id(spark)`` set would mis-skip registration when a stopped session
    is garbage-collected and a new one lands at the same address.
    Re-registration after a re-wrapped session (same JVM session, new
    Python wrapper) is harmless: ``udf.register`` overwrites."""
    global _UDF_CACHE
    if getattr(spark, "_oxs_udfs_registered", False):
        return
    if _UDF_CACHE is None:
        _UDF_CACHE = _make_pandas_udfs()
    for name, udf in _UDF_CACHE.items():
        spark.udf.register(name, udf)
    try:
        spark._oxs_udfs_registered = True
    except AttributeError:  # exotic session wrappers without __dict__
        pass


def match_against(col: Column, terms: list[str]) -> Column:
    """Reference MATCH ... AGAINST full-text predicate
    (``functions/__init__.py`` MATCH_AGAINST): true when every search
    term appears as a whitespace token of the document."""
    # same tokenizer as the SQL-path rewrite (dialect.py): split on
    # spaces AND commas so both implementations agree
    toks = F.split(F.lower(col), "[ ,]+")
    needles = F.array(*[F.lit(t.lower()) for t in terms])
    return F.forall(needles, lambda needle: F.array_contains(toks, needle))
