"""SQL dialect shim: rewrite opteryx-dialect SQL into Spark SQL.

The reference does exactly this (string-level, pre-parse) for its own
non-standard syntax — ``opteryx/planner/sql_rewriter.py:38-57`` strips
comments and extracts the temporal ``FOR`` clause before the parser ever
sees the statement.  We adopt the same architecture: a small pure-string
pipeline in front of ``spark.sql``, so Catalyst still parses, analyzes
and optimizes the final statement.

Handled dialect deltas (SURVEY.md §7.1b):
- comments + multi-statement split
- temporal ``FOR <ts>`` / ``FOR DATES BETWEEN a AND b`` / ``FOR DATES
  SINCE x`` / ``FOR LAST n DAYS`` / ``FOR TODAY|YESTERDAY``
  (``sql_rewriter.py:50-57,115-120``) → returned as per-table time
  filters the executor applies to that table's time column
- JSON operators ``->``, ``->>``, ``@?`` (``binary_operators.py:25-80``)
  → ``get_json_object``
- array operators ``@>`` (overlap) / ``@>>`` (contains-all)
  (``ops.py:291-379``) → ``arrays_overlap`` / ``forall``
- ``$dataset`` virtual tables → registered view names
- quoted path / URL FROM targets → placeholder names the cursor mounts
- ``GENERATE_SERIES(...)`` table function → ``explode(sequence(...))``
- ``DISTINCT ON (cols)`` → ``row_number()`` window wrapper
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class RewriteResult:
    sql: str
    temporal_filters: dict[str, tuple[str, str]] = field(default_factory=dict)
    path_tables: dict[str, str] = field(default_factory=dict)  # view name -> path


# --- comments & statement split --------------------------------------------


def strip_comments(sql: str) -> str:
    out, i, n = [], 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in ("'", '"'):
            j = i + 1
            while j < n:
                if sql[j] == ch and not (j + 1 < n and sql[j + 1] == ch == "'"):
                    break
                j += 2 if sql[j] == ch else 1
            out.append(sql[i : j + 1])
            i = j + 1
        elif sql.startswith("--", i):
            i = sql.find("\n", i)
            i = n if i < 0 else i
        elif sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def split_statements(sql: str) -> list[str]:
    stmts, cur, i, n = [], [], 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in ("'", '"'):
            j = i + 1
            while j < n and sql[j] != ch:
                j += 1
            cur.append(sql[i : j + 1])
            i = j + 1
        elif ch == ";":
            s = "".join(cur).strip()
            if s:
                stmts.append(s)
            cur = []
            i += 1
        else:
            cur.append(ch)
            i += 1
    s = "".join(cur).strip()
    if s:
        stmts.append(s)
    return stmts


# --- temporal FOR clause ----------------------------------------------------

_FOR_PATTERNS = [
    # FROM <t> FOR DATES BETWEEN <a> AND <b>
    (
        re.compile(
            r"(FROM|JOIN)\s+([\w.$]+)(\s+(?:AS\s+)?\w+)?\s+FOR\s+DATES\s+BETWEEN\s+"
            r"('[^']*'|TODAY|YESTERDAY)\s+AND\s+('[^']*'|TODAY|YESTERDAY)",
            re.IGNORECASE,
        ),
        "between",
    ),
    (
        re.compile(
            r"(FROM|JOIN)\s+([\w.$]+)(\s+(?:AS\s+)?\w+)?\s+FOR\s+DATES\s+SINCE\s+"
            r"('[^']*'|TODAY|YESTERDAY)",
            re.IGNORECASE,
        ),
        "since",
    ),
    (
        re.compile(
            r"(FROM|JOIN)\s+([\w.$]+)(\s+(?:AS\s+)?\w+)?\s+FOR\s+LAST\s+(\d+)\s+DAYS",
            re.IGNORECASE,
        ),
        "last_days",
    ),
    (
        re.compile(
            r"(FROM|JOIN)\s+([\w.$]+)(\s+(?:AS\s+)?\w+)?\s+FOR\s+('[^']*'|TODAY|YESTERDAY)",
            re.IGNORECASE,
        ),
        "point",
    ),
]


def _norm_date(tok: str) -> str:
    up = tok.upper()
    if up == "TODAY":
        return "current_date()"
    if up == "YESTERDAY":
        return "date_sub(current_date(), 1)"
    return f"CAST({tok} AS TIMESTAMP)"


def extract_temporal(sql: str) -> tuple[str, dict[str, tuple[str, str]]]:
    """Strip ``FOR ...`` temporal clauses; return per-table (start, end)
    filter expressions (as Spark SQL fragments)."""
    filters: dict[str, tuple[str, str]] = {}

    def handle(kind):
        def sub(m):
            kw, table, alias = m.group(1), m.group(2), m.group(3) or ""
            if kind == "between":
                filters[table] = (_norm_date(m.group(4)), _norm_date(m.group(5)))
            elif kind == "since":
                filters[table] = (_norm_date(m.group(4)), "NULL")
            elif kind == "last_days":
                filters[table] = (f"date_sub(current_date(), {m.group(4)})", "NULL")
            else:
                filters[table] = (_norm_date(m.group(4)), _norm_date(m.group(4)))
            return f"{kw} {table}{alias}"

        return sub

    for pat, kind in _FOR_PATTERNS:
        sql = pat.sub(handle(kind), sql)
    return sql, filters


# --- operator rewrites ------------------------------------------------------

_ARROW2 = re.compile(r"([\w.\(\)]+)\s*->>\s*'([^']+)'")
_ARROW1 = re.compile(r"([\w.\(\)]+)\s*->\s*'([^']+)'")
_ATQ = re.compile(r"([\w.\(\)]+)\s*@\?\s*'([^']+)'")
_AT_ALL = re.compile(r"([\w.\(\)]+)\s*@>>\s*\(([^)]*)\)")
_AT_ANY = re.compile(r"([\w.\(\)]+)\s*@>\s*\(([^)]*)\)")
_DOLLAR = re.compile(r"\$(\w+)")
_GEN_SERIES = re.compile(
    r"(FROM|JOIN)\s+GENERATE_SERIES\s*\(([^)]*)\)(?:\s+(?:AS\s+)?(\w+)\s*(?:\(\s*(\w+)\s*\))?)?",
    re.IGNORECASE,
)
_PATH_FROM = re.compile(r"(FROM|JOIN)\s+'([^']+)'", re.IGNORECASE)
_DISTINCT_ON = re.compile(
    r"SELECT\s+DISTINCT\s+ON\s*\(([^)]*)\)\s*(.*?)\s+FROM\s+(.*?)(?:\s+ORDER\s+BY\s+(.*?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _json_path(key: str) -> str:
    return key if key.startswith("$") else f"$.{key}"


def rewrite_operators(sql: str) -> str:
    sql = _ATQ.sub(lambda m: f"(get_json_object({m.group(1)}, '{_json_path(m.group(2))}') IS NOT NULL)", sql)
    sql = _ARROW2.sub(lambda m: f"get_json_object({m.group(1)}, '{_json_path(m.group(2))}')", sql)
    sql = _ARROW1.sub(lambda m: f"get_json_object({m.group(1)}, '{_json_path(m.group(2))}')", sql)
    sql = _AT_ALL.sub(
        lambda m: f"forall(array({m.group(2)}), __e -> array_contains({m.group(1)}, __e))", sql
    )
    sql = _AT_ANY.sub(lambda m: f"arrays_overlap({m.group(1)}, array({m.group(2)}))", sql)
    return sql


def rewrite_virtual_datasets(sql: str) -> str:
    """``$planets`` → ``virtual_planets`` (views the cursor registers)."""
    return _DOLLAR.sub(lambda m: f"virtual_{m.group(1)}", sql)


def rewrite_generate_series(sql: str) -> str:
    def sub(m):
        kw, args = m.group(1), m.group(2)
        alias = m.group(3) or "series"
        col = m.group(4) or "generate_series"
        return f"{kw} (SELECT explode(sequence({args})) AS {col}) {alias}"

    return _GEN_SERIES.sub(sub, sql)


def extract_path_tables(sql: str) -> tuple[str, dict[str, str]]:
    """``FROM 'path/file.parquet'`` / ``FROM 's3://...'`` → named views."""
    paths: dict[str, str] = {}

    def sub(m):
        name = f"path_table_{len(paths)}"
        paths[name] = m.group(2)
        return f"{m.group(1)} {name}"

    return _PATH_FROM.sub(sub, sql), paths


def rewrite_distinct_on(sql: str) -> str:
    m = _DISTINCT_ON.match(sql.strip())
    if not m:
        return sql
    keys, proj, rest, order = m.group(1), m.group(2).strip(), m.group(3), m.group(4)
    order_clause = order if order else keys
    proj = proj or "*"
    return (
        f"SELECT {proj} FROM (SELECT *, row_number() OVER "
        f"(PARTITION BY {keys} ORDER BY {order_clause}) AS __rn FROM {rest}) "
        f"WHERE __rn = 1"
    )


# --- parameters -------------------------------------------------------------


def _sql_literal(v) -> str:
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"'{v.isoformat()}'"
    if isinstance(v, (list, tuple)):
        return "(" + ", ".join(_sql_literal(x) for x in v) + ")"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def bind_params(sql: str, params: dict | list | None) -> str:
    """Named (``:name``) or positional (``?``) parameter binding, applied
    post-rewrite as safe literal substitution (reference binds post-parse,
    ``planner/ast_rewriter.py:39-56``; string-level is the Spark analogue)."""
    if not params:
        return sql
    if isinstance(params, dict):
        for k in sorted(params, key=len, reverse=True):
            sql = re.sub(rf"[:@]{re.escape(k)}\b", _sql_literal(params[k]), sql)
        return sql
    for v in params:
        sql = sql.replace("?", _sql_literal(v), 1)
    return sql


# --- pipeline ---------------------------------------------------------------


def rewrite(sql: str, params: dict | list | None = None) -> RewriteResult:
    sql = strip_comments(sql)
    sql, temporal = extract_temporal(sql)
    sql, paths = extract_path_tables(sql)
    sql = rewrite_virtual_datasets(sql)
    sql = rewrite_generate_series(sql)
    sql = rewrite_operators(sql)
    sql = rewrite_distinct_on(sql)
    sql = bind_params(sql, params)
    return RewriteResult(sql=sql.strip(), temporal_filters=temporal, path_tables=paths)
