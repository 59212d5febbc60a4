"""Run the reference engine's own SQL shape batteries against this engine.

The reference ships ~2,300 battery statements as (sql, rows, cols,
expected_error) tuples (tests/integration/sql_battery/test_shapes_*.py).
This tool parses those files with ``ast`` at run time — no reference code
or data is copied into this repo — and executes every statement through
our DBAPI cursor, comparing row/column counts:

- expected success  → PASS iff our shape == the reference's shape
- expected error    → PASS iff we raise an opteryx_spark error; if we
  *succeed* instead the statement lands in ``extra_support`` (we accept
  SQL the reference rejects — e.g. INTERSECT) — reported, not failed
- statements touching surfaces this engine doesn't ship locally
  (sqlite./testdata./iceberg. datasets, $derived) are SKIPPED and listed
- statements whose row count is engine-local by nature (EXPLAIN plan
  lines, the $variables inventory) are checked on COLUMN count only and
  land in ``cols_only`` buckets; everything on the packaged virtual
  datasets is fully value-checked since they carry the same data the
  reference ships (per-dataset licenses: see opteryx_spark/virtual.py)

Usage:
    python tools/reference_battery.py [file_glob ...]   # default: all
Writes REFERENCE_BATTERY.json next to the repo root and prints a summary.
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATTERY_DIR = "/root/reference/tests/integration/sql_battery"

# Surfaces that genuinely cannot run here.  The reference checkout ships
# its fixture datasets read-only at /root/reference/testdata — those run
# via a registered store (see _register_fixture_stores); only the
# following stay skipped:
# - iceberg.*: needs the Iceberg runtime jar (not in this container)
# - testdata.flat.formats.* / testdata.tweets: derived from a 100k-row
#   tweets.jsonl the checkout does NOT ship (flat/formats holds only the
#   psv sample and the build script; flat/tweets is a 50-row sample)
# - HTTP(: live-endpoint table function (unit-tested against a local
#   server instead)
#
# ``@?`` explicit-null semantics (``nested @? '$.level1.key'`` counts a
# key explicitly set to JSON null as existing): resolved — statements
# containing ``@?`` on a jsonl-backed dataset read through a shadow
# relation that keeps the raw line as a VARIANT column, and the operator
# becomes ``variant_get(__variant, path) IS NOT NULL`` (SQL NULL for a
# missing path, non-null variant-null for an explicit null).  Every other
# accessor keeps the plain struct read (``rewriter.finalize_atq``,
# ``sources/registry.py::read_json_variant``).
# (reason, pattern): the reason keys the self-explaining ``skip_reasons``
# breakdown emitted into REFERENCE_BATTERY.json — "iceberg-jar" and
# "missing-fixture-data" are PERMANENT environment limits (no runtime jar
# in the container / source data the checkout does not ship), not debt.
_SKIP_PATTERNS = [
    ("iceberg-jar", re.compile(r"\biceberg\.", re.I)),
    ("missing-fixture-data", re.compile(r"\btestdata\.tweets\b", re.I)),
    ("missing-fixture-data", re.compile(r"\$derived\b")),
    ("live-http-endpoint", re.compile(r"\bHTTP\s*\(", re.I)),
]
# flat/formats (parquet/arrow/csv/tsv) and flat/different no longer skip:
# tools/make_fixtures.py synthesizes shape-twin datasets satisfying every
# pinned predicate count and overlays them (symlink farm) on the shipped
# read-only testdata — see its module docstring for the constraint list.

_FIXTURES = "/root/reference/testdata"


def _build_sqlite_fixture() -> str:
    """Build the sqlite twin of the reference's fixture DB (the checkout
    ships only the loader script, not database.db) from the SHIPPED
    planets/satellites parquet — same rows the reference loads."""
    import sqlite3

    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    db_dir = os.path.join(repo, ".data", "sqlite")
    os.makedirs(db_dir, exist_ok=True)
    db = os.path.join(db_dir, "database.db")
    if os.path.exists(db):
        return db
    con = sqlite3.connect(db)
    for table, src in (
        ("planets", f"{_FIXTURES}/planets/planets.parquet"),
        ("satellites", f"{_FIXTURES}/satellites/satellites.parquet"),
    ):
        pq.read_table(src).to_pandas().to_sql(table, con, index=False)
    con.close()
    return db


def _overlay_root() -> str:
    from make_fixtures import ensure as _ensure_fixture_overlay

    return _ensure_fixture_overlay()


def _register_fixture_stores() -> None:
    from opteryx_spark.sources.registry import register_store

    register_store("testdata", root=_overlay_root())
    register_store(
        "sqlite", kind="sql", connection=f"sqlite:///{_build_sqlite_fixture()}"
    )


def _content_dependent(stmt: str) -> bool:
    """Row count is engine-local by nature → compare columns only.

    Since the packaged virtual datasets carry the same data the
    reference ships, value-driven row counts on $satellites /
    $astronauts / $missions are now fully checked; only genuinely
    engine-specific surfaces stay column-only.
    """
    # EXPLAIN output is one row per plan line — engine-specific by nature
    if re.match(r"\s*(SET[^;]*;\s*)*EXPLAIN\b", stmt, re.I):
        return True
    # the server-variable inventory is engine-specific
    if re.search(r"\$variables\b", stmt, re.I):
        return True
    return False


def extract_statements(path: str) -> list[tuple[str, int | None, int | None, str | None]]:
    tree = ast.parse(open(path).read())
    out: list[tuple[str, int | None, int | None, str | None]] = []
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Assign) and isinstance(node.value, ast.List)):
            continue
        if not any(isinstance(t, ast.Name) and t.id == "STATEMENTS" for t in node.targets):
            continue
        for el in node.value.elts:
            if not (isinstance(el, ast.Tuple) and len(el.elts) == 4):
                continue
            s, r, c, e = el.elts
            stmt = s.value if isinstance(s, ast.Constant) else None
            if isinstance(stmt, bytes):
                stmt = stmt.decode()
            if not isinstance(stmt, str):
                continue
            rows = r.value if isinstance(r, ast.Constant) else None
            cols = c.value if isinstance(c, ast.Constant) else None
            err = e.id if isinstance(e, ast.Name) else None
            if isinstance(e, ast.Attribute):
                err = e.attr
            out.append((stmt, rows, cols, err))
    return out


def run_battery(files: list[str]) -> dict:
    import opteryx_spark as ox
    from opteryx_spark import errors

    # the reference battery executes with these memberships
    # (test_shapes_aliases_distinct.py:819)
    _register_fixture_stores()
    conn = ox.connect(memberships=["Apollo 11", "opteryx"])
    report: dict = {
        "files": {}, "failures": [], "extra_support": [], "skipped": [],
        # per-reason skip budget; "iceberg-jar" and "missing-fixture-data"
        # are permanent container/checkout limits (see _SKIP_PATTERNS)
        "skip_reasons": {},
    }
    totals = {"pass": 0, "fail": 0, "skip": 0, "extra_support": 0, "cols_only": 0}

    for path in files:
        name = os.path.basename(path)
        stats = {"pass": 0, "fail": 0, "skip": 0, "extra_support": 0, "cols_only": 0}
        for stmt, rows, cols, err in extract_statements(path):
            reason = next((r for r, p in _SKIP_PATTERNS if p.search(stmt)), None)
            if reason is not None:
                stats["skip"] += 1
                report["skipped"].append(stmt)
                report["skip_reasons"][reason] = report["skip_reasons"].get(reason, 0) + 1
                continue
            # the reference resolves file-relative fixture paths from its
            # own checkout; point them at the overlay (shipped files via
            # symlink, synthesized shape-twins materialized beside them)
            stmt = re.sub(r"'(\.\./)*testdata/", f"'{_overlay_root()}/", stmt)
            try:
                cur = conn.cursor().execute(stmt)
                got = cur.fetchall()
                got_shape = (len(got), len(cur.description) if cur.description else 0)
            except errors.Error as exc:
                if err is not None:
                    stats["pass"] += 1
                else:
                    stats["fail"] += 1
                    report["failures"].append(
                        {"file": name, "sql": stmt, "expected": [rows, cols],
                         "got": f"{type(exc).__name__}: {str(exc)[:160]}"}
                    )
                continue
            except Exception as exc:  # non-PEP-249 escape = our bug, count as fail
                stats["fail"] += 1
                report["failures"].append(
                    {"file": name, "sql": stmt, "expected": [rows, cols],
                     "got": f"UNMAPPED {type(exc).__name__}: {str(exc)[:160]}"}
                )
                continue
            if err is not None:
                stats["extra_support"] += 1
                report["extra_support"].append(stmt)
            elif got_shape == (rows, cols):
                stats["pass"] += 1
            elif _content_dependent(stmt) and got_shape[1] == cols:
                stats["cols_only"] += 1
            else:
                stats["fail"] += 1
                report["failures"].append(
                    {"file": name, "sql": stmt, "expected": [rows, cols],
                     "got": list(got_shape)}
                )
        report["files"][name] = stats
        for k in totals:
            totals[k] += stats[k]
        print(f"{name}: {stats}", flush=True)

    checked = totals["pass"] + totals["fail"]
    report["totals"] = {
        **totals,
        "checked": checked,
        "pass_rate": round(totals["pass"] / checked, 4) if checked else None,
    }
    return report


def main() -> None:
    pats = sys.argv[1:] or ["test_shapes_*.py"]
    files = sorted(f for p in pats for f in glob.glob(os.path.join(BATTERY_DIR, p)))
    report = run_battery(files)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "REFERENCE_BATTERY.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report["totals"]))


if __name__ == "__main__":
    main()
