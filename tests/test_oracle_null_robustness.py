"""Oracles must encode the operator CONTRACT, not the fixture's shape.

ADVICE r5 found two oracles that matched only because the driver corpus
happens to contain no NULL texts.  This gate re-runs every documents-only
oracle entry on a fixture with a NULL-text, an empty-text and a
whitespace-text row injected — any oracle (or operator) whose NULL/empty
handling diverges fails here instead of silently relying on fixture
contents.
"""

from __future__ import annotations

import os
import re

import pytest

from opteryx_spark.suite import load_all
from tests._compare import compare
from tests.conftest import SF_SMALL

REG = load_all()
_OTHER_TABLES = "region nation customer supplier part orders lineitem events embeddings".split()


def _documents_only(oracle: str) -> bool:
    if "documents" not in oracle:
        return False
    return not any(re.search(rf"\b{t}\b", oracle) for t in _OTHER_TABLES)


DOC_ONLY = sorted(n for n, qd in REG.items() if qd.oracle and _documents_only(qd.oracle))

# Default tier: rotating ~30% sample (tests/_tiers.py); full sweep with
# SPARK_GRAFT_FULL_TESTS=1 (VERDICT r11 #1 test tiering).
from tests._tiers import battery_params  # noqa: E402

DOC_ONLY_PARAMS = battery_params(DOC_ONLY, REG)


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    """Copy of the sf0.001 fixture with degenerate text rows appended."""
    import shutil

    import duckdb

    d = str(tmp_path_factory.mktemp("oxs_nulltext_sf"))
    for f in os.listdir(SF_SMALL):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copy(os.path.join(SF_SMALL, f), os.path.join(d, f))
    src = os.path.join(SF_SMALL, "documents.parquet")
    dst = os.path.join(d, "documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{src}')
          UNION ALL
          (SELECT * REPLACE (9000001 AS doc_id, CAST(NULL AS VARCHAR) AS text)
           FROM read_parquet('{src}') LIMIT 1)
          UNION ALL
          (SELECT * REPLACE (9000002 AS doc_id, '' AS text)
           FROM read_parquet('{src}') LIMIT 1)
          UNION ALL
          (SELECT * REPLACE (9000003 AS doc_id, '   ' AS text)
           FROM read_parquet('{src}') LIMIT 1)
        ) TO '{dst}' (FORMAT PARQUET)
        """
    )
    con.close()
    return d


@pytest.fixture(scope="module")
def null_duck(null_sf_dir):
    import duckdb

    con = duckdb.connect()
    for name in _OTHER_TABLES + ["documents"]:
        path = os.path.join(null_sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_ONLY_PARAMS)
def test_oracle_null_robust(spark, null_duck, null_sf_dir, name):
    qd = REG[name]
    df = qd.spark(spark, null_sf_dir)
    compare(df, null_duck, qd.oracle, f"{name}[null-injected]")
