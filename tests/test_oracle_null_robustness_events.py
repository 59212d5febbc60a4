"""Events-table twin of the documents NULL-robustness gate.

Re-runs every events-only oracle entry on a fixture with one row each of
NULL value / props / user_id / event_type / ts injected — any oracle
whose NULL handling (group keys, skipped aggregates, window order,
regexp on NULL) diverges from the Spark implementation fails here
instead of silently relying on the driver fixture being NULL-free.
"""

from __future__ import annotations

import os
import re

import pytest

from opteryx_spark.suite import load_all
from tests._compare import compare
from tests.conftest import SF_SMALL

REG = load_all()
_OTHER_TABLES = (
    "region nation customer supplier part orders lineitem documents embeddings".split()
)


def _events_only(oracle: str) -> bool:
    if "events" not in oracle:
        return False
    return not any(re.search(rf"\b{t}\b", oracle) for t in _OTHER_TABLES)


EVENTS_ONLY = sorted(n for n, qd in REG.items() if qd.oracle and _events_only(qd.oracle))


@pytest.fixture(scope="module")
def nullev_sf_dir(tmp_path_factory):
    import shutil

    import duckdb

    d = str(tmp_path_factory.mktemp("oxs_nullev_sf"))
    for f in os.listdir(SF_SMALL):
        if f.endswith(".parquet") and f != "events.parquet":
            shutil.copy(os.path.join(SF_SMALL, f), os.path.join(d, f))
    src = os.path.join(SF_SMALL, "events.parquet")
    dst = os.path.join(d, "events.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{src}')
          UNION ALL
          (SELECT * REPLACE (9000001 AS event_id, CAST(NULL AS DOUBLE) AS value)
           FROM read_parquet('{src}') LIMIT 1)
          UNION ALL
          (SELECT * REPLACE (9000002 AS event_id, CAST(NULL AS VARCHAR) AS props)
           FROM read_parquet('{src}') LIMIT 1)
          UNION ALL
          (SELECT * REPLACE (9000003 AS event_id, CAST(NULL AS BIGINT) AS user_id)
           FROM read_parquet('{src}') LIMIT 1)
          UNION ALL
          (SELECT * REPLACE (9000004 AS event_id, CAST(NULL AS VARCHAR) AS event_type)
           FROM read_parquet('{src}') LIMIT 1)
          UNION ALL
          (SELECT * REPLACE (9000005 AS event_id, CAST(NULL AS TIMESTAMP) AS ts)
           FROM read_parquet('{src}') LIMIT 1)
        ) TO '{dst}' (FORMAT PARQUET)
        """
    )
    con.close()
    return d


@pytest.fixture(scope="module")
def nullev_duck(nullev_sf_dir):
    import duckdb

    con = duckdb.connect()
    for name in _OTHER_TABLES + ["events"]:
        path = os.path.join(nullev_sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENTS_ONLY)
def test_oracle_null_robust_events(spark, nullev_duck, nullev_sf_dir, name):
    qd = REG[name]
    df = qd.spark(spark, nullev_sf_dir)
    compare(df, nullev_duck, qd.oracle, f"{name}[null-injected-events]")
