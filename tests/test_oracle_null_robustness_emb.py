"""Embeddings-table twin of the NULL-robustness gates.

Injects a NULL-embedding row and an all-zero vector (the two real-world
hazards for cosine/ANN paths: missing encodes and zero-norm junk) and
re-runs every embeddings-only oracle entry — divergent NULL/zero-norm
handling (0/0 divisions, k-means on NULLs, quantize scale = 127/0) fails
here instead of hiding behind a clean fixture.
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
    "region nation customer supplier part orders lineitem documents events".split()
)


def _emb_only(oracle: str) -> bool:
    if "embeddings" not in oracle:
        return False
    return not any(re.search(rf"\b{t}\b", oracle) for t in _OTHER_TABLES)


EMB_ONLY = sorted(n for n, qd in REG.items() if qd.oracle and _emb_only(qd.oracle))


@pytest.fixture(scope="module")
def nullemb_sf_dir(tmp_path_factory):
    import shutil

    import duckdb

    d = str(tmp_path_factory.mktemp("oxs_nullemb_sf"))
    for f in os.listdir(SF_SMALL):
        if f.endswith(".parquet") and f != "embeddings.parquet":
            shutil.copy(os.path.join(SF_SMALL, f), os.path.join(d, f))
    src = os.path.join(SF_SMALL, "embeddings.parquet")
    dst = os.path.join(d, "embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{src}')
          UNION ALL
          (SELECT * REPLACE (9000001 AS vec_id,
                             CAST(NULL AS FLOAT[]) AS embedding)
           FROM read_parquet('{src}') LIMIT 1)
          UNION ALL
          (SELECT * REPLACE (9000002 AS vec_id,
                             CAST(list_transform(range(64), x -> 0.0)
                                  AS FLOAT[]) AS embedding)
           FROM read_parquet('{src}') LIMIT 1)
        ) TO '{dst}' (FORMAT PARQUET)
        """
    )
    con.close()
    return d


@pytest.fixture(scope="module")
def nullemb_duck(nullemb_sf_dir):
    import duckdb

    con = duckdb.connect()
    for name in _OTHER_TABLES + ["embeddings"]:
        path = os.path.join(nullemb_sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


@pytest.mark.parametrize("name", EMB_ONLY)
def test_oracle_null_robust_emb(spark, nullemb_duck, nullemb_sf_dir, name):
    qd = REG[name]
    df = qd.spark(spark, nullemb_sf_dir)
    compare(df, nullemb_duck, qd.oracle, f"{name}[null-injected-emb]")
