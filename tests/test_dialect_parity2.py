"""Round-3 dialect-parity surface: array literals, IN UNNEST, ARRAY_AGG
modifiers, LIKE-family quantifiers over arrays, JSON accessors on structs,
regex operators, temporal weekday points, built-in prepared statements,
@@sysvars, mixed intervals, strftime DATE_FORMAT.

Row counts pinned against the packaged real virtual-dataset data (the
same data the reference ships; licenses vary per dataset, see
opteryx_spark/virtual.py), so these double as value checks.
"""

from __future__ import annotations

import pytest

import opteryx_spark as ox


@pytest.fixture(scope="module")
def conn(spark):
    return ox.connect(spark=spark)


CASES = [
    # (sql, expected_rowcount or None for smoke-only)
    ("SELECT * FROM (SELECT name, IFNULL(missions, []) AS missions FROM $astronauts) WHERE NOT missions @> ['Apollo 11']", 354),
    ("SELECT IFNULL(missions, ['Training']) FROM $astronauts", 357),
    ("SELECT * FROM $astronauts WHERE 'Apollo 11' IN UNNEST(missions)", 3),
    ("SELECT * FROM $astronauts WHERE 'Apollo 11' NOT IN UNNEST(missions)", 331),
    ("SET @variable = 'Apollo 11'; SELECT * FROM $astronauts WHERE @variable IN UNNEST(missions)", 3),
    ("SELECT ARRAY_AGG(name LIMIT 1) FROM $satellites GROUP BY planetId", 7),
    ("SELECT ARRAY_AGG(name ORDER BY name DESC LIMIT 2) FROM $satellites GROUP BY planetId", 7),
    ("SELECT LEAST(ARRAY_AGG(DISTINCT name LIMIT 5)) AS NAMES FROM $satellites GROUP BY planetId", 7),
    ("SELECT name, missions FROM $astronauts WHERE missions LIKE ANY ('%Apoll%')", 34),
    ("SELECT name, missions FROM $astronauts WHERE missions ILIKE ANY ('%apoll%')", 34),
    ("SELECT name, missions FROM $astronauts WHERE missions NOT LIKE ANY ('%Apoll%')", 300),
    ("SELECT name, missions FROM $astronauts WHERE missions LIKE ANY '%apoll%'", 0),
    ("SELECT name FROM $astronauts WHERE birth_place->>'state' = 'CA'", 25),
    ("SELECT * FROM $astronauts WHERE IFNULL(birth_place->'state', 'home') == 'CA'", 25),
    ("SELECT * FROM $missions WHERE MATCH (Location) AGAINST ('Florida USA')", None),
    ("SELECT * FROM $planets WHERE (id = 1) XOR (id = 2)", 2),
    ("SELECT * FROM $satellites WHERE name = 'Calypso' /* nested /* still nested */ end */", 1),
    ("SELECT * FROM $satellites WHERE name ~ '^C.'", 12),
    ("SELECT * FROM $satellites WHERE name !~ '^C.'", 165),
    ("SELECT * FROM $satellites WHERE name SIMILAR TO '^C.'", 12),
    ("SELECT * FROM $planets WHERE '{\"a\":1,\"b\":\"c\"}'->'a' = id", 1),
    ("SELECT * FROM $planets FOR MONDAY", 9),
    ("SELECT * FROM $planets FOR 2022-01-01", 9),
    ("SELECT INTERVAL '5 6' YEAR TO MONTH", 1),
    ("SELECT birth_date - INTERVAL '1 1' MONTH to DAY, birth_date FROM $astronauts", 357),
    ("SELECT EXTRACT(ISOWEEK FROM '2022-02-02')", 1),
    ("SELECT EXTRACT(DECADE FROM NOW())", 1),
    ("SELECT CAST(p.name AS ARRAY<VARCHAR>) FROM $satellites AS s LEFT JOIN $planets AS p ON s.id = p.id WHERE s.id > 10", 167),
    ("SELECT planetId::VARCHAR FROM $satellites", 177),
    ("SELECT TIMESTAMP(1700000000000000)", 1),
    ("SELECT DATE_FORMAT(birth_date, '%d-%Y') FROM $astronauts", 357),
    ("SELECT DATE_FORMAT(birth_date, 'dddd') FROM $astronauts", 357),
    ("SELECT CONCAT(('1', '2', '3'))", 1),
    ("SELECT name FROM $astronauts WHERE CONCAT(missions) ILIKE '%Apo%'", 34),
    ("SELECT name FROM $satellites WHERE '192.168.0.1' | '192.168.0.0/24'", 177),
    ("SELECT * FROM $satellites WHERE id & 1", 89),
    ("SELECT CAST(CAST(id AS BLOB) AS INTEGER) FROM $satellites LIMIT 3", 3),
    ("EXECUTE VERSION", 1),
    ("EXECUTE PLANETS_BY_ID (id=1)", 1),
    ("SELECT * FROM my_mission_reports", 0),
    ("SHOW EXTENDED COLUMNS FROM $satellites", 8),
    ("SELECT*\nFROM$satellites", 177),
    ("SELECT name, SEARCH(birth_place, 'Italy') FROM $astronauts", 357),
    ("SELECT s, e FROM generate_series('2024-01-01', '2024-03-01', '1mo') AS s, generate_series('2024-01-01', '2024-03-01', '1mo') AS e", 9),
    ("SELECT * FROM generate_series('2022-01-01', '2022-12-31', '1mo') AS GS", 12),
]


@pytest.mark.parametrize("sql,want", CASES, ids=[c[0][:48] for c in CASES])
def test_dialect_case(conn, sql, want):
    rows = conn.cursor().execute(sql).fetchall()
    if want is not None:
        assert len(rows) == want


def test_astronaut_data_is_reference_snapshot(conn):
    n, = conn.cursor().execute("SELECT COUNT(*) FROM $astronauts").fetchone()
    assert n == 357
    distinct, = conn.cursor().execute(
        "SELECT COUNT(DISTINCT name) FROM $astronauts"
    ).fetchone()
    assert distinct == 357
    companies, = conn.cursor().execute(
        "SELECT COUNT(DISTINCT Company) FROM $missions"
    ).fetchone()
    assert companies == 62


def test_missing_dataset_file_is_data_error(conn):
    from opteryx_spark import errors

    with pytest.raises(errors.Error):
        conn.cursor().execute("SELECT * FROM '/nonexistent/nowhere.parquet'")


TEMPORAL_CASES = [
    ("SELECT * FROM $planets FOR '1730-01-01'", 6),
    ("SELECT * FROM $planets FOR '1830-01-01'", 7),
    ("SELECT * FROM $planets FOR '1930-01-01'", 8),
    ("SELECT * FROM $planets FOR '2030-01-01'", 9),
    ("SELECT * FROM $planets FOR DATES SINCE MONDAY", 9),
    ("SELECT * FROM $planets FOR DATES BETWEEN THURSDAY AND TODAY", 9),
    ("SELECT * FROM (SELECT * FROM $planets AS D) AS P FOR '2030-01-01'", 9),
    ("SELECT * FROM $planets AS P FOR '1699-01-01' INNER JOIN $satellites FOR '2030-01-01' ON P.id = planetId", 131),
]


@pytest.mark.parametrize("sql,want", TEMPORAL_CASES, ids=[c[0][:48] for c in TEMPORAL_CASES])
def test_virtual_temporal(conn, sql, want):
    assert len(conn.cursor().execute(sql).fetchall()) == want
