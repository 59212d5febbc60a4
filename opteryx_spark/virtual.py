"""Virtual datasets: ``$planets``, ``$no_table``, ``$variables``.

The reference ships small built-in sample relations
(``opteryx/virtual_datasets/``, queried as ``$planets`` etc.).  We provide
the same *surface* with freshly-written tables of public astronomical
facts (values are approximate public-knowledge figures, not copied from
the reference), registered as ``virtual_<name>`` temp views; the dialect
rewriter maps ``$name`` → ``virtual_<name>``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_PLANETS = [
    # id, name, mass(1e24kg), diameter(km), gravity, orbitalPeriod(days), numberOfMoons, surfacePressure
    (1, "Mercury", 0.33, 4879, 3.7, 88.0, 0, 0.0),
    (2, "Venus", 4.87, 12104, 8.9, 224.7, 0, 92.0),
    (3, "Earth", 5.97, 12756, 9.8, 365.2, 1, 1.0),
    (4, "Mars", 0.642, 6792, 3.7, 687.0, 2, 0.01),
    (5, "Jupiter", 1898.0, 142984, 23.1, 4331.0, 95, None),
    (6, "Saturn", 568.0, 120536, 9.0, 10747.0, 146, None),
    (7, "Uranus", 86.8, 51118, 8.7, 30589.0, 28, None),
    (8, "Neptune", 102.0, 49528, 11.0, 59800.0, 16, None),
    (9, "Pluto", 0.0130, 2376, 0.7, 90560.0, 5, 0.00001),
]

_PLANET_COLS = [
    "id",
    "name",
    "mass",
    "diameter",
    "gravity",
    "orbitalPeriod",
    "numberOfMoons",
    "surfacePressure",
]


def register_virtual_datasets(spark: SparkSession) -> None:
    spark.createDataFrame(_PLANETS, _PLANET_COLS).createOrReplaceTempView("virtual_planets")
    spark.createDataFrame([], "column string").createOrReplaceTempView("virtual_no_table")
