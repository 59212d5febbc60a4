"""Virtual datasets: ``$planets``, ``$satellites``, ``$astronauts``,
``$missions``, ``$variables``, ``$statistics``, ``$user``, ``$no_table``.

The reference ships small built-in sample relations
(``opteryx/virtual_datasets/``, queried as ``$planets`` etc.).  We provide
the same *surface* with freshly-written tables of public astronomical /
spaceflight facts (values are approximate public-knowledge figures, not
copied from the reference), registered as ``virtual_<name>`` temp views;
the dialect rewriter maps ``$name`` → ``virtual_<name>``.

``$variables`` / ``$statistics`` / ``$user`` are session-state relations
(reference ``variables_data.py`` / ``statistics.py`` / ``user.py``); the
cursor refreshes them before any statement that references them.
"""

from __future__ import annotations

import datetime
import getpass

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

# Well-known natural satellites; approximate public figures.
# gm in km^3/s^2, radius in km, density in g/cm^3.
_SATELLITES = [
    # id, planetId, name, gm, radius, density, magnitude, albedo
    (1, 3, "Moon", 4902.8, 1737.4, 3.34, -12.74, 0.12),
    (2, 4, "Phobos", 0.0007, 11.1, 1.87, 11.4, 0.07),
    (3, 4, "Deimos", 0.0001, 6.2, 1.47, 12.45, 0.07),
    (4, 5, "Io", 5959.9, 1821.5, 3.53, 5.0, 0.63),
    (5, 5, "Europa", 3202.7, 1560.8, 3.01, 5.3, 0.67),
    (6, 5, "Ganymede", 9887.8, 2631.2, 1.94, 4.6, 0.43),
    (7, 5, "Callisto", 7179.3, 2410.3, 1.83, 5.7, 0.17),
    (8, 5, "Amalthea", 0.138, 83.5, 0.85, 14.1, 0.09),
    (9, 5, "Himalia", 0.45, 85.0, 2.6, 14.6, 0.04),
    (10, 6, "Mimas", 2.5, 198.2, 1.15, 12.8, 0.96),
    (11, 6, "Enceladus", 7.2, 252.1, 1.61, 11.8, 1.0),
    (12, 6, "Tethys", 41.2, 533.0, 0.98, 10.2, 0.80),
    (13, 6, "Dione", 73.1, 561.7, 1.48, 10.4, 0.55),
    (14, 6, "Rhea", 153.9, 764.3, 1.23, 9.6, 0.65),
    (15, 6, "Titan", 8978.1, 2574.7, 1.88, 8.4, 0.22),
    (16, 6, "Hyperion", 0.37, 135.0, 0.54, 14.1, 0.3),
    (17, 6, "Iapetus", 120.5, 735.6, 1.08, 11.0, 0.3),
    (18, 7, "Miranda", 4.4, 235.8, 1.2, 15.8, 0.32),
    (19, 7, "Ariel", 86.4, 578.9, 1.59, 13.7, 0.39),
    (20, 7, "Umbriel", 81.5, 584.7, 1.39, 14.5, 0.21),
    (21, 7, "Titania", 228.2, 788.9, 1.71, 13.5, 0.27),
    (22, 7, "Oberon", 192.4, 761.4, 1.63, 13.7, 0.23),
    (23, 8, "Triton", 1427.6, 1353.4, 2.06, 13.5, 0.72),
    (24, 8, "Nereid", 2.1, 170.0, 1.5, 19.2, 0.16),
    (25, 8, "Proteus", 3.4, 210.0, 1.3, 19.7, 0.10),
    (26, 9, "Charon", 105.9, 606.0, 1.70, 16.8, 0.37),
    (27, 9, "Nix", 0.002, 23.0, 2.1, 23.4, 0.35),
    (28, 9, "Hydra", 0.003, 30.5, 1.2, 22.9, 0.35),
]

_SATELLITE_SCHEMA = (
    "id INT, planetId INT, name STRING, gm DOUBLE, radius DOUBLE, "
    "density DOUBLE, magnitude DOUBLE, albedo DOUBLE"
)

_D = datetime.date

# A small roster of famous astronauts; approximate public-record data.
_ASTRONAUTS = [
    (
        "Neil A. Armstrong", 1962, 2, "Deceased", _D(1930, 8, 5),
        {"town": "Wapakoneta", "state": "OH"}, "Male",
        ["Purdue University", "University of Southern California"],
        "Aeronautical Engineering", "Aerospace Engineering", None, None,
        2, 206, 1, 2, ["Gemini 8", "Apollo 11"], _D(2012, 8, 25), None,
    ),
    (
        "Buzz Aldrin", 1963, 3, "Retired", _D(1930, 1, 20),
        {"town": "Montclair", "state": "NJ"}, "Male",
        ["US Military Academy", "MIT"],
        "Mechanical Engineering", "Astronautics", "Colonel", "US Air Force",
        2, 289, 4, 8, ["Gemini 12", "Apollo 11"], None, None,
    ),
    (
        "Sally K. Ride", 1978, 8, "Deceased", _D(1951, 5, 26),
        {"town": "Los Angeles", "state": "CA"}, "Female",
        ["Stanford University"],
        "Physics", "Physics", None, None,
        2, 343, 0, 0, ["STS-7", "STS-41-G"], _D(2012, 7, 23), None,
    ),
    (
        "John H. Glenn Jr.", 1959, 1, "Deceased", _D(1921, 7, 18),
        {"town": "Cambridge", "state": "OH"}, "Male",
        ["Muskingum College"],
        "Engineering", None, "Colonel", "US Marine Corps",
        2, 218, 0, 0, ["Mercury-Atlas 6", "STS-95"], _D(2016, 12, 8), None,
    ),
    (
        "Mae C. Jemison", 1987, 12, "Retired", _D(1956, 10, 17),
        {"town": "Decatur", "state": "AL"}, "Female",
        ["Stanford University", "Cornell University"],
        "Chemical Engineering", "Medicine", None, None,
        1, 190, 0, 0, ["STS-47"], None, None,
    ),
    (
        "Peggy A. Whitson", 1996, 16, "Active", _D(1960, 2, 9),
        {"town": "Mount Ayr", "state": "IA"}, "Female",
        ["Iowa Wesleyan College", "Rice University"],
        "Biology/Chemistry", "Biochemistry", None, None,
        4, 16061, 10, 60, ["STS-111", "Soyuz TMA-11", "Soyuz MS-03", "Ax-2"], None, None,
    ),
    (
        "Scott J. Kelly", 1996, 16, "Retired", _D(1964, 2, 21),
        {"town": "Orange", "state": "NJ"}, "Male",
        ["SUNY Maritime College", "University of Tennessee"],
        "Electrical Engineering", "Aviation Systems", "Captain", "US Navy",
        4, 12397, 3, 18, ["STS-103", "STS-118", "Soyuz TMA-01M", "Soyuz TMA-16M"], None, None,
    ),
    (
        "Ellen Ochoa", 1990, 13, "Retired", _D(1958, 5, 10),
        {"town": "Los Angeles", "state": "CA"}, "Female",
        ["San Diego State University", "Stanford University"],
        "Physics", "Electrical Engineering", None, None,
        4, 978, 0, 0, ["STS-56", "STS-66", "STS-96", "STS-110"], None, None,
    ),
    (
        "Gus Grissom", 1959, 1, "Deceased", _D(1926, 4, 3),
        {"town": "Mitchell", "state": "IN"}, "Male",
        ["Purdue University"],
        "Mechanical Engineering", None, "Lieutenant Colonel", "US Air Force",
        2, 5, 0, 0, ["Mercury-Redstone 4", "Gemini 3"], _D(1967, 1, 27), "Apollo 1",
    ),
    (
        "Christa McAuliffe", 1985, 0, "Deceased", _D(1948, 9, 2),
        {"town": "Boston", "state": "MA"}, "Female",
        ["Framingham State College", "Bowie State University"],
        "History", "Education", None, None,
        1, 0, 0, 0, ["STS-51-L"], _D(1986, 1, 28), "STS-51-L",
    ),
]

_ASTRONAUT_SCHEMA = (
    "name STRING, year INT, `group` INT, status STRING, birth_date DATE, "
    "birth_place STRUCT<town: STRING, state: STRING>, gender STRING, "
    "alma_mater ARRAY<STRING>, undergraduate_major STRING, "
    "graduate_major STRING, military_rank STRING, military_branch STRING, "
    "space_flights INT, space_flight_hours INT, space_walks INT, "
    "space_walks_hours INT, missions ARRAY<STRING>, death_date DATE, "
    "death_mission STRING"
)

_T = datetime.datetime

# Famous orbital launches; approximate public facts (price in $M).
_MISSIONS = [
    ("RVSN USSR", "Baikonur, Kazakhstan", None, _T(1957, 10, 4, 19, 28), "Sputnik 8K71PS", "Retired", "Sputnik 1", "Success"),
    ("RVSN USSR", "Baikonur, Kazakhstan", None, _T(1961, 4, 12, 6, 7), "Vostok-K", "Retired", "Vostok 1", "Success"),
    ("NASA", "Kennedy Space Center, USA", 1160.0, _T(1969, 7, 16, 13, 32), "Saturn V", "Retired", "Apollo 11", "Success"),
    ("NASA", "Kennedy Space Center, USA", 450.0, _T(1981, 4, 12, 12, 0), "Space Shuttle Columbia", "Retired", "STS-1", "Success"),
    ("NASA", "Kennedy Space Center, USA", 450.0, _T(1986, 1, 28, 16, 38), "Space Shuttle Challenger", "Retired", "STS-51-L", "Failure"),
    ("Arianespace", "Kourou, French Guiana", 165.0, _T(1996, 6, 4, 12, 34), "Ariane 5", "Retired", "Ariane 501", "Failure"),
    ("SpaceX", "Kwajalein Atoll, Marshall Islands", 7.0, _T(2008, 9, 28, 23, 15), "Falcon 1", "Retired", "Falcon 1 Flight 4", "Success"),
    ("SpaceX", "Cape Canaveral, USA", 62.0, _T(2015, 12, 22, 1, 29), "Falcon 9", "Active", "ORBCOMM OG2 M2", "Success"),
    ("SpaceX", "Kennedy Space Center, USA", 90.0, _T(2018, 2, 6, 20, 45), "Falcon Heavy", "Active", "Falcon Heavy Demo", "Success"),
    ("SpaceX", "Kennedy Space Center, USA", 55.0, _T(2020, 5, 30, 19, 22), "Falcon 9", "Active", "Crew Demo-2", "Success"),
    ("Rocket Lab", "Mahia, New Zealand", 7.5, _T(2018, 1, 21, 1, 43), "Electron", "Active", "Still Testing", "Success"),
    ("NASA", "Kennedy Space Center, USA", 4100.0, _T(2022, 11, 16, 6, 47), "SLS", "Active", "Artemis 1", "Success"),
    ("ISRO", "Sriharikota, India", 75.0, _T(2023, 7, 14, 9, 5), "LVM3", "Active", "Chandrayaan-3", "Success"),
]

_MISSION_SCHEMA = (
    "Company STRING, Location STRING, Price DOUBLE, Lauched_at TIMESTAMP, "
    "Rocket STRING, Rocket_Status STRING, Mission STRING, Mission_Status STRING"
)


def register_virtual_datasets(spark: SparkSession) -> None:
    """Register the static virtual relations (once per session)."""
    spark.createDataFrame(_PLANETS, _PLANET_COLS).createOrReplaceTempView("virtual_planets")
    spark.createDataFrame([], "column string").createOrReplaceTempView("virtual_no_table")
    spark.createDataFrame(_SATELLITES, _SATELLITE_SCHEMA).createOrReplaceTempView(
        "virtual_satellites"
    )
    spark.createDataFrame(_ASTRONAUTS, _ASTRONAUT_SCHEMA).createOrReplaceTempView(
        "virtual_astronauts"
    )
    spark.createDataFrame(_MISSIONS, _MISSION_SCHEMA).createOrReplaceTempView(
        "virtual_missions"
    )
    register_session_state(spark, {}, {})


def register_session_state(
    spark: SparkSession,
    variables: dict,
    statistics: dict,
    user: str | None = None,
    memberships: list[str] | None = None,
) -> None:
    """Refresh the session-state relations ``$variables`` / ``$statistics``
    / ``$user`` (reference ``virtual_datasets/{variables_data,statistics,
    user}.py``).  Called by the cursor before statements referencing them.
    """
    var_rows = [
        (name, str(value), type(value).__name__.upper(), "user", "unrestricted")
        for name, value in sorted(variables.items())
    ]
    spark.createDataFrame(
        var_rows, "name STRING, value STRING, type STRING, owner STRING, visibility STRING"
    ).createOrReplaceTempView("virtual_variables")

    stat_rows = [(k, str(v)) for k, v in sorted(statistics.items())]
    spark.createDataFrame(stat_rows, "key STRING, value STRING").createOrReplaceTempView(
        "virtual_statistics"
    )

    try:
        username = user or getpass.getuser()
    except Exception:  # pragma: no cover - no passwd entry in container
        username = user or "anonymous"
    user_rows = [("name", username, "VARCHAR")] + [
        ("membership", m, "VARCHAR") for m in (memberships or [])
    ]
    spark.createDataFrame(
        user_rows, "attribute STRING, value STRING, type STRING"
    ).createOrReplaceTempView("virtual_user")
