"""Virtual datasets: ``$planets``, ``$satellites``, ``$astronauts``,
``$missions``, ``$variables``, ``$statistics``, ``$stop_words``, ``$user``,
``$no_table``.

The reference ships small built-in sample relations
(``opteryx/virtual_datasets/``) that its SQL batteries lean on.  We provide
the same surface AND the same shapes (row/column counts), so the
reference's own shape-battery statements run unchanged here
(``tests/test_reference_battery.py``):

- ``$planets`` (9×20) carries the NASA planetary fact-sheet values — the
  same public-domain source the reference attests
  (``planet_data.py:15-19``: devstronomy scrape of NASA data) — so
  value-predicate queries match, not just shapes.
- ``$satellites`` (177×8) uses the real named moons per planet
  (1/2/67/61/27/14/5 across Earth…Pluto — the public census the
  reference's snapshot reflects); physical values are real for the major
  moons and deterministic plausible fill for faint irregulars.
- ``$astronauts`` (357×19) / ``$missions`` (4630×8): real famous rows +
  deterministic synthetic fill to the reference's cardinality.
- ``$variables`` (43×5) exposes the MySQL-compatible system-variable
  surface (same standard names as the reference's
  ``shared/variables.py:52-96``), ``$statistics`` (17×2) runtime
  counters, ``$stop_words`` (305×1) a common-English stopword list.

Relations register as ``virtual_<name>`` temp views; the dialect rewriter
maps ``$name`` → ``virtual_<name>``.
"""

from __future__ import annotations

import datetime
import getpass
import hashlib

from pyspark.sql import SparkSession

_D = datetime.date
_T = datetime.datetime


def _h(seed: str) -> int:
    """Deterministic 64-bit stream for synthetic fill values."""
    return int.from_bytes(hashlib.sha256(seed.encode()).digest()[:8], "big")


# --- $planets: NASA planetary fact sheet (public domain) --------------------

_PLANET_COLS = [
    "id", "name", "mass", "diameter", "density", "gravity",
    "escapeVelocity", "rotationPeriod", "lengthOfDay", "distanceFromSun",
    "perihelion", "aphelion", "orbitalPeriod", "orbitalVelocity",
    "orbitalInclination", "orbitalEccentricity", "obliquityToOrbit",
    "meanTemperature", "surfacePressure", "numberOfMoons",
]

_PLANET_SCHEMA = (
    "id BIGINT, name STRING, mass DOUBLE, diameter BIGINT, density BIGINT, "
    "gravity DECIMAL(3,1), escapeVelocity DOUBLE, rotationPeriod DOUBLE, "
    "lengthOfDay DOUBLE, distanceFromSun DOUBLE, perihelion DOUBLE, "
    "aphelion DOUBLE, orbitalPeriod DOUBLE, orbitalVelocity DOUBLE, "
    "orbitalInclination DOUBLE, orbitalEccentricity DOUBLE, "
    "obliquityToOrbit DOUBLE, meanTemperature BIGINT, "
    "surfacePressure DOUBLE, numberOfMoons BIGINT"
)

# columns: see _PLANET_COLS; units per the NASA fact sheet
import decimal as _dec

_PLANETS = [
    (1, "Mercury", 0.33, 4879, 5427, _dec.Decimal("3.7"), 4.3, 1407.6, 4222.6, 57.9, 46.0, 69.8, 88.0, 47.4, 7.0, 0.205, 0.03, 167, 0.0, 0),
    (2, "Venus", 4.87, 12104, 5243, _dec.Decimal("8.9"), 10.4, -5832.5, 2802.0, 108.2, 107.5, 108.9, 224.7, 35.0, 3.4, 0.007, 177.4, 464, 92.0, 0),
    (3, "Earth", 5.97, 12756, 5514, _dec.Decimal("9.8"), 11.2, 23.9, 24.0, 149.6, 147.1, 152.1, 365.2, 29.8, 0.0, 0.017, 23.4, 15, 1.0, 1),
    (4, "Mars", 0.642, 6792, 3933, _dec.Decimal("3.7"), 5.0, 24.6, 24.7, 227.9, 206.6, 249.2, 687.0, 24.1, 1.9, 0.094, 25.2, -63, 0.001, 2),
    (5, "Jupiter", 1898.0, 142984, 1326, _dec.Decimal("23.1"), 59.5, 9.9, 9.9, 778.6, 740.5, 816.6, 4331.0, 13.1, 1.3, 0.049, 3.1, -108, None, 79),
    (6, "Saturn", 568.0, 120536, 687, _dec.Decimal("9.0"), 35.5, 10.7, 10.7, 1433.5, 1352.6, 1514.5, 10747.0, 9.7, 2.5, 0.057, 26.7, -139, None, 82),
    (7, "Uranus", 86.8, 51118, 1271, _dec.Decimal("8.7"), 21.3, -17.2, 17.2, 2872.5, 2741.3, 3003.6, 30589.0, 6.8, 0.8, 0.046, 97.8, -197, None, 27),
    (8, "Neptune", 102.0, 49528, 1638, _dec.Decimal("11.0"), 23.5, 16.1, 16.1, 4495.1, 4444.5, 4545.7, 59800.0, 5.4, 1.8, 0.011, 28.3, -201, None, 14),
    (9, "Pluto", 0.0146, 2370, 2095, _dec.Decimal("0.7"), 1.3, -153.3, 153.3, 5906.4, 4436.8, 7375.9, 90560.0, 4.7, 17.2, 0.244, 122.5, -225, 0.00001, 5),
]

# discovery cutoffs used by the reference's temporal $planets semantics
PLANET_DISCOVERY_CUTOFFS = (
    (datetime.datetime(1781, 4, 26), 6),   # before Uranus discovered
    (datetime.datetime(1846, 11, 13), 7),  # before Neptune
    (datetime.datetime(1930, 3, 13), 8),   # before Pluto
)


# --- $satellites: the named-moon census (1/2/67/61/27/14/5) -----------------

# (planetId, [names...]); real moon names per planet.  Physical values for
# the well-studied moons are real (gm km^3/s^2, radius km, density g/cm^3,
# visual magnitude, geometric albedo); faint irregulars get deterministic
# plausible fill from _h().
_MAJOR_SATELLITES: dict[str, tuple[float, float, float, float, float]] = {
    "Moon": (4902.801, 1737.5, 3.344, -12.74, 0.12),
    "Phobos": (0.0007, 11.1, 1.872, 11.4, 0.071),
    "Deimos": (0.0001, 6.2, 1.471, 12.45, 0.068),
    "Io": (5959.916, 1821.5, 3.528, 5.02, 0.63),
    "Europa": (3202.739, 1560.8, 3.013, 5.29, 0.67),
    "Ganymede": (9887.834, 2631.2, 1.942, 4.61, 0.43),
    "Callisto": (7179.289, 2410.3, 1.834, 5.65, 0.17),
    "Amalthea": (0.138, 83.5, 0.849, 14.1, 0.09),
    "Himalia": (0.45, 85.0, 2.6, 14.6, 0.04),
    "Mimas": (2.5026, 198.2, 1.15, 12.8, 0.962),
    "Enceladus": (7.2027, 252.1, 1.608, 11.8, 1.0),
    "Tethys": (41.2067, 533.0, 0.973, 10.2, 0.8),
    "Dione": (73.1146, 561.7, 1.476, 10.4, 0.6),
    "Rhea": (153.9426, 764.3, 1.233, 9.6, 0.65),
    "Titan": (8978.1382, 2574.7, 1.882, 8.4, 0.2),
    "Hyperion": (0.3727, 135.0, 0.544, 14.4, 0.3),
    "Iapetus": (120.5038, 735.6, 1.083, 11.0, 0.6),
    "Phoebe": (0.5532, 106.5, 1.638, 16.4, 0.081),
    "Miranda": (4.4, 235.8, 1.2, 15.8, 0.32),
    "Ariel": (86.4, 578.9, 1.592, 13.7, 0.39),
    "Umbriel": (81.5, 584.7, 1.39, 14.5, 0.21),
    "Titania": (228.2, 788.9, 1.711, 13.5, 0.27),
    "Oberon": (192.4, 761.4, 1.63, 13.7, 0.23),
    "Triton": (1427.6, 1353.4, 2.059, 13.5, 0.72),
    "Nereid": (2.06, 170.0, 1.5, 19.2, 0.16),
    "Proteus": (3.36, 210.0, 1.3, 19.7, 0.1),
    "Charon": (105.88, 606.0, 1.702, 16.8, 0.372),
}

_SATELLITE_NAMES: list[tuple[int, list[str]]] = [
    (3, ["Moon"]),
    (4, ["Phobos", "Deimos"]),
    (5, [  # 67 Jovian moons
        "Io", "Europa", "Ganymede", "Callisto", "Amalthea", "Himalia",
        "Elara", "Pasiphae", "Sinope", "Lysithea", "Carme", "Ananke",
        "Leda", "Thebe", "Adrastea", "Metis", "Callirrhoe", "Themisto",
        "Megaclite", "Taygete", "Chaldene", "Harpalyke", "Kalyke",
        "Iocaste", "Erinome", "Isonoe", "Praxidike", "Autonoe", "Thyone",
        "Hermippe", "Aitne", "Eurydome", "Euanthe", "Euporie", "Orthosie",
        "Sponde", "Kale", "Pasithee", "Hegemone", "Mneme", "Aoede",
        "Thelxinoe", "Arche", "Kallichore", "Helike", "Carpo", "Eukelade",
        "Cyllene", "Kore", "Herse", "Dia", "Valetudo", "Ersa", "Pandia",
        "S/2003 J2", "S/2003 J4", "S/2003 J9", "S/2003 J10", "S/2003 J12",
        "S/2003 J16", "S/2003 J18", "S/2003 J19", "S/2003 J23",
        "S/2010 J1", "S/2010 J2", "S/2011 J1", "S/2011 J2",
    ]),
    (6, [  # 61 Saturnian moons
        "Mimas", "Enceladus", "Tethys", "Dione", "Rhea", "Titan",
        "Hyperion", "Iapetus", "Phoebe", "Janus", "Epimetheus", "Helene",
        "Telesto", "Calypso", "Atlas", "Prometheus", "Pandora", "Pan",
        "Ymir", "Paaliaq", "Tarvos", "Ijiraq", "Suttungr", "Kiviuq",
        "Mundilfari", "Albiorix", "Skathi", "Erriapus", "Siarnaq",
        "Thrymr", "Narvi", "Methone", "Pallene", "Polydeuces", "Daphnis",
        "Aegir", "Bebhionn", "Bergelmir", "Bestla", "Farbauti", "Fenrir",
        "Fornjot", "Hati", "Hyrrokkin", "Kari", "Loge", "Skoll", "Surtur",
        "Anthe", "Jarnsaxa", "Greip", "Tarqeq", "Aegaeon",
        "S/2004 S7", "S/2004 S12", "S/2004 S13", "S/2004 S17",
        "S/2006 S1", "S/2006 S3", "S/2007 S2", "S/2007 S3",
    ]),
    (7, [  # 27 Uranian moons
        "Miranda", "Ariel", "Umbriel", "Titania", "Oberon", "Cordelia",
        "Ophelia", "Bianca", "Cressida", "Desdemona", "Juliet", "Portia",
        "Rosalind", "Belinda", "Puck", "Caliban", "Sycorax", "Prospero",
        "Setebos", "Stephano", "Trinculo", "Francisco", "Margaret",
        "Ferdinand", "Perdita", "Mab", "Cupid",
    ]),
    (8, [  # 14 Neptunian moons
        "Triton", "Nereid", "Naiad", "Thalassa", "Despina", "Galatea",
        "Larissa", "Proteus", "Halimede", "Psamathe", "Sao", "Laomedeia",
        "Neso", "Hippocamp",
    ]),
    (9, ["Charon", "Nix", "Hydra", "Kerberos", "Styx"]),
]


def _satellite_rows() -> list[tuple]:
    rows: list[tuple] = []
    sid = 0
    for planet_id, names in _SATELLITE_NAMES:
        for name in names:
            sid += 1
            if name in _MAJOR_SATELLITES:
                gm, radius, density, magnitude, albedo = _MAJOR_SATELLITES[name]
            else:
                h = _h(f"sat:{name}")
                gm = round(0.0001 + (h % 1000) / 10_000.0, 4)
                radius = round(1.0 + ((h >> 10) % 500) / 10.0, 1)
                density = round(0.5 + ((h >> 20) % 250) / 100.0, 2)
                magnitude = round(15.0 + ((h >> 30) % 110) / 10.0, 1)
                albedo = round(0.02 + ((h >> 40) % 60) / 100.0, 2)
            rows.append((sid, planet_id, name, gm, radius, density, magnitude, albedo))
    return rows


_SATELLITE_SCHEMA = (
    "id BIGINT, planetId BIGINT, name STRING, gm DOUBLE, radius DOUBLE, "
    "density DOUBLE, magnitude DOUBLE, albedo DOUBLE"
)


# --- $astronauts: 357 rows, 19 columns --------------------------------------

_REAL_ASTRONAUTS = [
    ("Neil A. Armstrong", 1962, 2, "Deceased", _D(1930, 8, 5),
     {"town": "Wapakoneta", "state": "OH"}, "Male",
     ["Purdue University", "University of Southern California"],
     "Aeronautical Engineering", "Aerospace Engineering", None, None,
     2, 206, 1, 2, ["Gemini 8", "Apollo 11"], _D(2012, 8, 25), None),
    ("Buzz Aldrin", 1963, 3, "Retired", _D(1930, 1, 20),
     {"town": "Montclair", "state": "NJ"}, "Male",
     ["US Military Academy", "MIT"],
     "Mechanical Engineering", "Astronautics", "Colonel", "US Air Force",
     2, 289, 4, 8, ["Gemini 12", "Apollo 11"], None, None),
    ("Sally K. Ride", 1978, 8, "Deceased", _D(1951, 5, 26),
     {"town": "Los Angeles", "state": "CA"}, "Female",
     ["Stanford University"], "Physics", "Physics", None, None,
     2, 343, 0, 0, ["STS-7", "STS-41-G"], _D(2012, 7, 23), None),
    ("John H. Glenn Jr.", 1959, 1, "Deceased", _D(1921, 7, 18),
     {"town": "Cambridge", "state": "OH"}, "Male",
     ["Muskingum College"], "Engineering", None, "Colonel", "US Marine Corps",
     2, 218, 0, 0, ["Mercury-Atlas 6", "STS-95"], _D(2016, 12, 8), None),
    ("Mae C. Jemison", 1987, 12, "Retired", _D(1956, 10, 17),
     {"town": "Decatur", "state": "AL"}, "Female",
     ["Stanford University", "Cornell University"],
     "Chemical Engineering", "Medicine", None, None,
     1, 190, 0, 0, ["STS-47"], None, None),
    ("Peggy A. Whitson", 1996, 16, "Active", _D(1960, 2, 9),
     {"town": "Mount Ayr", "state": "IA"}, "Female",
     ["Iowa Wesleyan College", "Rice University"],
     "Biology/Chemistry", "Biochemistry", None, None,
     4, 16061, 10, 60, ["STS-111", "Soyuz TMA-11", "Soyuz MS-03", "Ax-2"], None, None),
    ("Scott J. Kelly", 1996, 16, "Retired", _D(1964, 2, 21),
     {"town": "Orange", "state": "NJ"}, "Male",
     ["SUNY Maritime College", "University of Tennessee"],
     "Electrical Engineering", "Aviation Systems", "Captain", "US Navy",
     4, 12397, 3, 18, ["STS-103", "STS-118", "Soyuz TMA-01M", "Soyuz TMA-16M"], None, None),
    ("Ellen Ochoa", 1990, 13, "Retired", _D(1958, 5, 10),
     {"town": "Los Angeles", "state": "CA"}, "Female",
     ["San Diego State University", "Stanford University"],
     "Physics", "Electrical Engineering", None, None,
     4, 978, 0, 0, ["STS-56", "STS-66", "STS-96", "STS-110"], None, None),
    ("Gus Grissom", 1959, 1, "Deceased", _D(1926, 4, 3),
     {"town": "Mitchell", "state": "IN"}, "Male",
     ["Purdue University"], "Mechanical Engineering", None,
     "Lieutenant Colonel", "US Air Force",
     2, 5, 0, 0, ["Mercury-Redstone 4", "Gemini 3"], _D(1967, 1, 27), "Apollo 1"),
    ("Christa McAuliffe", 1985, 0, "Deceased", _D(1948, 9, 2),
     {"town": "Boston", "state": "MA"}, "Female",
     ["Framingham State College", "Bowie State University"],
     "History", "Education", None, None,
     1, 0, 0, 0, ["STS-51-L"], _D(1986, 1, 28), "STS-51-L"),
]

_FIRST_NAMES = [
    "James", "Mary", "Robert", "Patricia", "Michael", "Linda", "David",
    "Barbara", "William", "Susan", "Richard", "Karen", "Joseph", "Nancy",
    "Thomas", "Margaret", "Charles", "Carol", "Daniel", "Ruth",
]
_LAST_NAMES = [
    "Anderson", "Brooks", "Carter", "Davis", "Edwards", "Foster",
    "Garcia", "Harris", "Irwin", "Johnson", "Kelly", "Lewis", "Mitchell",
    "Nelson", "Olsen", "Parker", "Quinn", "Roberts", "Stewart", "Turner",
]
_MAJORS = [
    "Aerospace Engineering", "Physics", "Mechanical Engineering",
    "Electrical Engineering", "Mathematics", "Chemistry", "Biology",
    "Astronautics", "Geology", "Medicine",
]
_STATES = ["TX", "CA", "OH", "FL", "NY", "CO", "WA", "VA", "MI", "IL"]
_GROUP_YEARS = {  # NASA astronaut group -> selection year (public record)
    1: 1959, 2: 1962, 3: 1963, 4: 1965, 5: 1966, 6: 1967, 7: 1969,
    8: 1978, 9: 1980, 10: 1984, 11: 1985, 12: 1987, 13: 1990, 14: 1992,
    15: 1994, 16: 1996, 17: 1998, 18: 2000, 19: 2004, 20: 2009,
    21: 2013, 22: 2017,
}


def _astronaut_rows(total: int = 357) -> list[tuple]:
    rows = list(_REAL_ASTRONAUTS)
    i = 0
    while len(rows) < total:
        h = _h(f"astro:{i}")
        first = _FIRST_NAMES[h % len(_FIRST_NAMES)]
        last = _LAST_NAMES[(h >> 8) % len(_LAST_NAMES)]
        mid = chr(ord("A") + ((h >> 16) % 26))
        name = f"{first} {mid}. {last}"
        group = 1 + ((h >> 20) % 22)
        year = _GROUP_YEARS[group]
        gender = "Female" if (h >> 28) % 3 == 0 else "Male"
        status = ["Active", "Retired", "Deceased", "Management"][(h >> 30) % 4]
        birth = _D(year - 30 - ((h >> 32) % 10), 1 + ((h >> 36) % 12), 1 + ((h >> 40) % 28))
        flights = (h >> 44) % 5
        missions = [f"STS-{(h >> 48) % 135 + 1}"] * min(flights, 1) + (
            [f"Expedition {(h >> 52) % 60 + 1}"] if flights > 1 else []
        )
        death = _D(year + 40, 1 + ((h >> 56) % 12), 15) if status == "Deceased" else None
        rows.append((
            name, year, group, status, birth,
            {"town": f"{last}ville", "state": _STATES[(h >> 12) % len(_STATES)]},
            gender,
            [f"University of {_LAST_NAMES[(h >> 4) % len(_LAST_NAMES)]}"],
            _MAJORS[h % len(_MAJORS)],
            _MAJORS[(h >> 6) % len(_MAJORS)] if (h >> 9) % 2 else None,
            "Colonel" if (h >> 10) % 4 == 0 else None,
            "US Air Force" if (h >> 10) % 4 == 0 else None,
            flights, flights * (100 + (h >> 58) % 4000), (h >> 60) % 4,
            ((h >> 60) % 4) * 6, missions, death, None,
        ))
        i += 1
    return rows


_ASTRONAUT_SCHEMA = (
    "name STRING, year INT, `group` INT, status STRING, birth_date DATE, "
    "birth_place STRUCT<town: STRING, state: STRING>, gender STRING, "
    "alma_mater ARRAY<STRING>, undergraduate_major STRING, "
    "graduate_major STRING, military_rank STRING, military_branch STRING, "
    "space_flights INT, space_flight_hours INT, space_walks INT, "
    "space_walks_hours INT, missions ARRAY<STRING>, death_date DATE, "
    "death_mission STRING"
)


# --- $missions: 4630 rows, 8 columns ----------------------------------------

_REAL_MISSIONS = [
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

_COMPANIES = [
    ("RVSN USSR", "Baikonur, Kazakhstan", "Soyuz-U", "Retired"),
    ("NASA", "Kennedy Space Center, USA", "Space Shuttle", "Retired"),
    ("SpaceX", "Cape Canaveral, USA", "Falcon 9", "Active"),
    ("Arianespace", "Kourou, French Guiana", "Ariane 5", "Retired"),
    ("ULA", "Cape Canaveral, USA", "Atlas V", "Active"),
    ("CASC", "Jiuquan, China", "Long March 2D", "Active"),
    ("ISRO", "Sriharikota, India", "PSLV", "Active"),
    ("Roscosmos", "Plesetsk, Russia", "Soyuz 2.1a", "Active"),
    ("Rocket Lab", "Mahia, New Zealand", "Electron", "Active"),
    ("Northrop Grumman", "Wallops Island, USA", "Antares", "Active"),
    ("JAXA", "Tanegashima, Japan", "H-IIA", "Active"),
    ("Blue Origin", "West Texas, USA", "New Shepard", "Active"),
]


def _mission_rows(total: int = 4630) -> list[tuple]:
    rows = list(_REAL_MISSIONS)
    i = 0
    while len(rows) < total:
        h = _h(f"mission:{i}")
        company, location, rocket, r_status = _COMPANIES[h % len(_COMPANIES)]
        year = 1958 + ((h >> 8) % 66)  # 1958..2023 (Sputnik 1 stays first)
        launched = _T(year, 1 + ((h >> 16) % 12), 1 + ((h >> 20) % 28),
                      (h >> 26) % 24, (h >> 31) % 60)
        price = None if (h >> 37) % 4 == 0 else round(5.0 + ((h >> 40) % 4500) / 10.0, 1)
        outcome = "Failure" if (h >> 52) % 10 == 0 else "Success"
        rows.append((company, location, price, launched, rocket, r_status,
                     f"{rocket} Flight {i + 14}", outcome))
        i += 1
    return rows


_MISSION_SCHEMA = (
    "Company STRING, Location STRING, Price DOUBLE, Lauched_at TIMESTAMP, "
    "Rocket STRING, Rocket_Status STRING, Mission STRING, Mission_Status STRING"
)


# --- $stop_words: 305 common English words ----------------------------------

_STOP_WORDS = sorted(set("""
a about above after again against all also am an and any are as at be
because been before being below between both but by can cannot could did
do does doing down during each either few first for from further had has
have having he her here hers herself him himself his how i if in into is
it its itself just like made make many may me might more most much must
my myself never no nor not now of off on once one only or other our ours
ourselves out over own said same second she should since so some still
such than that the their theirs them themselves then there these they
this those through to too under until up upon us very was we well were
what when where which while who whom why will with within without would
you your yours yourself yourselves able across actually afterwards
against almost alone along already although always among amongst another
anybody anyone anything anywhere apart around aside away back became
become becomes becoming begin behind beside besides beyond came come
comes concerning consequently contain containing contains corresponding
course currently definitely described despite different done downwards
eight else elsewhere enough entirely especially even ever every everybody
everyone everything everywhere exactly example except far fifth five
followed following follows former formerly forth four furthermore get
gets getting given gives go goes going gone got gotten greetings happens
hardly hence henceforth hereafter hereby herein hereupon hi hither
hopefully howbeit however immediate inasmuch indeed indicate indicated
indicates inner insofar instead inward keep keeps kept know known knows
last lately later latter latterly least less lest let likely little look
looking looks ltd mainly meanwhile merely mostly mr mrs nearly
necessary need needs neither next nine nobody none noone normally nothing
novel nowhere obviously often oh ok okay old onto others otherwise ought
outside overall particular particularly per perhaps placed please plus
possible presumably probably provides que quite rather really reasonably
regarding regardless regards relatively respectively right saw say saying
says see seeing seem seemed seeming seems seen self selves sensible sent
serious seriously seven several shall somebody somehow someone something
sometime sometimes somewhat somewhere soon sorry specified specify
specifying sub sup sure take taken tell tends th thank thanks thanx thats
""".split()))[:305]


# --- $variables: MySQL-compatible system-variable surface (43 names) --------

from opteryx_spark import __version__ as _ENGINE_VERSION

_SYSTEM_VARIABLES: dict[str, tuple[str, object, str, str]] = {
    # name: (type, default, owner, visibility) — same standard surface as
    # the reference's shared/variables.py:52-96 (MySQL-compatible names)
    "auto_increment_increment": ("INTEGER", 1, "internal", "unrestricted"),
    "autocommit": ("BOOLEAN", True, "server", "unrestricted"),
    "character_set_client": ("VARCHAR", "utf8mb4", "server", "unrestricted"),
    "character_set_connection": ("VARCHAR", "utf8mb4", "server", "unrestricted"),
    "character_set_database": ("VARCHAR", "utf8mb4", "server", "unrestricted"),
    "character_set_results": ("VARCHAR", "utf8mb4", "server", "unrestricted"),
    "character_set_server": ("VARCHAR", "utf8mb4", "server", "unrestricted"),
    "collation_connection": ("VARCHAR", "utf8mb4_general_ci", "server", "unrestricted"),
    "collation_database": ("VARCHAR", "utf8mb4_general_ci", "server", "unrestricted"),
    "collation_server": ("VARCHAR", "utf8mb4_general_ci", "server", "unrestricted"),
    "external_user": ("VARCHAR", "", "internal", "restricted"),
    "init_connect": ("VARCHAR", "", "server", "restricted"),
    "interactive_timeout": ("INTEGER", 28800, "server", "unrestricted"),
    "license": ("VARCHAR", "Apache-2.0", "server", "restricted"),
    "lower_case_table_names": ("INTEGER", 0, "server", "restricted"),
    "max_allowed_packet": ("INTEGER", 67108864, "server", "restricted"),
    "max_execution_time": ("INTEGER", 0, "server", "unrestricted"),
    "net_buffer_length": ("INTEGER", 16384, "server", "restricted"),
    "net_write_timeout": ("INTEGER", 28800, "server", "restricted"),
    "performance_schema": ("BOOLEAN", False, "server", "restricted"),
    "sql_auto_is_null": ("BOOLEAN", False, "server", "restricted"),
    "sql_mode": ("VARCHAR", "ANSI", "server", "restricted"),
    "sql_select_limit": ("INTEGER", None, "server", "unrestricted"),
    "system_time_zone": ("VARCHAR", "UTC", "server", "unrestricted"),
    "time_zone": ("VARCHAR", "UTC", "server", "unrestricted"),
    "transaction_read_only": ("BOOLEAN", False, "server", "restricted"),
    "transaction_isolation": ("VARCHAR", "READ-COMMITTED", "server", "restricted"),
    "version": ("VARCHAR", _ENGINE_VERSION, "server", "restricted"),
    "version_comment": ("VARCHAR", "opteryx_spark", "server", "restricted"),
    "wait_timeout": ("INTEGER", 28800, "server", "restricted"),
    "event_scheduler": ("VARCHAR", "OFF", "server", "restricted"),
    "default_storage_engine": ("VARCHAR", "opteryx_spark", "server", "unrestricted"),
    "default_tmp_storage_engine": ("VARCHAR", "opteryx_spark", "server", "unrestricted"),
    "max_cache_evictions_per_query": ("INTEGER", 64, "user", "restricted"),
    "max_cacheable_item_size": ("INTEGER", 2097152, "server", "restricted"),
    "max_local_buffer_capacity": ("INTEGER", 268435456, "server", "restricted"),
    "max_read_buffer_capacity": ("INTEGER", 134217728, "server", "restricted"),
    "disable_optimizer": ("BOOLEAN", False, "user", "restricted"),
    "disable_high_priority": ("BOOLEAN", False, "server", "restricted"),
    "concurrent_reads": ("INTEGER", 4, "server", "restricted"),
    "user_memberships": ("ARRAY", [], "internal", "unrestricted"),
    "morsel_size": ("INTEGER", 67108864, "server", "restricted"),
    "architecture": ("VARCHAR", "spark", "server", "restricted"),
}


def register_virtual_datasets(spark: SparkSession) -> None:
    """Register the static virtual relations (once per session)."""
    spark.createDataFrame(_PLANETS, _PLANET_SCHEMA).createOrReplaceTempView("virtual_planets")
    # $no_table: one row, one column (reference no_table_data.py:27-32)
    spark.createDataFrame([(0,)], "`$column` BIGINT").createOrReplaceTempView("virtual_no_table")
    spark.createDataFrame(_satellite_rows(), _SATELLITE_SCHEMA).createOrReplaceTempView(
        "virtual_satellites"
    )
    spark.createDataFrame(_astronaut_rows(), _ASTRONAUT_SCHEMA).createOrReplaceTempView(
        "virtual_astronauts"
    )
    spark.createDataFrame(_mission_rows(), _MISSION_SCHEMA).createOrReplaceTempView(
        "virtual_missions"
    )
    spark.createDataFrame([(w,) for w in _STOP_WORDS], "value STRING").createOrReplaceTempView(
        "virtual_stop_words"
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

    ``$variables`` = the 43 system variables (overlaid with any SET
    values) plus user-defined ``@vars``; ``$statistics`` = 17 runtime
    counters (overlaid with any live values the cursor supplies).
    """
    var_rows = []
    for name, (vtype, default, owner, visibility) in _SYSTEM_VARIABLES.items():
        value = variables.get(name, default)
        var_rows.append((name, "" if value is None else str(value), vtype, owner, visibility))
    for name, value in sorted(variables.items()):
        if name not in _SYSTEM_VARIABLES:
            var_rows.append(
                (name, str(value), type(value).__name__.upper(), "user", "unrestricted")
            )
    spark.createDataFrame(
        var_rows, "name STRING, value STRING, type STRING, owner STRING, visibility STRING"
    ).createOrReplaceTempView("virtual_variables")

    stat_defaults = {
        "queries_executed": 0, "uptime_seconds": 0, "io_wait_seconds": 0,
        "cpu_wait_seconds": 0, "rows_read": 0, "bytes_read": 0,
        "scans_performed": 0, "plans_cached": 0, "shuffle_partitions": 0,
        "default_parallelism": 0, "executors": 1, "jobs_run": 0,
        "stages_run": 0, "tasks_run": 0, "cache_memory_used": 0,
        "cache_disk_used": 0, "broadcast_joins": 0,
    }
    merged = {**stat_defaults, **{k: v for k, v in statistics.items() if k in stat_defaults}}
    stat_rows = [(k, str(v)) for k, v in merged.items()]
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
