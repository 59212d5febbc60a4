"""Build the format-drift fixture overlay for the reference shape battery.

The reference's shape battery pins exact row counts against fixture
datasets its checkout does NOT ship (``flat/formats`` derives from a
100k-row tweets.jsonl; ``flat/different`` is a 196,902-row mixed-schema
set — only a psv sample and a build script are shipped).  Those counts
are properties of the missing DATA, so this tool synthesizes
shape-twins: deterministic tables constructed so every pinned predicate
count in ``test_shapes_*.py`` holds exactly, then overlays them on the
read-only reference testdata via a symlink farm.  No reference data is
copied; everything shipped is reached through symlinks.

Pinned constraints reproduced (tests/integration/sql_battery/test_shapes_*.py):

flat/formats/parquet + flat/formats/arrow — one 100,000-row, 13-column table:
  - user_verified IS TRUE = 711, IS FALSE = 99,289 (no NULLs)
  - user_verified IS TRUE AND followers < 1000 = 10
  - followers < 250 = 40,739; BETWEEN 0 AND 251 = 40,939 (no negatives)
  - COUNT(DISTINCT followers) = 10,016  (the GROUP BY followers subquery)
  - followers < 1000 AND user_name LIKE '%news%' = 12
  - user_name = 'Niran' = 1;  user_id = -1 = 0
  - COALESCE(is_reply_to, -1) < 0 = 74,765  (NULL count)

flat/formats/csv + flat/formats/tsv — one 33,529-row, 10-column table:
  - user_verified IS TRUE = 134

flat/different — 196,902 rows, 15-column UNION schema split across two
parquet files with drifted (14-column) schemas, exercising the padded
typed-NULL merge read (reference read_node.py:118-127):
  - following IS NULL = 9;  following < 10 = 7,814
  - GROUP BY is_quoting = 13,995 groups
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.feather as feather
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_TESTDATA = "/root/reference/testdata"
OVERLAY = os.path.join(REPO, ".data", "reference_fixtures")

_N_TWEETS = 100_000
_N_CSV = 33_529
_N_DIFF = 196_902


def _tweets_table() -> pa.Table:
    i = np.arange(_N_TWEETS, dtype=np.int64)

    followers = np.empty(_N_TWEETS, dtype=np.int64)
    followers[:40_739] = i[:40_739] % 249            # 249 distinct, all < 250
    followers[40_739:40_939] = 250 + (i[40_739:40_939] % 2)  # {250, 251}
    followers[40_939:] = 10_000                       # tail: one value...
    followers[40_939:50_704] = 10_000 + np.arange(9_765)  # ...plus 9,765 distinct
    # distinct = 249 + 2 + 9,765 = 10,016; < 1000 = 40,939; < 250 = 40,739

    verified = np.zeros(_N_TWEETS, dtype=bool)
    verified[:10] = True                  # the 10 verified with followers < 1000
    verified[60_000:60_701] = True        # the other 701 (followers = 10,000)

    names = np.array([f"u{k:06d}" for k in range(_N_TWEETS)], dtype=object)
    for k in range(20, 32):               # 12 '%news%' rows, all followers < 250
        names[k] = f"breaking_news_{k}"
    names[70_000] = "Niran"               # exactly one

    is_reply_to = i.astype(object)
    is_reply_to[:74_765] = None           # COALESCE(is_reply_to,-1) < 0 = 74,765

    return pa.table(
        {
            "tweet_id": pa.array(i),
            "user_id": pa.array(1_000 + i),
            "user_name": pa.array(names, type=pa.string()),
            "user_verified": pa.array(verified),
            "followers": pa.array(followers),
            "following": pa.array(i % 997),
            "is_reply_to": pa.array(is_reply_to, type=pa.int64()),
            "tweet_text": pa.array([f"text {k}" for k in range(_N_TWEETS)]),
            "lang": pa.array(np.where(i % 3 == 0, "en", "fr")),
            "location": pa.array([f"loc{k % 50}" for k in range(_N_TWEETS)]),
            "retweets": pa.array(i % 101),
            "likes": pa.array(i % 1_009),
            "created_at": pa.array([f"2024-01-{1 + k % 28:02d}" for k in range(_N_TWEETS)]),
        }
    )


def _csv_rows() -> list[str]:
    header = (
        "tweet_id,user_id,username,user_verified,followers,"
        "following,tweet_text,lang,retweets,likes"
    )
    rows = [header]
    for k in range(_N_CSV):
        rows.append(
            f"{k},{2000 + k},c{k:05d},{'true' if k < 134 else 'false'},"
            f"{k % 5000},{k % 700},csv text {k},en,{k % 97},{k % 1013}"
        )
    return rows


def _different_tables() -> tuple[pa.Table, pa.Table]:
    i = np.arange(_N_DIFF, dtype=np.int64)

    following = i.astype(object)
    following[:9] = None                                  # 9 NULLs
    following[9:7_823] = (i[9:7_823] - 9) % 10            # 7,814 rows < 10
    following[7_823:] = 100 + (i[7_823:] % 500)           # >= 10

    is_quoting = np.array([f"q{k % 13_995}" for k in range(_N_DIFF)], dtype=object)

    common = {
        "doc_id": pa.array(i),
        "following": pa.array(following, type=pa.int64()),
        "is_quoting": pa.array(is_quoting, type=pa.string()),
        "a": pa.array(i % 7),
        "b": pa.array(i % 11),
        "c": pa.array(i % 13),
        "d": pa.array([f"d{k % 5}" for k in range(_N_DIFF)]),
        "e": pa.array(i % 17),
        "f": pa.array(i % 19),
        "g": pa.array([f"g{k % 3}" for k in range(_N_DIFF)]),
        "h": pa.array(i % 23),
        "j": pa.array(i % 29),
        "k": pa.array(i % 31),
    }
    t = pa.table(
        {**common, "l": pa.array(i % 37), "m": pa.array(i % 41)}
    )
    cut = 100_000
    file1 = t.slice(0, cut).drop_columns(["m"])   # 14 cols, no 'm'
    file2 = t.slice(cut).drop_columns(["l"])      # 14 cols, no 'l' — union = 15
    return file1, file2


def _symlink_children(src_dir: str, dst_dir: str, skip: set[str] = frozenset()) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    for child in os.listdir(src_dir):
        if child in skip:
            continue
        link = os.path.join(dst_dir, child)
        if not os.path.lexists(link):
            os.symlink(os.path.join(src_dir, child), link)


def ensure(force: bool = False) -> str:
    """Build (idempotently) and return the overlay root."""
    stamp = os.path.join(OVERLAY, ".complete")
    if os.path.exists(stamp) and not force:
        return OVERLAY

    # overlay root: symlink everything shipped, then materialize the
    # synthesized branches (flat/formats/* additions and flat/different)
    _symlink_children(REFERENCE_TESTDATA, OVERLAY, skip={"flat"})
    flat = os.path.join(OVERLAY, "flat")
    _symlink_children(
        os.path.join(REFERENCE_TESTDATA, "flat"), flat, skip={"formats", "different"}
    )
    formats = os.path.join(flat, "formats")
    _symlink_children(os.path.join(REFERENCE_TESTDATA, "flat", "formats"), formats)

    tweets = _tweets_table()
    os.makedirs(os.path.join(formats, "parquet"), exist_ok=True)
    pq.write_table(tweets, os.path.join(formats, "parquet", "tweets.parquet"))
    os.makedirs(os.path.join(formats, "arrow"), exist_ok=True)
    feather.write_feather(
        tweets, os.path.join(formats, "arrow", "tweets.arrow"), compression="zstd"
    )

    rows = _csv_rows()
    os.makedirs(os.path.join(formats, "csv"), exist_ok=True)
    with open(os.path.join(formats, "csv", "tweets.csv"), "w") as fh:
        fh.write("\n".join(rows) + "\n")
    os.makedirs(os.path.join(formats, "tsv"), exist_ok=True)
    with open(os.path.join(formats, "tsv", "tweets.tsv"), "w") as fh:
        fh.write("\n".join(r.replace(",", "\t") for r in rows) + "\n")

    d1, d2 = _different_tables()
    diff_dir = os.path.join(flat, "different")
    os.makedirs(diff_dir, exist_ok=True)
    pq.write_table(d1, os.path.join(diff_dir, "part1.parquet"))
    pq.write_table(d2, os.path.join(diff_dir, "part2.parquet"))

    with open(stamp, "w") as fh:
        fh.write("ok\n")
    return OVERLAY


if __name__ == "__main__":
    print(ensure(force="--force" in os.sys.argv))
