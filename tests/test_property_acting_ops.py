"""Randomized property check for the ACTING dedup/boilerplate operators.

Seeded random corpora (small vocab => dense collisions) are run through
the Spark operators and compared against straight-line Python reference
implementations of the documented contracts — coverage the fixed
fixtures and SQL oracles can't give (they share blind spots with the
fixture generator).  Models the reference's engine-comparison fuzzers
(SURVEY.md §5 tier-4), seeded for determinism.
"""

from __future__ import annotations

import hashlib
import random

VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff"]


def _gen_corpus(rng: random.Random, n_docs: int = 18):
    rows = []
    for i in range(n_docs):
        n_lines = rng.randint(0, 4)
        lines = [
            " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 6)))
            for _ in range(n_lines)
        ]
        text = "\n".join(lines)
        if rng.random() < 0.1:
            text = None
        rows.append((i, text))
    # hard duplicates: replay a random earlier doc under a new id
    for j in range(3):
        src = rows[rng.randrange(n_docs)][1]
        rows.append((100 + j, src))
    return rows


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _ref_remove_lines(rows, min_doc_freq):
    per_doc, freq = {}, {}
    for i, text in rows:
        if text is None:
            per_doc[i] = None
            continue
        lines = [ln.strip() for ln in text.split("\n")]
        lines = [ln for ln in lines if ln != ""]
        per_doc[i] = lines
        for ln in set(lines):
            freq[ln] = freq.get(ln, 0) + 1
    hot = {ln for ln, c in freq.items() if c >= min_doc_freq}
    out = {}
    for i, lines in per_doc.items():
        if lines is None:
            out[i] = (None, None, None)
            continue
        kept = [ln for ln in lines if ln not in hot]
        out[i] = (len(lines), len(lines) - len(kept), "\n".join(kept))
    return out


def _ref_remove_chunks(rows, ct, mct):
    chunks = []  # (doc, idx, text, eligible)
    for i, text in rows:
        if text is None:
            continue
        toks = [t for t in text.split(" ") if t != ""]
        n_chunks = max(-(-len(toks) // ct), 1)
        for j in range(n_chunks):
            c = " ".join(toks[j * ct : j * ct + ct])
            chunks.append((i, j, c, len([t for t in c.split(" ") if t != ""]) >= mct))
    keeper, count = {}, {}
    for i, j, c, el in chunks:
        if not el:
            continue
        count[c] = count.get(c, 0) + 1
        k = (_md5(str(i)), i, j)
        if c not in keeper or k < keeper[c][0]:
            keeper[c] = (k, (i, j))
    out = {}
    for i, text in rows:
        if text is None:
            out[i] = (None, None, None)
            continue
        mine = [(j, c, el) for (d, j, c, el) in chunks if d == i]
        kept = [
            c
            for (j, c, el) in mine
            if not (el and count[c] >= 2 and keeper[c][1] != (i, j))
        ]
        out[i] = (len(mine), len(mine) - len(kept), " ".join(kept))
    return out


def test_acting_ops_match_python_reference(spark):
    from opteryx_spark.operators import dedup, filtering

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        rows = _gen_corpus(rng)
        df = spark.createDataFrame(rows, ["doc_id", "text"])

        got = {
            r.doc_id: (r.n_lines, r.n_boilerplate_lines, r.cleaned_text)
            for r in filtering.remove_boilerplate_lines(df, min_doc_freq=2).collect()
        }
        assert got == _ref_remove_lines(rows, 2), f"lines diverged (seed {seed})"

        flat = [
            (i, t.replace("\n", " ") if t is not None else None) for i, t in rows
        ]
        fdf = spark.createDataFrame(flat, ["doc_id", "text"])
        got2 = {
            r.doc_id: (r.n_chunks, r.n_removed_chunks, r.cleaned_text)
            for r in dedup.remove_duplicate_chunks(
                fdf, chunk_tokens=3, min_chunk_tokens=2
            ).collect()
        }
        assert got2 == _ref_remove_chunks(flat, 3, 2), f"chunks diverged (seed {seed})"


def _ref_sessionize(rows, gap_us):
    """Straight-line reference of the sessionize contract: per user, sort
    by (ts_us, event_id), break on gap > gap_us, reduce per session."""
    from collections import defaultdict

    per_user = defaultdict(list)
    for eid, uid, ts_us, value in rows:
        if uid is None or ts_us is None:
            continue
        per_user[uid].append((ts_us, eid, value))
    out = {}
    for uid, evs in per_user.items():
        evs.sort()
        sid, prev = 0, None
        sessions = defaultdict(list)
        for ts_us, eid, value in evs:
            if prev is None or ts_us - prev > gap_us:
                sid += 1
            prev = ts_us
            sessions[sid].append((ts_us, value))
        for sid, items in sessions.items():
            tss = [t for t, _ in items]
            vals = [v for _, v in items if v is not None]
            out[(uid, sid)] = (
                min(tss),
                max(tss),
                max(tss) - min(tss),
                len(items),
                round(sum(vals), 6) if vals else None,
            )
    return out


def test_sessionize_matches_straightline_reference(spark):
    import datetime
    import random as _random

    from opteryx_spark.operators import events as E

    rng = _random.Random(20260814)
    rows = []
    for eid in range(400):
        uid = rng.choice([None, 1, 2, 3, 4, 5]) if rng.random() < 0.05 else rng.randint(1, 5)
        ts_us = None if rng.random() < 0.03 else rng.randint(0, 6 * 3600) * 1_000_000
        value = None if rng.random() < 0.1 else round(rng.uniform(0, 50), 2)
        rows.append((eid, uid, ts_us, value))

    epoch = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (
                eid,
                (epoch + datetime.timedelta(microseconds=ts_us)) if ts_us is not None else None,
                uid,
                value,
            )
            for eid, uid, ts_us, value in rows
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    got = {
        (r.user_id, r.session_id): (
            int(r.session_start.timestamp() * 1e6) - int(epoch.timestamp() * 1e6),
            int(r.session_end.timestamp() * 1e6) - int(epoch.timestamp() * 1e6),
            r.duration_us,
            r.n_events,
            round(r.total_value, 6) if r.total_value is not None else None,
        )
        for r in E.sessionize(df, gap_minutes=30).collect()
    }
    want = _ref_sessionize(rows, 30 * 60 * 1_000_000)
    assert got == want
