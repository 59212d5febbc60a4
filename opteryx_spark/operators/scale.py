"""Scale utilities: skew-aware joins and co-partitioning helpers.

These encode the 100 TB playbook as reusable operators:

- :func:`salted_join` — explicit key-salting for joins whose hot keys
  overwhelm AQE's skew splitting (AQE only splits *partitions*, not a
  single hot key on the build side of a shuffle join);
- :func:`broadcast_threshold_join` — picks broadcast vs shuffle join by an
  explicit row estimate when statistics are absent (e.g. fresh temp views);
- :func:`write_bucketed` / :func:`read_bucketed` — persist a fact table
  bucketed by its join key so repeated joins/aggregations on that key run
  shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (large, skewed) side salted ``salt`` ways.

    The left side gets a random salt in [0, salt); the right side is
    exploded ``salt``× so every (key, salt) pair finds its match.  Use
    when one key holds a disproportionate share of rows — the classic
    null-key / celebrity-user / default-value skew.  Right-side blowup is
    ``salt``×, so keep the right side the smaller relation.

    Only inner/left/semi/anti joins are valid: an unmatched right row
    would survive once per salt replica under right/full joins.
    """
    if how.lower().replace("_", "") in ("right", "rightouter", "full", "fullouter", "outer"):
        raise ValueError(
            f"salted_join cannot express '{how}' joins (unmatched right rows "
            "would be duplicated per salt); salt the other side or use a plain join"
        )
    salted_l = left.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    salted_r = right.withColumn("__salt", salts)
    out = salted_l.join(salted_r, [key, "__salt"], how)
    return out.drop("__salt")


def broadcast_threshold_join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
    right_rows_estimate: int | None = None,
    broadcast_max_rows: int = 10_000_000,
) -> DataFrame:
    """Join with an explicit broadcast decision.

    Catalyst broadcasts by *byte* estimate, which is unavailable for some
    freshly-derived frames; when the caller knows the right side's row
    bound, an explicit hint avoids a needless shuffle of the big side.
    """
    if right_rows_estimate is not None and right_rows_estimate <= broadcast_max_rows:
        right = F.broadcast(right)
    return left.join(right, on, how)


def write_bucketed(
    df: DataFrame, path_table: str, key: str, buckets: int = 64, sort: bool = True
) -> None:
    """Persist bucketed-by-key (Hive bucketing): subsequent equi-joins and
    groupBys on ``key`` skip the shuffle entirely."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(path_table)


def read_bucketed(spark, table: str) -> DataFrame:
    return spark.table(table)


def explain_shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators in the plan — the scale cost metric."""
    from opteryx_spark.plans import explain_text

    text = explain_text(df)
    # formatted plans render left children of binary operators with ':'
    # tree prefixes (':- Exchange', ':  +- Exchange') — strip ALL tree
    # characters so those shuffles are counted too.  'ReusedExchange'
    # deliberately doesn't match (no new shuffle happens there).
    return sum(
        1
        for line in text.splitlines()
        if line.strip().lstrip(":+- ").startswith("Exchange")
    )


# 32-bit hash space of the md5 bucket (first 8 hex chars)
_BUCKET_SPACE = 4294967296


def _md5_bucket(key_col: str, salt: str = ""):
    """First 32 bits of md5(salt || key) as a long in [0, 2^32) — the ONE
    bucket definition shared by :func:`hash_sample` and
    :func:`split_assign`, so sampling and split assignment stay
    hash-consistent across operators by construction."""
    from pyspark.sql import functions as F

    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate_pct: float,
    salt: str = "",
) -> DataFrame:
    """Deterministic hash sampling: keep a row iff the first 32 bits of
    md5(salt || key) fall under ``rate_pct`` of the hash space.

    Properties a training pipeline needs that ``df.sample`` lacks:
    reproducible across runs/engines (md5 is engine-portable, unlike a
    seeded RNG), stable under repartitioning, and consistent across
    tables sharing the key (sampling users samples all their rows).
    Map-only — a pushed-down filter, no shuffle.  Rows with a NULL key
    are always dropped (a NULL cannot hash consistently; filter or
    assign surrogate keys first).
    """
    threshold = int(rate_pct / 100.0 * _BUCKET_SPACE)
    return df.filter(_md5_bucket(key_col, salt) < threshold)


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test split assignment by hashed key.

    ``splits`` maps split name -> fraction (must sum to <= 1; remainder
    falls into the LAST split).  The same md5-bucket machinery as
    :func:`hash_sample`: reproducible across runs, engines, and
    partitionings, and consistent across tables sharing the key (a user
    hashed into 'val' lands in 'val' in every table — no leakage between
    splits via joined tables).  Appends a ``split`` column; map-only.
    Rows with a NULL key get ``split = NULL`` (explicitly unassigned —
    they must never silently concentrate in one split).
    """
    from pyspark.sql import functions as F

    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = _md5_bucket(key_col, salt)
    space = _BUCKET_SPACE
    expr = None
    upper = 0.0
    names = list(splits)
    for name in names[:-1]:
        upper += splits[name]
        cond = bucket < int(upper * space)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(
        "split", F.when(F.col(key_col).isNotNull(), expr)
    )


def split_assign_grouped(
    df: DataFrame,
    pairs: DataFrame,
    splits: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every near-duplicate
    CLUSTER lands in one split.

    Splitting by raw id lets two near-identical documents straddle the
    train/test boundary — the classic eval-contamination leak exact dedup
    alone cannot close.  Here ``pairs`` (an ``(id1, id2)`` near-dup edge
    set from any of the dedup operators — Jaccard, MinHash-verified,
    SimHash, embedding cosine) is resolved to connected components, each
    document keys on its component label (singletons on their own id),
    and :func:`split_assign`'s md5-bucket machinery assigns the split —
    so the whole cluster moves together, reproducibly on any
    partitioning.  Appends ``comp`` (NULL for singletons) and ``split``
    (NULL for NULL ids, per the split contract).

    Scale: component resolution is the rounds-bounded label propagation
    of ``dedup.connected_components``; the assignment itself stays
    map-only over one id-keyed left join.
    """
    from pyspark.sql import functions as F

    from opteryx_spark.operators.dedup import connected_components

    comp = connected_components(pairs)
    joined = df.join(comp, df[id_col] == comp["node"], "left").drop("node")
    keyed = joined.withColumn(
        "_skey", F.coalesce(F.col("comp"), F.col(id_col)).cast("string")
    )
    out = split_assign(keyed, "_skey", splits, salt).drop("_skey")
    # NULL id => NULL split even though coalesce produced a NULL key
    # upstream (split_assign already guards on its key column)
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data-capture between two dataset snapshots: one row per
    changed key with ``op`` in {'insert', 'delete', 'update'} -- the diff
    a downstream consumer replays instead of re-reading the full new
    snapshot (snapshot-diff CDC, the pattern table formats expose as
    changefeeds, over plain frames).

    A key present only in ``new`` is an insert; only in ``old`` a
    delete; present in both with differing ``compare_cols`` (default:
    all non-key columns of ``new``) an update.  Value comparison is an
    md5 over the canonicalized concat of compare columns (NULL encoded
    distinctly from empty -- ``concat_ws`` alone would collapse them),
    so wide rows exchange one digest, not every column.

    Scale shape: one full outer join on the key (both sides hashed to
    the same partitioning) carrying only keys + digests; unchanged keys
    are filtered before the output projection.  Returns the key columns,
    ``op`` (STRING), ``old_digest``, ``new_digest`` (nullable).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    compare_cols = compare_cols or [c for c in new.columns if c not in key_cols]

    def digest(df):
        parts = []
        for c in compare_cols:
            parts.append(
                F.coalesce(
                    F.concat(F.lit("v:"), F.col(c).cast("string")), F.lit("null")
                )
            )
        return df.select(*key_cols, F.md5(F.concat_ws("", *parts)).alias("_d"))

    o = digest(old).withColumnRenamed("_d", "old_digest")
    n = digest(new).withColumnRenamed("_d", "new_digest")
    j = o.join(n, key_cols, "full_outer")
    op = (
        F.when(F.col("old_digest").isNull(), F.lit("insert"))
        .when(F.col("new_digest").isNull(), F.lit("delete"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("update"))
    )
    return j.withColumn("op", op).filter(F.col("op").isNotNull()).select(
        *key_cols, "op", "old_digest", "new_digest"
    )


def merge_rollups(
    base: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
    combine: list[tuple[str, str]],
) -> DataFrame:
    """Incremental-view-maintenance merge: combine a maintained rollup
    artifact with a freshly-aggregated delta batch so the result equals
    re-aggregating the full input — the IVM step that lets a 100 TB
    pipeline maintain hourly/daily rollups by touching only new data.

    ``combine`` lists ``(kind, col)`` with kind in {'sum', 'count',
    'min', 'max'}: sum/count columns ADD (missing side contributes 0 —
    both must carry re-aggregable partials: counts as COUNTs, sums in
    an exact type like DECIMAL, never pre-divided averages); min/max
    combine via least/greatest (which skip NULLs in Spark and DuckDB
    alike — a key absent on one side keeps the other side's extremum).

    Scale shape: ONE full outer equi join on the rollup key — both
    sides are already aggregates, so the frames exchanged are
    rollup-sized, not raw-data-sized; everything else is map-side
    arithmetic.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    kinds = {k for k, _ in combine}
    if not kinds <= {"sum", "count", "min", "max"}:
        raise ValueError(f"unsupported combine kind(s): {kinds - {'sum', 'count', 'min', 'max'}}")
    b = base.select(
        *key_cols, *[F.col(c).alias(f"_b_{c}") for _, c in combine]
    )
    d = delta.select(
        *key_cols, *[F.col(c).alias(f"_d_{c}") for _, c in combine]
    )
    j = b.join(d, key_cols, "full_outer")
    out_cols = [F.col(c) for c in key_cols]
    for kind, c in combine:
        lhs, rhs = F.col(f"_b_{c}"), F.col(f"_d_{c}")
        if kind in ("sum", "count"):
            zero = F.lit(0)
            merged = F.coalesce(lhs, zero) + F.coalesce(rhs, zero)
        elif kind == "min":
            merged = F.least(lhs, rhs)
        else:
            merged = F.greatest(lhs, rhs)
        out_cols.append(merged.alias(c))
    return j.select(*out_cols)


def temporal_split(
    df: DataFrame,
    ts_col: str,
    split_ts_us: int,
    embargo_minutes: int = 0,
) -> DataFrame:
    """Leakage-safe temporal train/test split: rows strictly before the
    split instant train, rows at/after ``split + embargo`` test, and the
    embargo buffer between them is EXCLUDED (the purge window financial
    ML uses so serially-correlated observations cannot leak across the
    boundary; random splits on time-series data are the classic
    evaluation bug this operator exists to prevent).

    Pure map-only expression — appends ``split`` ('train' | 'embargo' |
    'test'; NULL timestamp ⇒ NULL split, by the engine's NULL-key
    contract).  Filter on it and write; at scale pair with
    ``layout.write_hive_partitioned(..., ["split"])`` so both sides
    partition-prune.
    """
    if embargo_minutes < 0:
        raise ValueError("embargo_minutes must be >= 0")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    hi = int(split_ts_us) + int(embargo_minutes) * 60 * 1_000_000
    return df.withColumn(
        "split",
        F.when(us < F.lit(int(split_ts_us)), F.lit("train"))
        .when(us >= F.lit(hi), F.lit("test"))
        .when(us.isNotNull(), F.lit("embargo")),
    )


def backtest_folds(
    df: DataFrame,
    ts_col: str,
    cuts_us: list[int],
    horizon_minutes: int,
    embargo_minutes: int = 0,
) -> DataFrame:
    """Rolling-origin backtest assignment — the time-series
    cross-validation counterpart of :func:`temporal_split`: each fold f
    trains on everything strictly before its cut instant and tests on
    the ``horizon_minutes`` window that starts ``embargo_minutes``
    after the cut (the purge gap, same rationale as temporal_split).
    Rows in a fold's embargo gap or beyond its test window simply don't
    participate in that fold; NULL timestamps participate in none.

    Map-only: one explode over the (tiny, literal) fold-spec array —
    a row lands in at most ``len(cuts_us)`` folds, no shuffle, no
    window.  At scale, aggregate or write per (fold, role) directly;
    each fold is an independent training run anyway.

    Returns the input columns + ``fold`` (BIGINT, index into
    ``cuts_us``) and ``role`` ('train' | 'test'), one output row per
    (input row, participating fold).
    """
    if not cuts_us:
        raise ValueError("cuts_us must be non-empty")
    if horizon_minutes <= 0:
        raise ValueError("horizon_minutes must be > 0")
    if embargo_minutes < 0:
        raise ValueError("embargo_minutes must be >= 0")
    emb = int(embargo_minutes) * 60 * 1_000_000
    hor = int(horizon_minutes) * 60 * 1_000_000
    specs = F.array(
        *[
            F.struct(
                F.lit(i).cast("bigint").alias("fold"),
                F.lit(int(c)).alias("cut_us"),
            )
            for i, c in enumerate(cuts_us)
        ]
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    e = df.withColumn("_us", us).withColumn("_f", F.explode(specs))
    lo = F.col("_f.cut_us") + F.lit(emb)
    role = (
        F.when(F.col("_us") < F.col("_f.cut_us"), F.lit("train"))
        .when((F.col("_us") >= lo) & (F.col("_us") < lo + F.lit(hor)), F.lit("test"))
    )
    return (
        e.withColumn("role", role)
        .filter(F.col("_us").isNotNull() & F.col("role").isNotNull())
        .select(*df.columns, F.col("_f.fold").alias("fold"), "role")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str,
    epoch: int,
    n_shards: int,
) -> DataFrame:
    """Deterministic epoch shuffle for training-data ordering: assign
    every row a shard and a position such that (a) the order is
    pseudo-random, (b) every epoch gets a DIFFERENT order, and (c) the
    whole assignment is a pure function of (seed, epoch, id) — rerun
    the job, resume mid-epoch, or re-materialize a shard on another
    cluster and the order is identical.  The data-loading counterpart
    of :func:`split_assign` (same md5 machinery, same reproducibility
    guarantees).

    ``shard = md5_32(seed:epoch:id) mod n_shards`` and ``pos`` ranks by
    the full md5 hex within the shard (id tiebreak for the
    astronomically-unlikely digest collision).  One shard-partitioned
    window — writers then emit one file per (epoch, shard), and a
    trainer streams shards in any order knowing each is internally
    shuffled.

    NULL ids are excluded by contract (no identity → no stable
    position).

    Returns ``id_col``, ``shard`` (BIGINT), ``pos`` (BIGINT, 1-based
    within shard).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.md5(
        F.concat_ws(
            ":", F.lit(seed), F.lit(str(int(epoch))), F.col(id_col).cast("string")
        )
    )
    bucket = F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
    base = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col), key.alias("_key"), (bucket % F.lit(int(n_shards))).alias("shard")
    )
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    return base.select(
        id_col,
        F.col("shard").cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


def negative_sample(
    df: DataFrame,
    id_col: str,
    seed: str,
    k: int = 4,
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: every
    anchor row gets ``k`` pseudo-random negatives, as a pure function of
    ``(seed, anchor id, j)`` — rerun the job anywhere and the pairs are
    identical (the :func:`split_assign` / :func:`epoch_shuffle`
    reproducibility contract, same md5 machinery).

    Scale design: a naive "pick the row at random global position p"
    needs a TOTAL enumeration of the corpus — a single-partition sort at
    100 TB.  Instead the corpus is hashed into ``n_buckets`` buckets
    (``md5_32(seed:b:id) mod n_buckets``) and each bucket elects one
    deterministic representative (min (digest, id) — a bucket-keyed
    window over ~N/B rows); an anchor's j-th negative is the
    representative of bucket ``md5_32(seed:n:id:j) mod n_buckets``.
    The representative table is ``n_buckets`` rows — broadcast — so the
    whole operator is one bucket-partitioned window + one broadcast
    join; no global ordering anywhere.

    Self-pairs (the anchor IS the target bucket's representative) are
    dropped, as are ``j`` values whose target bucket is empty — both
    deterministic, both sides of an oracle agree.  NULL ids are excluded
    (no identity).  Negatives are sampled from the same ``df``
    population; callers wanting cross-table negatives pass the union.

    Returns ``anchor_id``, ``j`` (BIGINT, 0-based draw index),
    ``neg_id``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if k < 1 or n_buckets < 1:
        raise ValueError("k and n_buckets must be >= 1")

    def _bucket32(key):
        return F.conv(F.substring(key, 1, 8), 16, 10).cast("long")

    ids = df.filter(F.col(id_col).isNotNull()).select(F.col(id_col).alias("_id"))
    bkey = F.md5(F.concat_ws(":", F.lit(seed), F.lit("b"), F.col("_id").cast("string")))
    bucketed = ids.select(
        "_id", bkey.alias("_bk"), (_bucket32(bkey) % F.lit(int(n_buckets))).alias("_b")
    )
    w = Window.partitionBy("_b").orderBy("_bk", "_id")
    reps = (
        bucketed.select("_id", "_b", F.row_number().over(w).alias("_rn"))
        .filter(F.col("_rn") == 1)
        .select(F.col("_b").alias("_tb"), F.col("_id").alias("neg_id"))
    )
    draws = ids.select(
        F.col("_id").alias("anchor_id"),
        F.explode(F.array(*[F.lit(j).cast("bigint") for j in range(int(k))])).alias("j"),
    )
    tkey = F.md5(
        F.concat_ws(
            ":",
            F.lit(seed),
            F.lit("n"),
            F.col("anchor_id").cast("string"),
            F.col("j").cast("string"),
        )
    )
    targeted = draws.select(
        "anchor_id", "j", (_bucket32(tkey) % F.lit(int(n_buckets))).alias("_tb")
    )
    return (
        targeted.join(F.broadcast(reps), "_tb")
        .filter(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", "j", "neg_id")
    )


def balanced_downsample(
    df: DataFrame,
    label_col: str,
    id_col: str,
    seed: str = "bal",
) -> DataFrame:
    """Deterministic class-balanced downsampling: keep exactly
    ``min(class size)`` rows of EVERY class, chosen by md5 order — the
    classifier-training prep that kills majority-class dominance
    without the usual nondeterministic ``sampleBy`` (rerun the job
    anywhere, same subset: the :func:`split_assign` reproducibility
    contract).

    Per class the keep-set is the first ``n_min`` rows ranked by
    ``md5(seed:id)`` (id tiebreak) — a label-partitioned window, NOT a
    global sort; the minority size rides along as a broadcast 1-row
    frame.  Rows with NULL label or id are excluded (no class / no
    identity).  Note this keeps the minority class INTACT (rank ≤ its
    own size) — only larger classes shrink.

    Returns the input columns of the kept rows plus ``_keep_rank``
    (BIGINT) for auditability.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    base = df.filter(F.col(label_col).isNotNull() & F.col(id_col).isNotNull())
    n_min = F.broadcast(
        base.groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.min("_n").alias("_n_min"))
    )
    key = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(label_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        base.select("*", F.row_number().over(w).cast("bigint").alias("_keep_rank"))
        .crossJoin(n_min)
        .filter(F.col("_keep_rank") <= F.col("_n_min"))
        .drop("_n_min")
    )


def stratified_kfold(
    df: DataFrame,
    strata_cols: list[str],
    k: int = 5,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic stratified k-fold assignment — the cross-validation
    counterpart of :func:`split_assign`'s fractional buckets: within
    every stratum, rows take folds ``0..k-1`` round-robin in the
    canonical md5-of-(salt||id) order, so every fold holds each
    stratum's count within ±1 (EXACTLY balanced, which hash-range
    bucketing cannot guarantee) and the assignment is a pure function of
    (salt, id, stratum contents) — reproducible across runs, engines and
    partitionings.

    Shape: ONE bounded per-stratum window (row_number over the md5
    order) — the quota-sampler shape; no shuffle beyond the stratum
    key.  NULL ids excluded (no deterministic order for them).

    Returns ``id_col`` + ``strata_cols`` + ``fold`` (BIGINT, 0-based).
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    return df.filter(F.col(id_col).isNotNull()).select(
        id_col,
        *strata_cols,
        ((F.row_number().over(w) - 1) % F.lit(int(k))).cast("bigint").alias("fold"),
    )
