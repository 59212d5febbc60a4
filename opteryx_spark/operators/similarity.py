"""Vector similarity search over embedding columns (array<float>).

- :func:`cosine` — JVM-side cosine expression with exact-decimal
  accumulation so results are bit-deterministic across engines.
- :func:`cosine_topk` — brute-force top-k against one query vector:
  a map-only scan + TakeOrderedAndProject (no shuffle of the corpus).
- :func:`cosine_pairs` — all-pairs above a threshold (test-scale oracle
  baseline; O(n²), use the LSH variant at scale).
- :func:`hyperplane_lsh_topk` — random-hyperplane LSH: signature →
  bucket equality join; the 100 TB path (corpus shuffled once on bucket
  key, probes broadcast).

Reference parity: ``COSINE_SIMILARITY`` (``opteryx/functions/__init__.py:611``).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opteryx_spark.operators.dedup import _spread

def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in doubles.

    Element products and the fold order are fixed (left-to-right), so the
    result is bit-deterministic and reproducible by any engine that folds
    sequentially (DuckDB twin: ``list_reduce(list_transform(...), +)``).
    Stays a JVM higher-order function — no Python, no shuffle.
    """
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: the exact baseline every ANN variant is
    measured against.  Map-side expression + top-k, no corpus shuffle."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        _spread(df).select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosim"))
        .orderBy(F.desc("cosim"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine >= threshold (embedding near-dup detection).

    O(n²) — correctness baseline and small-corpus path.  At scale use
    :func:`hyperplane_lsh_topk` buckets as the candidate generator.
    """
    # per-row norms precomputed on each side (r11): the O(n²) pair
    # condition otherwise re-folds BOTH vector norms per pair — one dot
    # fold per pair instead of three, bit-identical (sqrt(dot(v,v)) is
    # the same IEEE expression per row as it was per pair); measured
    # 8.0 s -> 2.9 s on the 2000-vector sf0.1 entry
    a = _spread(df).select(
        F.col(id_col).alias("id1"),
        F.col(vec_col).alias("v1"),
        _norm(F.col(vec_col)).alias("_n1"),
    )
    b = df.select(
        F.col(id_col).alias("id2"),
        F.col(vec_col).alias("v2"),
        _norm(F.col(vec_col)).alias("_n2"),
    )
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            (_dot(F.col("v1"), F.col("v2")) / (F.col("_n1") * F.col("_n2"))).alias(
                "cosim"
            ),
        )
        .filter(F.col("cosim") >= threshold)
    )


def lsh_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    bands: int = 8,
    planes_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket: int = 10_000,
    dim: int | None = None,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Embedding near-dup pairs at scale: banded hyperplane LSH candidates
    refined with exact cosine (the scale path :func:`cosine_pairs` points
    to).

    ``bands`` independent signatures of ``planes_per_band`` sign bits
    each; vectors sharing any band signature become candidates (shuffle
    keyed by (band, sig) — bucket-local, never all-pairs), then the exact
    cosine filter keeps true pairs.  Candidate recall for similarity
    ``s = cos(θ)`` is ``1-(1-p^r)^b`` with ``p = 1-θ/π`` — 8×4 default
    gives ≈0.97 at s=0.9.  ``max_bucket`` anti-joins pathological buckets
    (e.g. all-zero spam vectors) to keep fan-out linear.

    ``dim`` avoids a setup probe when known; otherwise one scalar
    ``first()`` reads it (plan-build time, not per-row).

    ``planes`` overrides the Gaussian hyperplanes with an explicit
    ``bands*planes_per_band x dim`` matrix — scale is irrelevant to the
    sign test, so any full-direction-coverage matrix works; an integer
    matrix both engines can generate arithmetically makes the whole
    algorithm reproducible in a SQL oracle (the suite's portable twin).
    """
    if planes is not None and dim is None:
        dim = len(planes[0])
    if dim is None:
        probe = df.select(F.size(vec_col).alias("d")).filter(F.col("d") > 0).first()
        if probe is None:
            raise ValueError(
                "cannot infer embedding dim (empty input or all-NULL "
                f"'{vec_col}'); pass dim= explicitly"
            )
        dim = probe["d"]
    if planes is None:
        planes = random_hyperplanes(dim, bands * planes_per_band, seed)
    elif len(planes) != bands * planes_per_band:
        raise ValueError("planes must have bands*planes_per_band rows")
    band_sigs = []
    for i in range(bands):
        sig = F.lit(0)
        for j in range(planes_per_band):
            p = F.array(*[F.lit(float(v)) for v in planes[i * planes_per_band + j]])
            sig = sig + F.when(_dot(F.col(vec_col), p) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        band_sigs.append(F.struct(F.lit(i).alias("band"), sig.alias("sig")))
    # r11 (guide §2.4/§1.2): the bucket frame feeds BOTH sides of the
    # candidate self-join, and the broadcast side cannot reuse the shuffle
    # side's exchange — without a persist the whole signature subtree
    # (bands·planes dot folds per row + the bucket-cap window) executes
    # twice.  The per-row norm is precomputed HERE so the per-pair cosine
    # is one dot fold + a multiply/divide instead of three folds (norms
    # were re-folded per candidate pair — measured 4x on the sf0.1 entry:
    # 11.4 s -> 2.8 s, bit-identical since sqrt(dot(v,v)) is the same
    # IEEE expression either way).  Release-at-start keeps repeated
    # invocations self-contained (the _text_groups discipline) — but only
    # the recomputable persisted frames: draining checkpoint handles here
    # would break earlier unmaterialized localCheckpoint results
    # (ADVICE r11).
    from opteryx_spark.operators.dedup import _track_persist, release_persisted_caches

    release_persisted_caches()
    buckets = _spread(df).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("_n"),
        F.explode(F.array(*band_sigs)).alias("b"),
    ).select("id", "v", "_n", F.col("b.band").alias("band"), F.col("b.sig").alias("sig"))
    if max_bucket is not None:
        # window-count cap rides the candidate join's own (band, sig)
        # partitioning — same formulation as dedup.minhash_lsh_pairs
        from pyspark.sql import Window

        w = Window.partitionBy("band", "sig")
        buckets = (
            buckets.withColumn("_bc", F.count(F.lit(1)).over(w))
            .filter(F.col("_bc") <= max_bucket)
            .drop("_bc")
        )
    buckets = _track_persist(buckets)
    a, b = buckets.alias("a"), buckets.alias("b")
    # cosine is computed BEFORE the pair dedup so the dedup exchange
    # carries (id1, id2, double) instead of two full embedding vectors —
    # duplicate band-pairs carry identical cosim, so min() is exact
    # dedup (the same shuffle-slim the MinHash/SimHash paths use)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            (_dot(F.col("a.v"), F.col("b.v")) / (F.col("a._n") * F.col("b._n"))).alias(
                "cosim"
            ),
        )
        .filter(F.col("cosim") >= threshold)
        .groupBy("id1", "id2")
        .agg(F.min("cosim").alias("cosim"))
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-projection bit signature (as long) for random-hyperplane LSH."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(_dot(vec, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = sig + bit
    return sig


def hyperplane_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    probe_radius: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: brute force restricted to the query's LSH bucket and its
    Hamming-ball neighbors (multiprobe).

    The corpus is signed once (map-only expression — at scale you persist
    the ``bucket`` column and partition by it); the probe set of bucket
    ids is tiny and pushed down as an IN filter, so each query touches
    ~|ball|/2^n_planes of the data.  ``probe_radius`` trades recall for
    scan fraction: radius 2 on 8 planes probes 37/256 ≈ 14% of buckets.
    """
    planes = random_hyperplanes(len(query_vec), n_planes, seed)
    signed = _spread(df).select(
        F.col(id_col), F.col(vec_col), hyperplane_signature(F.col(vec_col), planes).alias("bucket")
    )
    qsig = 0
    for i, plane in enumerate(planes):
        dot = sum(float(a) * float(b) for a, b in zip(query_vec, plane))
        if dot >= 0:
            qsig |= 1 << i
    probe = {qsig}
    frontier = {qsig}
    for _ in range(probe_radius):
        frontier = {s ^ (1 << i) for s in frontier for i in range(n_planes)} - probe
        probe |= frontier
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        signed.filter(F.col("bucket").isin(sorted(probe)))
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosim"))
        .orderBy(F.desc("cosim"), F.asc(id_col))
        .limit(k)
    )


def l2_norms(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    return df.select(F.col(id_col), _norm(F.col(vec_col)).alias("l2_norm"))


def ivf_index(
    df: DataFrame,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: k-means centroids + per-vector cluster id.

    The scale path for ANN beyond hyperplane LSH: train centroids on a
    sample (driver-side k-means fit over MLlib), assign every vector its
    nearest centroid (map-only), and persist/partition by ``cluster`` so
    a query probes only the closest nprobe partitions.
    Returns (assigned_df, centroids).  Rows with a NULL vector are
    dropped up front — MLlib's array_to_vector NPEs on NULL and a
    missing encode cannot be indexed (same drop-don't-crash contract as
    the cosine paths, which yield NULL similarity for them).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    data = _spread(df.filter(F.col(vec_col).isNotNull())).select(
        F.col(id_col), F.col(vec_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    model = KMeans(k=n_clusters, seed=seed, featuresCol="features").fit(data)
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    assigned = model.transform(data).select(
        F.col(id_col), F.col(vec_col), F.col("prediction").alias("cluster")
    )
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k over an IVF index: probe the nprobe nearest centroids'
    inverted lists only (an IN filter on the cluster column — partition
    pruning when the index is written partitioned by cluster)."""

    def dist2(c):
        return sum((float(a) - float(b)) ** 2 for a, b in zip(c, query_vec))

    probe = sorted(range(len(centroids)), key=lambda i: dist2(centroids[i]))[:nprobe]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        assigned.filter(F.col("cluster").isin(probe))
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosim"))
        .orderBy(F.desc("cosim"), F.asc(id_col))
        .limit(k)
    )


def ivf_persist(
    assigned: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index partitioned by cluster.

    ``partitionBy("cluster")`` turns each inverted list into its own
    directory, so a query's nprobe IN-filter becomes *partition pruning*
    at the scan (the plan's PartitionFilters) — at 100 TB the query
    touches nprobe/n_clusters of the bytes, not a post-scan filter.
    Centroids ride along as a tiny parquet sidecar written through the
    same filesystem layer as the index, so the whole artifact works on
    any Hadoop-compatible path (s3a://, gs://, hdfs://), not just the
    local disk a driver-side open() could reach.
    """
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(path)
    spark = assigned.sparkSession
    rows = [(i, [float(v) for v in c]) for i, c in enumerate(centroids)]
    spark.createDataFrame(rows, "cluster int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(path.rstrip("/") + "_centroids")


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k against a persisted IVF index — the partition-pruned
    scale path (only the nprobe nearest clusters' files are read)."""
    crows = (
        spark.read.parquet(path.rstrip("/") + "_centroids").orderBy("cluster").collect()
    )
    centroids = [r["centroid"] for r in crows]

    def dist2(c):
        return sum((float(a) - float(b)) ** 2 for a, b in zip(c, query_vec))

    probe = sorted(range(len(centroids)), key=lambda i: dist2(centroids[i]))[:nprobe]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        spark.read.parquet(path)
        .filter(F.col("cluster").isin(probe))
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosim"))
        .orderBy(F.desc("cosim"), F.asc(id_col))
        .limit(k)
    )


def quantize_int8(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = 127/max|v|,
    q_i = floor(v_i*scale + 0.5) (explicit floor keeps the rounding
    identical across engines).  4x memory cut for ANN shortlists at
    scale; map-only, no shuffle.  Returns (id, qvec array<int>, scale)
    where scale reconstructs approximate floats (v ≈ q/scale)."""
    c = F.col(vec_col)
    maxabs = F.array_max(F.transform(c, lambda x: F.abs(x.cast("double"))))
    scale = F.when(maxabs > 0, F.lit(127.0) / maxabs).otherwise(F.lit(0.0))
    qvec = F.transform(
        c, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("int")
    )
    return df.select(
        F.col(id_col),
        qvec.alias("qvec"),
        scale.cast("double").alias("scale"),
    )


def sq8_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SQ8 ANN: shortlist in the int8-quantized domain, exact-cosine
    rescore — the scalar-quantization scale path (4x less memory
    bandwidth on the scan; the standard FAISS ``SQ8`` recipe).

    Corpus and query are symmetric-int8 quantized with
    :func:`quantize_int8`'s arithmetic; the shortlist ranks by the exact
    INTEGER dot product (no float noise — bit-deterministic on any
    engine), takes ``shortlist`` (default ``4*k``) candidates with an id
    tiebreak, then rescores those with exact double cosine for the final
    top-``k``.  Fully deterministic end to end, so a SQL oracle can twin
    the whole algorithm.  Shape: one map pass + top-s + a k-sized join —
    no all-pairs; recall vs brute force is the usual SQ8 trade, measured
    by the recall unit test.
    """
    import math

    s = shortlist or 4 * k
    q8 = quantize_int8(df, id_col, vec_col)
    qmax = max(abs(float(v)) for v in query_vec)
    qscale = 127.0 / qmax if qmax > 0 else 0.0
    qq = [math.floor(float(v) * qscale + 0.5) for v in query_vec]
    qarr = F.array(*[F.lit(int(v)).cast("long") for v in qq])
    dot = F.aggregate(
        F.zip_with(F.col("qvec"), qarr, lambda a, b: a.cast("long") * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sl = (
        q8.select(F.col(id_col), dot.alias("qdot"))
        .orderBy(F.desc("qdot"), F.asc(id_col))
        .limit(s)
    )
    qv = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        df.join(sl, id_col)
        .select(F.col(id_col), cosine(F.col(vec_col), qv).alias("cosim"))
        .orderBy(F.desc("cosim"), F.asc(id_col))
        .limit(k)
    )


def semantic_dedup(
    df: DataFrame,
    cluster_col: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-shape semantic deduplication (Abbas et al. 2023): pairwise
    cosine only *within* a cluster, drop every vector that has a
    lower-id neighbor above the threshold (deterministic keep-lowest-id
    rule).  Returns the surviving rows.

    The cluster column bounds the quadratic term: pairs join on
    ``cluster_col`` equality, so cost is sum over clusters of |c|^2, not
    n^2 — the property that makes semantic dedup tractable at scale
    (clusters come from :func:`ivf_index` k-means or any partitioner).
    The final filter is a broadcast-eligible left anti-join on the
    dropped-id set (near-dups are a small fraction of the corpus).
    """
    # per-row norms precomputed on each side (r11): the within-cluster
    # pair condition otherwise re-folds BOTH vector norms per pair — one
    # dot fold per pair instead of three, bit-identical (sqrt(dot(v,v))
    # is the same IEEE expression per row as it was per pair); the same
    # rewrite as cosine_pairs / lsh_cosine_pairs
    a = df.select(
        F.col(cluster_col).alias("_c"),
        F.col(id_col).alias("id1"),
        F.col(vec_col).alias("v1"),
        _norm(F.col(vec_col)).alias("_n1"),
    )
    b = df.select(
        F.col(cluster_col).alias("_c"),
        F.col(id_col).alias("id2"),
        F.col(vec_col).alias("v2"),
        _norm(F.col(vec_col)).alias("_n2"),
    )
    dropped = (
        a.join(b, ["_c"])
        .filter(F.col("id1") < F.col("id2"))
        .filter(
            _dot(F.col("v1"), F.col("v2")) / (F.col("_n1") * F.col("_n2"))
            >= threshold
        )
        .select(F.col("id2").alias(id_col))
        .distinct()
    )
    return df.join(dropped, id_col, "left_anti")


def random_projection(
    df: DataFrame,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: reduce ``vec_col`` to
    ``out_dim`` dimensions as ``proj_j = dot(vec, plane_j) / sqrt(out_dim)``
    (the 1/√k scaling preserves expected squared distances).

    The standard pre-ANN compression stage — a 64→16 projection cuts
    brute-force and IVF distance arithmetic 4× while JL bounds the
    distance distortion.  Returns long form ``(id_col, dim, component)``
    (one row per output dimension; arrays don't hash in the driver
    compare).  A NULL input vector yields its ``out_dim`` rows with NULL
    components — missing stays missing, dimensioned.

    ``planes`` overrides the Gaussian matrix (``out_dim × dim`` rows);
    deterministic integer planes make the whole computation an oracle
    twin, exactly like ``lsh_cosine_pairs``.  Row-local map — each
    component is one sequential-fold dot (:func:`_dot` determinism), zero
    shuffle, whole-stage codegen.
    """
    dim_probe = df.select(F.size(vec_col).alias("d")).filter(F.col("d") > 0).first()
    in_dim = int(dim_probe["d"]) if dim_probe is not None else None
    if planes is None:
        if in_dim is None:
            raise ValueError("cannot infer input dim from an all-NULL vector column")
        planes = random_hyperplanes(in_dim, out_dim, seed)
    if len(planes) != out_dim:
        raise ValueError("planes must have out_dim rows")
    widths = {len(row) for row in planes}
    # a width mismatch would otherwise NULL-pad inside zip_with and return
    # all-NULL components with no error — indistinguishable from NULL input
    if len(widths) != 1 or (in_dim is not None and widths != {in_dim}):
        raise ValueError(
            f"plane width(s) {sorted(widths)} do not match the vector dim {in_dim}"
        )
    import math as _math

    scale = F.lit(1.0 / _math.sqrt(float(out_dim)))
    comps = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("dim"),
                (_dot(F.col(vec_col), F.array(*[F.lit(float(w)) for w in row])) * scale).alias(
                    "component"
                ),
            )
            for j, row in enumerate(planes)
        ]
    )
    return df.select(F.col(id_col), F.explode(comps).alias("_c")).select(
        id_col, F.col("_c.dim").alias("dim"), F.col("_c.component").alias("component")
    )


def kmeans_portable(
    df: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    qscale: int = 1000,
) -> tuple[DataFrame, list[list[int]]]:
    """Value-verifiable distributed Lloyd k-means over quantized
    embeddings — the clustering step semantic-dedup (SemDeDup) and IVF
    coarse quantizers are built on, made bit-reproducible so an external
    oracle can confirm every assignment.  (:func:`ivf_index` keeps the
    MLlib float path for throughput; this is the portable twin.)

    Determinism: components are quantized once to milli-units
    (``floor(v·qscale)`` — identical IEEE mult+floor everywhere);
    distances and centroid sums are BIGINT, division is truncating, so
    results are independent of partitioning and engine.  Seeds are the
    ``k`` vectors with the smallest ``(md5(id), id)`` — the engine's
    standard deterministic pseudo-random order (``filtering.quota_order``)
    — numbered 0..k-1 in that order.  Ties in assignment break toward the
    lower cluster index; a cluster that loses all members keeps its
    previous centroid.

    Scale shape: per iteration, assignment is a map-side expression over
    the corpus (k distance folds per row against a one-row broadcast
    centroid frame — plan and generated code are IDENTICAL across
    iterations, so analysis/codegen caches hit); the update is ONE
    (cluster, pos)-keyed SUM/COUNT aggregate with map-side combine
    (k*dim groups); only k*dim sum rows ever reach the driver (the same
    bounded probe :func:`ivf_topk` documents).  Lineage is re-rooted
    each round via the collected centroids, so deep iteration counts
    never grow the plan.

    Returns ``(assignments, centroids)``: assignments =
    ``(id_col, cluster BIGINT, dist2 BIGINT)`` under the FINAL centroids;
    centroids = k lists of quantized ints.
    """
    if k < 1 or iterations < 0:
        raise ValueError("k >= 1 and iterations >= 0 required")
    data = df.filter(F.col(vec_col).isNotNull())
    if dim is None:
        probe = data.select(F.size(vec_col).alias("_d")).first()
        if probe is None:
            raise ValueError("no non-null vectors to cluster")
        dim = probe["_d"]
    qv = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(float(qscale)))
    )
    from opteryx_spark.operators.dedup import _track_persist

    # every iteration (seed scan, per-round update, final assignment)
    # re-reads this frame — persist once instead of re-quantizing the
    # corpus per pass (bounded-lifetime LRU release, as the dedup ops)
    base = _track_persist(data.select(F.col(id_col), qv.alias("_qv")))

    seed_rows = (
        base.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .select("_qv")
        .collect()
    )
    cents = [[int(x) for x in r["_qv"]] for r in seed_rows]
    if len(cents) < k:
        raise ValueError(f"need >= {k} vectors, found {len(cents)}")

    # r12 (VERDICT r11 #3): centroids ride a ONE-ROW broadcast frame
    # instead of per-iteration literal arrays.  With literals, every
    # iteration's assignment (and the map stage of the update aggregate
    # that contains it) generated DIFFERENT codegen source (new centroid
    # constants), so Spark re-analyzed and re-JIT-compiled the k x dim
    # distance folds and the dim-wide aggregate EVERY round — pure
    # driver-side cost that dominated this operator (5.1 s for 2000
    # vectors).  With the centroids as a broadcast column, the plan and
    # the generated source are byte-identical across iterations (only the
    # LocalRelation DATA changes), so analysis/codegen caches hit and
    # each round costs one tiny job.  Arithmetic is unchanged: dist_j is
    # the same long zip_with fold, the best cluster the same
    # min-over-(d, j) structs, ties still break toward the lower index.
    spark = df.sparkSession

    def _cents_frame(centroids):
        return spark.createDataFrame(
            [([[int(x) for x in c] for c in centroids],)],
            "_cents array<array<bigint>>",
        )

    # Column expressions are centroid-INDEPENDENT now, so build each ONE
    # time and reuse across iterations: profiling showed 0.6-0.9 s/round
    # of pure driver-side construction (64 py4j F.sum calls + 64 F.expr
    # SQL-parser round-trips) rebuilding identical expressions every
    # round.  The centroid-means array is ONE F.expr parse instead of
    # dim of them (`div` has no Column operator; sums can be negative so
    # floor-based division would differ from BIGINT `div` truncation).
    _best = F.array_min(
        F.transform(
            F.col("_cents"),
            lambda c, i: F.struct(
                F.aggregate(
                    F.zip_with(F.col("_qv"), c, lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("d"),
                i.cast("long").alias("j"),
            ),
        )
    )
    # Update aggregate, (cluster, pos)-keyed: explode a CONSTANT
    # sequence(1..dim) per member row and read `element_at(_qv, _pos)` —
    # exactly dim rows per member, so count(*) per (cluster, pos) is the
    # member count and sum skips null elements, IDENTICAL semantics to
    # the previous dim-wide aggregate (a raw posexplode would emit fewer
    # rows for short vectors and shift the per-position counts).  Still
    # one pass with map-side combine (k*dim groups); the 2-expression
    # aggregate removes the dim-wide plan the driver re-analyzed per
    # iteration (~0.5 s/round at dim=64), and the truncating division
    # moves to the driver over the k*dim collected sums.
    _pos_col = F.explode(F.sequence(F.lit(1), F.lit(dim))).alias("_pos")
    _val_col = F.element_at(F.col("_qv"), F.col("_pos")).alias("_v")

    def _tdiv(a: int, b: int) -> int:
        # BIGINT `div` truncates toward zero; Python // floors.
        q = a // b
        return q + 1 if q < 0 and q * b != a else q

    def _assign(frame, cents_frame):
        return (
            frame.crossJoin(F.broadcast(cents_frame))
            .withColumn("_best", _best)
            .select(
                F.col(id_col),
                F.col("_qv"),
                F.col("_best.j").alias("cluster"),
                F.col("_best.d").alias("dist2"),
            )
        )

    for _ in range(iterations):
        assigned = _assign(base, _cents_frame(cents))
        rows = (
            assigned.select("cluster", "_qv", _pos_col)
            .select("cluster", "_pos", _val_col)
            .groupBy("cluster", "_pos")
            .agg(F.sum("_v").alias("_s"), F.count(F.lit(1)).alias("_cnt"))
            .collect()
        )
        sums: dict[int, list] = {}
        cnts: dict[int, int] = {}
        for r in rows:
            j = int(r["cluster"])
            sums.setdefault(j, [None] * dim)[int(r["_pos"]) - 1] = int(r["_s"])
            cnts[j] = int(r["_cnt"])
        new = {j: [_tdiv(s, cnts[j]) for s in sums[j]] for j in sums}
        cents = [new.get(j, cents[j]) for j in range(k)]

    out = _assign(base, _cents_frame(cents)).select(id_col, "cluster", "dist2")
    return out, cents


def knn_join(
    queries: list[tuple[int, list[float]]],
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qscale: int = 1000,
) -> DataFrame:
    """Batched exact kNN join: top-``k`` nearest corpus vectors (squared
    L2 over milli-quantized components — exact BIGINT, engine-identical)
    for EVERY query in a bounded batch, in one corpus pass.  The
    multi-query upgrade of :func:`cosine_topk`/:func:`ivf_topk` — the
    shape retrieval evaluation (recall@k sweeps) and batch inference
    need.

    Scale design — the part Spark has no built-in for: a naive
    ``groupBy(query).collect_list`` buffers the whole corpus per query,
    and a rank window sorts corpus-sized partitions.  Instead top-k is
    computed in TWO phases: each input partition reduces to its local
    top-k per query (``slice(array_sort(collect_list(struct)), 1, k)``
    over partition-local groups — bounded at k rows per (partition,
    query)), then the k·P survivors merge in one final per-query
    aggregate.  Memory is O(k) per group at every stage, and the heavy
    exchange carries k·P·Q structs, never the corpus.

    Ties break toward the smaller corpus id (struct ordering).  Returns
    ``query_id``, ``rank`` (1-based), ``id_col``, ``dist2`` (BIGINT).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not queries:
        raise ValueError("queries must be non-empty")
    qq = [
        (int(qid), [int(__import__("math").floor(float(x) * qscale)) for x in vec])
        for qid, vec in queries
    ]
    qv = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(float(qscale)))
    )
    base = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_cid"), qv.alias("_qv")
    )
    # one row per (corpus vector, query): the query batch is a literal
    # inline array (bounded by contract), so this is a map-side explode —
    # no join, no broadcast exchange even
    pairs = base.select(
        "_cid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(qid).cast("long").alias("qid"),
                        F.aggregate(
                            F.zip_with(
                                F.col("_qv"),
                                F.array(*[F.lit(c).cast("long") for c in vec]),
                                lambda a, b: (a - b) * (a - b),
                            ),
                            F.lit(0).cast("long"),
                            lambda acc, x: acc + x,
                        ).alias("d2"),
                    )
                    for qid, vec in qq
                ]
            )
        ).alias("_q"),
    ).select(
        F.col("_q.qid").alias("query_id"),
        F.struct(F.col("_q.d2").alias("d2"), F.col("_cid").alias("cid")).alias("_s"),
        F.spark_partition_id().alias("_pid"),
    )
    kk = int(k)
    local = pairs.groupBy("query_id", "_pid").agg(
        F.slice(F.array_sort(F.collect_list("_s")), 1, kk).alias("_top")
    )
    merged = (
        local.select("query_id", F.explode("_top").alias("_s"))
        .groupBy("query_id")
        .agg(F.slice(F.array_sort(F.collect_list("_s")), 1, kk).alias("_top"))
    )
    out = merged.select(
        "query_id", F.posexplode("_top").alias("_r", "_s")
    ).select(
        "query_id",
        (F.col("_r") + 1).cast("long").alias("rank"),
        F.col("_s.cid").alias(id_col),
        F.col("_s.d2").alias("dist2"),
    )
    return out


def pq_train(
    df: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    qscale: int = 1000,
) -> tuple[DataFrame, list[list[int]]]:
    """Deterministic PQ "training": milli-quantize the corpus and pick
    the ``n_codes`` sub-space codebook rows as the corpus vectors with
    the smallest ``(md5(id), id)`` — the engine's canonical seed order
    (no Lloyd refinement, so the whole pipeline stays exact integer
    arithmetic an oracle can replay).  Returns ``(base, books)`` where
    ``base`` is the persisted quantized frame ``(_id, _qv)`` and
    ``books`` the ``n_codes`` codebook vectors (driver-side — a bounded
    ``n_codes``-row collect, the only driver data movement in the
    family).
    """
    if dim % m != 0:
        raise ValueError("dim must divide into m sub-spaces")
    if n_codes < 1:
        raise ValueError("n_codes must be >= 1")
    qv = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(float(qscale)))
    )
    from opteryx_spark.operators.dedup import _track_persist

    base = _track_persist(
        df.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("_id"), qv.alias("_qv")
        )
    )
    seed_rows = (
        base.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(int(n_codes))
        .collect()
    )
    books = [[int(x) for x in r["_qv"]] for r in seed_rows]
    if len(books) < n_codes:
        raise ValueError(f"need >= {n_codes} vectors, found {len(books)}")
    return base, books


def pq_encode(
    base: DataFrame,
    books: list[list[int]],
    m: int = 8,
) -> DataFrame:
    """Encode the quantized corpus against the codebooks: per sub-space
    the argmin-squared-L2 code index (ties to the lower index), emitted
    as ``(_id, _codes array<long>)`` — the m-byte-per-vector artifact a
    PQ index persists.  Map-only (Arrow-batched), no shuffle.

    Implementation note (VERDICT r7 #7): the original formulation unrolled
    ``m * n_codes`` distance folds (~1024 arithmetic terms) into one
    Catalyst projection, which exceeds janino's 64 KB method limit and
    silently degrades to interpreted expression eval.  Splitting the
    argmins into sequential projected columns does NOT fix it: Catalyst's
    CollapseProject re-merges independent projections, and even when the
    Projects are kept apart (double-referencing each alias) whole-stage
    codegen inlines every fused Project into the one ``processNext()``
    method, which still blows the limit.  The codegen-hostile kernel is
    therefore expressed as a vectorized numpy ``mapInPandas`` — exact
    int64 arithmetic (milli-quantized values keep every square sum
    ≪ 2^63, and ``np.argmin`` returns the FIRST minimum, matching the
    lower-index tie-break), one Arrow batch in/out per partition, zero
    compile fallbacks.  Measured 5x faster than the interpreted
    expression at sf0.1; at 100 TB this is a constant-factor win on a
    build-time map stage."""
    import numpy as np
    import pandas as pd

    dim = len(books[0])
    if dim % m != 0:
        raise ValueError("codebook dim must divide into m sub-spaces")
    sub = dim // m
    n_codes = len(books)
    codebook = np.asarray(books, dtype=np.int64).reshape(n_codes, m, sub)

    def _encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["_qv"]])
            xs = x.reshape(len(pdf), m, sub)
            # (N, n_codes, m): integer-exact squared L2 per sub-space
            d = ((xs[:, None, :, :] - codebook[None, :, :, :]) ** 2).sum(axis=3)
            codes = d.argmin(axis=1)  # first minimum == lower-index tie-break
            yield pd.DataFrame({"_id": pdf["_id"], "_codes": list(codes)})

    return base.mapInPandas(_encode, "_id long, _codes array<long>")


def pq_adc_probe(
    codes: DataFrame,
    books: list[list[int]],
    query_vec: list[float],
    k: int = 10,
    m: int = 8,
    qscale: int = 1000,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC scan over an encoded PQ corpus: quantize the query, build the
    m per-sub-space distance tables driver-side (m * n_codes ints), and
    score every row as the BIGINT sum of table lookups at its stored
    codes — the scan touches only the codes column, never the vectors.
    Returns ``rank``, ``id_col``, ``adc_dist2`` — top-``k`` by
    ``(adc_dist2, id)``."""
    import math

    if k < 1:
        raise ValueError("k must be >= 1")
    dim = len(books[0])
    if dim % m != 0:
        raise ValueError("codebook dim must divide into m sub-spaces")
    sub = dim // m
    n_codes = len(books)
    qq = [int(math.floor(float(x) * qscale)) for x in query_vec]
    if len(qq) != dim:
        raise ValueError(f"query_vec must have {dim} components")
    adc = None
    for s in range(m):
        table = [
            sum((qq[d] - books[j][d]) ** 2 for d in range(s * sub, (s + 1) * sub))
            for j in range(n_codes)
        ]
        lookup = F.element_at(
            F.array(*[F.lit(int(v)).cast("long") for v in table]),
            (F.element_at(F.col("_codes"), s + 1) + 1).cast("int"),
        )
        adc = lookup if adc is None else adc + lookup
    scored = codes.select("_id", adc.alias("adc_dist2"))
    top = scored.orderBy(F.col("adc_dist2").asc(), F.col("_id").asc()).limit(int(k))
    w = top.select(F.col("_id").alias(id_col), "adc_dist2")
    from pyspark.sql import Window as _W

    return w.withColumn(
        "rank",
        F.row_number()
        .over(_W.orderBy(F.col("adc_dist2").asc(), F.col(id_col).asc()))
        .cast("long"),
    ).select("rank", id_col, "adc_dist2")


def pq_adc_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    qscale: int = 1000,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jegou et al., PAMI 2011) — the remaining member of this module's
    ANN family (brute, hyperplane-LSH, IVF, SQ8): vectors compress to
    ``m`` sub-space code indices and query distances come from ``m``
    lookup tables, so the scan touches ``m`` bytes-ish per vector
    instead of ``dim`` floats.

    Composed from :func:`pq_train` -> :func:`pq_encode` ->
    :func:`pq_adc_probe`; :func:`pq_persist` materializes the first two
    stages to parquet and :func:`pq_adc_topk_indexed` probes the stored
    artifact without re-encoding — at production scale the codes are
    written once and every query pays only the table scan.

    Returns ``rank``, ``id_col``, ``adc_dist2`` (BIGINT) — top-``k`` by
    ``(adc_dist2, id)``.
    """
    if k < 1 or n_codes < 1:
        raise ValueError("k and n_codes must be >= 1")
    base, books = pq_train(df, m, n_codes, id_col, vec_col, dim, qscale)
    codes = pq_encode(base, books, m)
    return pq_adc_probe(codes, books, query_vec, k, m, qscale, id_col)


def pq_persist(
    df: DataFrame,
    path: str,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    qscale: int = 1000,
) -> None:
    """Materialize the PQ index: the encoded codes frame at ``path``
    (``id_col``, ``codes array<long>`` — m longs per vector, the whole
    scan payload) and the codebooks at ``path + "_books"`` (``j``,
    ``c``, plus the ``m``/``qscale`` the probe must reuse — the sidecar
    is self-describing, so a probe cannot silently mix parameters).
    Both side files go through Spark's filesystem layer, so the artifact
    works on any Hadoop-compatible path, like :func:`ivf_persist`."""
    base, books = pq_train(df, m, n_codes, id_col, vec_col, dim, qscale)
    pq_encode(base, books, m).select(
        F.col("_id").alias(id_col), F.col("_codes").alias("codes")
    ).write.mode("overwrite").parquet(path)
    spark = df.sparkSession
    rows = [(j, [int(x) for x in c], int(m), int(qscale)) for j, c in enumerate(books)]
    spark.createDataFrame(
        rows, "j int, c array<long>, m int, qscale int"
    ).coalesce(1).write.mode("overwrite").parquet(path.rstrip("/") + "_books")


def pq_adc_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k against a persisted PQ index: read the codebook sidecar
    (a bounded ``n_codes``-row collect), rebuild the query's distance
    tables, and scan ONLY the stored codes — no re-quantization, no
    re-encoding, no original vectors.  The build-once/probe-many hot
    path: at 100 TB the probe reads m longs per vector."""
    brows = spark.read.parquet(path.rstrip("/") + "_books").orderBy("j").collect()
    books = [[int(x) for x in r["c"]] for r in brows]
    m, qscale = int(brows[0]["m"]), int(brows[0]["qscale"])
    codes = spark.read.parquet(path).select(
        F.col(id_col).alias("_id"), F.col("codes").alias("_codes")
    )
    return pq_adc_probe(codes, books, query_vec, k, m, qscale, id_col)


def sq8_persist(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the SQ8 index: the :func:`quantize_int8` frame
    (``id_col``, ``qvec array<int>``, ``scale``) to parquet — 4x
    smaller than the float corpus, and everything
    :func:`sq8_topk_indexed` needs (shortlist AND rescore) without the
    original vectors."""
    quantize_int8(df, id_col, vec_col).write.mode("overwrite").parquet(path)


def sq8_probe(
    art: DataFrame,
    query_vec: list[float],
    k: int = 10,
    shortlist: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """SQ8 ANN probe over an index artifact frame (``id_col``, ``qvec``,
    ``scale`` — :func:`quantize_int8`'s schema), original vectors never
    read: shortlist by the exact INTEGER quantized dot
    (bit-deterministic), rescore the shortlist with exact double cosine
    over the DEQUANTIZED vectors (``qvec[i] / scale`` — the standard SQ8
    reconstruction, so the rescore is approximate relative to
    :func:`sq8_topk`'s full-precision rescore but needs only the
    4x-smaller artifact).  Zero-scale rows (all-zero or NULL source
    vectors) are excluded up front — they cannot rank and a NULL cosine
    would sort differently across engines.  Fully deterministic, so a
    SQL oracle twins it."""
    import math

    s = shortlist or 4 * k
    art = art.filter(F.col("scale") > 0)
    qmax = max(abs(float(v)) for v in query_vec)
    qscale = 127.0 / qmax if qmax > 0 else 0.0
    qq = [math.floor(float(v) * qscale + 0.5) for v in query_vec]
    qarr = F.array(*[F.lit(int(v)).cast("long") for v in qq])
    dot = F.aggregate(
        F.zip_with(F.col("qvec"), qarr, lambda a, b: a.cast("long") * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sl = (
        art.select(F.col(id_col), "qvec", "scale", dot.alias("qdot"))
        .orderBy(F.desc("qdot"), F.asc(id_col))
        .limit(s)
    )
    dq = F.transform(F.col("qvec"), lambda x: x.cast("double") / F.col("scale"))
    qv = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        sl.select(F.col(id_col), cosine(dq, qv).alias("cosim"))
        .orderBy(F.desc("cosim"), F.asc(id_col))
        .limit(k)
    )


def sq8_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    shortlist: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """:func:`sq8_probe` against a persisted :func:`sq8_persist` index —
    the build-once/probe-many hot path: the probe scans the 4x-smaller
    quantized artifact, never the float corpus."""
    return sq8_probe(spark.read.parquet(path), query_vec, k, shortlist, id_col)


def centroid_drift(
    a: DataFrame,
    b: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
    qscale: int = 1000,
) -> DataFrame:
    """Per-label centroid drift between two embedding snapshots — the
    embedding-space monitoring primitive (re-embedding with a new model
    revision, or a corpus refresh, moves class centroids; alert when a
    label's centroid travels): squared L2 distance between the per-label
    mean vectors, in exact quantized integer units.

    Determinism: components are milli-quantized (``floor(x·qscale)``,
    BIGINT), per-label per-dimension SUMS are exact, the centroid is the
    truncating ``div`` of sum by count (the :func:`kmeans_portable`
    convention), and the drift is a BIGINT sum of squared differences —
    no floats anywhere.

    Scale shape: ONE groupBy per side with ``dim`` fused partial sums
    (no posexplode fan-out — the kmeans update shape), one label-keyed
    join of label-cardinality frames.  NULL vectors are excluded; labels
    present on only one side are reported with NULL drift.

    Returns ``label_col``, ``n_a``, ``n_b`` (BIGINT), ``drift2_q``
    (BIGINT, squared quantized-unit distance; NULL when one-sided).
    """

    def _sums(df: DataFrame, tag: str) -> DataFrame:
        qv = F.transform(
            F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(float(qscale)))
        )
        base = df.filter(F.col(vec_col).isNotNull()).select(
            F.col(label_col).alias("_l"), qv.alias("_qv")
        )
        aggs = [F.count(F.lit(1)).alias(f"n_{tag}")]
        for d in range(dim):
            aggs.append(F.sum(F.element_at(F.col("_qv"), d + 1)).alias(f"_s{tag}{d}"))
        return base.groupBy("_l").agg(*aggs)

    sa = _sums(a, "a")
    sb = _sums(b, "b")
    joined = sa.join(sb, "_l", "full_outer")
    diffs = [
        (
            F.expr(f"_sa{d} div n_a") - F.expr(f"_sb{d} div n_b")
        )
        for d in range(dim)
    ]
    drift = None
    for d_expr in diffs:
        term = d_expr * d_expr
        drift = term if drift is None else drift + term
    return joined.select(
        F.col("_l").alias(label_col),
        F.coalesce(F.col("n_a"), F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).cast("bigint").alias("n_b"),
        F.when(
            F.col("n_a").isNotNull() & F.col("n_b").isNotNull(), drift
        ).cast("bigint").alias("drift2_q"),
    )


def silhouette_lite(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
    qscale: int = 1000,
) -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster — the
    clustering-quality eval that closes the loop on
    :func:`kmeans_portable` / any labeled embedding partition: for each
    vector, ``a2`` = squared distance to its OWN cluster centroid and
    ``b2`` = squared distance to the nearest OTHER centroid, scored
    ``s = (b2 - a2) / max(a2, b2)`` in ppm.  The centroid form
    (Hruschka 2004's "simplified silhouette") replaces the classic
    all-pairs ``a``/``b`` — O(n²) and unshippable at corpus scale —
    with O(n·k): centroids are ONE groupBy with ``dim`` fused partial
    sums (the kmeans update shape), and scoring is a broadcast of the
    k-row centroid frame against a map-only pass.

    Determinism: components milli-quantized (``floor(x*qscale)``,
    BIGINT), centroids truncating ``div``, distances exact BIGINT
    sums of squares, the ppm score a truncating integer div with a
    ``max(a2,b2)=0 -> 0`` guard — no floats anywhere.  NULL ids, NULL
    labels and NULL vectors are excluded (no identity / no cluster / no
    geometry).  Clusters
    need k >= 2 to score; with a single cluster every ``s`` is NULL and
    ``mean_s_ppm`` is NULL.

    Returns ``label_col``, ``n_vecs`` (BIGINT), ``mean_s_ppm`` (BIGINT,
    sum(s) div n over scored vectors; higher = tighter/better
    separated).
    """
    from pyspark.sql.functions import broadcast

    if dim < 1 or qscale < 1:
        raise ValueError("dim and qscale must be >= 1")
    qv = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(float(qscale)))
    )
    base = df.filter(
        F.col(id_col).isNotNull()
        & F.col(label_col).isNotNull()
        & F.col(vec_col).isNotNull()
    ).select(F.col(id_col).alias("_id"), F.col(label_col).alias("_l"), qv.alias("_qv"))

    aggs = [F.count(F.lit(1)).alias("_n")]
    for d in range(dim):
        aggs.append(F.sum(F.element_at(F.col("_qv"), d + 1)).alias(f"_s{d}"))
    cents = base.groupBy("_l").agg(*aggs).select(
        F.col("_l").alias("_cl"),
        F.array(*[F.expr(f"_s{d} div _n") for d in range(dim)]).alias("_cv"),
    )

    d2 = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    scored = (
        base.crossJoin(broadcast(cents))
        .select("_id", "_l", "_cl", d2.alias("_d2"))
        .groupBy("_id", "_l")
        .agg(
            F.min(F.when(F.col("_cl") == F.col("_l"), F.col("_d2"))).alias("_a2"),
            F.min(F.when(F.col("_cl") != F.col("_l"), F.col("_d2"))).alias("_b2"),
        )
        .select(
            "_l",
            F.when(F.col("_b2").isNull(), F.lit(None).cast("long"))
            .when(F.greatest("_a2", "_b2") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr("((_b2 - _a2) * 1000000) div greatest(_a2, _b2)")
            )
            .alias("_s_ppm"),
        )
    )
    return scored.groupBy("_l").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.expr("CASE WHEN count(_s_ppm) > 0 THEN sum(_s_ppm) div count(_s_ppm) END").alias(
            "mean_s_ppm"
        ),
    ).select(F.col("_l").alias(label_col), "n_vecs", "mean_s_ppm")


def quantization_recall(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qscale: int = 1000,
) -> DataFrame:
    """Recall@k of int8-quantized similarity scoring against exact
    scoring — the eval every quantized-ANN deployment needs BEFORE
    swapping :func:`quantize_int8` / :func:`sq8_topk` into the serving
    path: how much of the true top-k does the 4x-smaller representation
    keep?

    Both rankings are exact-integer and fully deterministic, so a SQL
    oracle can replay the measurement end to end:

    - *exact* rank: BIGINT dot product of milli-quantized components
      (``floor(x*qscale)``) — the suite's standing exact-similarity
      twin;
    - *quantized* rank: BIGINT dot product of per-vector symmetric int8
      codes (:func:`quantize_int8` arithmetic: ``scale = 127/max|v|``,
      ``floor(x*scale + 0.5)``) — what an SQ8 scan actually compares;
    - both orders tie-break on corpus id; recall@k =
      ``|topk_exact ∩ topk_int8| * 1e6 div k`` per query, in ppm.

    Shape: the query side is small by construction (a sampled panel) —
    broadcast against the corpus, ONE map pass computes both scores per
    pair, two windows rank within query, one (query, id)-keyed self-join
    intersects the lists.  Nothing all-pairs on the corpus side.  NULL
    ids/vectors excluded on both sides.

    Returns ``query_id``, ``n_hits`` (BIGINT, overlap size),
    ``recall_ppm`` (BIGINT).
    """
    from pyspark.sql.functions import broadcast
    from pyspark.sql.window import Window

    if k < 1 or qscale < 1:
        raise ValueError("k and qscale must be >= 1")

    def _prep(df: DataFrame, tag: str) -> DataFrame:
        c = F.col(vec_col)
        qmilli = F.transform(
            c, lambda x: F.floor(x.cast("double") * F.lit(float(qscale)))
        )
        maxabs = F.array_max(F.transform(c, lambda x: F.abs(x.cast("double"))))
        scale = F.when(maxabs > 0, F.lit(127.0) / maxabs).otherwise(F.lit(0.0))
        q8 = F.transform(
            c, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long")
        )
        return df.filter(F.col(id_col).isNotNull() & c.isNotNull()).select(
            F.col(id_col).alias(f"{tag}_id"),
            qmilli.alias(f"{tag}_qm"),
            q8.alias(f"{tag}_q8"),
        )

    def _dot(a: str, b: str):
        return F.aggregate(
            F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )

    pairs = _prep(corpus, "c").crossJoin(broadcast(_prep(queries, "q"))).select(
        F.col("q_id").alias("query_id"),
        F.col("c_id"),
        _dot("q_qm", "c_qm").alias("_se"),
        _dot("q_q8", "c_q8").alias("_s8"),
    )
    we = Window.partitionBy("query_id").orderBy(F.col("_se").desc(), F.col("c_id"))
    w8 = Window.partitionBy("query_id").orderBy(F.col("_s8").desc(), F.col("c_id"))
    ranked = pairs.select(
        "query_id",
        "c_id",
        F.row_number().over(we).alias("_re"),
        F.row_number().over(w8).alias("_r8"),
    )
    hits = ranked.groupBy("query_id").agg(
        F.sum(
            F.when((F.col("_re") <= k) & (F.col("_r8") <= k), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_hits")
    )
    return hits.select(
        "query_id",
        "n_hits",
        F.expr(f"(n_hits * 1000000) div {int(k)}").alias("recall_ppm"),
    )


def matryoshka_recall(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    prefix_dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qscale: int = 1000,
) -> DataFrame:
    """Recall@k of PREFIX-dimension similarity scoring against full-dim
    scoring — the Matryoshka-representation eval (Kusupati et al. 2022):
    MRL-trained embeddings pack the most information into the leading
    dimensions, so serving can score on the first ``prefix_dims``
    components (a ``d/prefix_dims``-fold smaller index and dot product)
    IF the truncated ranking still recovers the full top-k.  This
    measures exactly that, per query, before any index is rebuilt — the
    dimension-axis counterpart to :func:`quantization_recall` (which
    measures the precision axis).

    Both rankings are exact-integer (BIGINT dot products of
    milli-quantized components, ties to the corpus id), so a SQL oracle
    replays the measurement end to end.  Shape: identical to
    :func:`quantization_recall` — broadcast query panel, ONE map pass
    computes both scores per pair (the prefix score is a fold over
    ``slice(vec, 1, prefix_dims)``), two windows, one aggregate.
    Nothing all-pairs on the corpus side.

    Returns ``query_id``, ``n_hits`` (BIGINT), ``recall_ppm`` (BIGINT).
    """
    from pyspark.sql.functions import broadcast
    from pyspark.sql.window import Window

    if k < 1 or qscale < 1 or prefix_dims < 1:
        raise ValueError("k, prefix_dims and qscale must be >= 1")

    def _prep(df: DataFrame, tag: str) -> DataFrame:
        c = F.col(vec_col)
        qmilli = F.transform(
            c, lambda x: F.floor(x.cast("double") * F.lit(float(qscale)))
        )
        return df.filter(F.col(id_col).isNotNull() & c.isNotNull()).select(
            F.col(id_col).alias(f"{tag}_id"),
            qmilli.alias(f"{tag}_qm"),
        )

    def _dot(a: str, b: str, dims: int | None = None):
        va, vb = F.col(a), F.col(b)
        if dims is not None:
            va = F.slice(va, 1, dims)
            vb = F.slice(vb, 1, dims)
        return F.aggregate(
            F.zip_with(va, vb, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )

    # slice past the array end silently returns the WHOLE vector, which
    # would make the "prefix" ranking identical to the full ranking and
    # report a meaningless recall of 1e6 — fail loudly instead (the
    # assert rides the row pipeline: NULL on success, raise on a vector
    # shorter than prefix_dims).  BOTH sides are checked: a short QUERY
    # vector would otherwise zip_with-pad with NULLs, NULL the prefix
    # dot for every pair, and silently degrade the prefix ranking to
    # bare c_id order (ADVICE r9).
    dim_guard = F.coalesce(
        F.assert_true(
            (F.size(F.col("c_qm")) >= F.lit(int(prefix_dims)))
            & (F.size(F.col("q_qm")) >= F.lit(int(prefix_dims))),
            F.lit(
                f"matryoshka_recall: embedding has fewer than "
                f"prefix_dims={int(prefix_dims)} components"
            ),
        ).cast("long"),
        F.lit(0).cast("long"),
    )
    pairs = _prep(corpus, "c").crossJoin(broadcast(_prep(queries, "q"))).select(
        F.col("q_id").alias("query_id"),
        F.col("c_id"),
        _dot("q_qm", "c_qm").alias("_sf"),
        # guard FIRST: Add evaluates its left child first and returns
        # NULL without touching the right when the left is NULL — a
        # length-mismatched prefix dot IS NULL (zip_with pads), so a
        # right-side guard would be skipped exactly when it matters
        (dim_guard + _dot("q_qm", "c_qm", prefix_dims)).alias("_sp"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("_sf").desc(), F.col("c_id"))
    wp = Window.partitionBy("query_id").orderBy(F.col("_sp").desc(), F.col("c_id"))
    ranked = pairs.select(
        "query_id",
        "c_id",
        F.row_number().over(wf).alias("_rf"),
        F.row_number().over(wp).alias("_rp"),
    )
    hits = ranked.groupBy("query_id").agg(
        F.sum(
            F.when((F.col("_rf") <= k) & (F.col("_rp") <= k), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_hits")
    )
    return hits.select(
        "query_id",
        "n_hits",
        F.expr(f"(n_hits * 1000000) div {int(k)}").alias("recall_ppm"),
    )


def kcenter_coreset(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qscale: int = 1000,
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 2-approximation)
    over an embedding corpus — the diversity-maximizing data-selection
    primitive (pick the k most mutually-distant exemplars; the coreset
    idea behind diverse fine-tuning subsets and cluster seeding, and the
    farthest-point counterpart to :func:`~opteryx_spark.operators.
    retrieval.mmr_rerank`'s relevance-diversity trade).

    Greedy farthest-point: the anchor is the smallest id; each round
    picks the point with the LARGEST distance to its nearest selected
    center (ties to the smallest id).  The per-point nearest-center
    distance is maintained INCREMENTALLY — after a pick, ``dmin' =
    least(dmin, d2(·, new_center))`` — so every round is ONE map pass
    against the single newest center (broadcast as a literal) plus one
    1-row argmax collect; never k×n distance recomputation, never
    all-pairs.  The k 1-row collects are the same bounded driver loop
    as :func:`kmeans_portable` / MMR (algorithm-inherent, documented).

    Exact integers end to end: milli-quantized components, BIGINT
    squared L2, ``min(struct(-dmin, id))`` keepers — an oracle replays
    every pick.  With fewer than k distinct points the greedy repeats
    an exhausted anchor (max dmin = 0; deterministic).  NULL ids and
    vectors are excluded.

    Returns ``sel_idx`` (BIGINT, 1-based pick order), ``id_col``,
    ``radius2_q`` (BIGINT, the pick's distance² to the previously
    selected set — the shrinking covering radius; NULL for the anchor).
    """
    if k < 1 or qscale < 1:
        raise ValueError("k and qscale must be >= 1")
    qv = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(float(qscale)))
    )
    base = df.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"), qv.alias("_qv")
    )
    first = base.orderBy("_id").select("_id", "_qv").first()
    if first is None:
        spark = df.sparkSession
        return spark.createDataFrame(
            [], f"sel_idx bigint, {id_col} bigint, radius2_q bigint"
        )
    picks = [(1, first["_id"], None)]
    center = [int(v) for v in first["_qv"]]

    def _d2_to(center_vals: list[int]):
        arr = F.array(*[F.lit(int(v)).cast("long") for v in center_vals])
        return F.aggregate(
            F.zip_with(F.col("_qv"), arr, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )

    from opteryx_spark.operators.dedup import _checkpoint_tracked, _track_release

    cur = base.select("_id", "_qv", _d2_to(center).alias("_dmin"))
    cur, handle = _checkpoint_tracked(cur)
    for r in range(2, int(k) + 1):
        # ONE action per round: the struct keeper carries the winning
        # vector along (id is unique, so the array field never compares)
        pick = (
            cur.select(
                F.min(
                    F.struct((-F.col("_dmin")).alias("_nd"), "_id", "_qv")
                ).alias("_k")
            )
            .select(
                F.col("_k._id").alias("_id"),
                (-F.col("_k._nd")).alias("_dmin"),
                F.col("_k._qv").alias("_qv"),
            )
            .first()
        )
        center = [int(v) for v in pick["_qv"]]
        picks.append((r, pick["_id"], int(pick["_dmin"])))
        nxt = cur.select(
            "_id", "_qv", F.least("_dmin", _d2_to(center)).alias("_dmin")
        )
        nxt, h = _checkpoint_tracked(nxt)
        handle.unpersist()  # superseded round (localCheckpoint is eager)
        handle = h
        cur = nxt
    _track_release(handle)
    spark = df.sparkSession
    return spark.createDataFrame(
        picks, f"sel_idx bigint, {id_col} bigint, radius2_q bigint"
    )


def pca_power_portable(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    rounds: int = 3,
    qscale: int = 1000,
) -> DataFrame:
    """Top principal direction of an embedding corpus by fixed-round
    power iteration, in exact integer arithmetic — the bit-reproducible
    twin of an SVD/PCA top component (MLlib's float SVD is the fast
    path; this is the value-verifiable formulation, the
    :func:`kmeans_portable` convention applied to linear algebra).
    Pipelines use the top direction for embedding-drift axes, whitening
    checks, and "is this corpus collapsing to one direction" monitors.

    Each round computes ``w = Xᵀ(Xv)`` distributed: one map pass for the
    per-row projection ``u = Σ_d qv_d·v_d`` and ONE aggregate with
    ``dim`` fused sums ``w_d = Σ_rows qv_d·u`` (the kmeans update
    shape — no dim explosion), then renormalizes ``v' = w·qscale div
    max|w|`` so components stay in ±``qscale`` milli units.  The
    per-round 1-row collect of ``w`` (``dim`` values) is the same
    bounded driver loop as kmeans' k centroids.  Mean-centering is
    deliberately omitted (this is the top direction of the raw second
    moment; center upstream if PCA-proper is wanted — keeps the
    operator composable and the oracle small).

    Overflow bound (documented, not silent): with components quantized
    to ``qscale`` and ``|x| ≤ 8``, ``|w_d| ≤ N·dim·(8·qscale)²`` —
    int64-safe beyond 2e6 rows at the defaults; larger corpora shrink
    ``qscale`` or pre-aggregate blocks.  Init is the all-ones direction
    (generic for non-degenerate spectra); NULL vectors are excluded; a
    zero ``max|w|`` round (corpus orthogonal to v) returns the zero
    vector from that round on (deterministic).

    Returns ``dim_idx`` (BIGINT 0-based), ``component_milli`` (BIGINT,
    ±``qscale`` units).
    """
    if dim < 1 or rounds < 1 or qscale < 1:
        raise ValueError("dim, rounds, qscale must be >= 1")
    from opteryx_spark.operators.dedup import _track_persist

    qv = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(float(qscale)))
    )
    base = _track_persist(
        df.filter(F.col(vec_col).isNotNull()).select(qv.alias("_qv"))
    )
    v = [int(qscale)] * int(dim)
    for _ in range(int(rounds)):
        varr = F.array(*[F.lit(int(c)).cast("long") for c in v])
        u = F.aggregate(
            F.zip_with(F.col("_qv"), varr, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        rowed = base.select("_qv", u.alias("_u"))
        sums = rowed.agg(
            *[
                F.sum(F.element_at(F.col("_qv"), d + 1) * F.col("_u")).alias(f"_w{d}")
                for d in range(int(dim))
            ]
        ).first()
        w = [int(sums[f"_w{d}"] or 0) for d in range(int(dim))]
        mx = max(abs(c) for c in w)
        if mx == 0:
            v = [0] * int(dim)
            break
        # truncating div toward zero, matching SQL div on either sign
        v = [
            (abs(c) * int(qscale) // mx) * (1 if c >= 0 else -1) for c in w
        ]
    spark = df.sparkSession
    return spark.createDataFrame(
        [(d, v[d]) for d in range(int(dim))],
        "dim_idx bigint, component_milli bigint",
    )


def triplet_mining(
    anchors: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    qscale: int = 1000,
) -> DataFrame:
    """Semi-hard triplet selection (FaceNet, Schroff 2015) for
    contrastive/metric training data: for each anchor, the nearest
    SAME-label corpus vector is the positive, and the negative is the
    nearest DIFFERENT-label vector that is still FARTHER than the
    positive (``d(a,p) < d(a,n)``) — the semi-hard band that trains
    stably where hardest-negative mining collapses.  The labeled
    counterpart to :func:`~opteryx_spark.operators.scale.
    negative_sample` (which is label-blind and random).

    Exact BIGINT squared distances on milli-quantized components with
    id tie-breaks, so every pick is oracle-replayable.  Anchors joining
    the corpus by identity are excluded from their own positives.
    Anchors with no same-label corpus vector are absent; anchors whose
    negatives are ALL nearer than the positive get NULL negative
    (no semi-hard candidate — the caller's margin decision, not ours).

    Shape: the anchor panel is small by construction — broadcast; ONE
    map pass computes pair distances, two struct-keeper aggregates pick
    positives then semi-hard negatives.  Never corpus × corpus.  NULL
    ids/labels/vectors are excluded on both sides.

    Returns ``anchor_id``, ``pos_id``, ``pos_d2_q``, ``neg_id``,
    ``neg_d2_q`` (BIGINT; neg side NULL when no semi-hard candidate).
    """
    from pyspark.sql.functions import broadcast

    if qscale < 1:
        raise ValueError("qscale must be >= 1")
    qv = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(float(qscale)))
    )

    def _prep(df: DataFrame, tag: str) -> DataFrame:
        return df.filter(
            F.col(id_col).isNotNull()
            & F.col(label_col).isNotNull()
            & F.col(vec_col).isNotNull()
        ).select(
            F.col(id_col).alias(f"{tag}_id"),
            F.col(label_col).alias(f"{tag}_l"),
            qv.alias(f"{tag}_qv"),
        )

    d2 = F.aggregate(
        F.zip_with(F.col("a_qv"), F.col("c_qv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    from opteryx_spark.operators.dedup import _track_persist

    # persisted (r11): the pair-distance frame feeds BOTH the positive
    # and the negative keeper aggregates — without the persist each
    # branch re-runs the corpus scan AND the 64-element quantize+fold
    # per pair.  The cached projection is 5 slim columns bounded at
    # |corpus| x |anchor panel| rows (the panel is small by contract),
    # the same bounded-lifetime cache every dedup operator uses.
    pairs = _track_persist(
        _prep(corpus, "c")
        .crossJoin(broadcast(_prep(anchors, "a")))
        .filter(F.col("c_id") != F.col("a_id"))
        .select("a_id", "a_l", "c_id", "c_l", d2.alias("_d2"))
    )
    pos = (
        pairs.filter(F.col("c_l") == F.col("a_l"))
        .groupBy("a_id")
        .agg(F.min(F.struct("_d2", "c_id")).alias("_p"))
        .select(
            "a_id",
            F.col("_p.c_id").alias("pos_id"),
            F.col("_p._d2").alias("pos_d2_q"),
        )
    )
    neg = (
        pairs.filter(F.col("c_l") != F.col("a_l"))
        .join(F.broadcast(pos), "a_id")
        .filter(F.col("_d2") > F.col("pos_d2_q"))
        .groupBy("a_id")
        .agg(F.min(F.struct("_d2", "c_id")).alias("_n"))
        .select(
            "a_id",
            F.col("_n.c_id").alias("neg_id"),
            F.col("_n._d2").alias("neg_d2_q"),
        )
    )
    return pos.join(neg, "a_id", "left").select(
        F.col("a_id").alias("anchor_id"),
        "pos_id",
        "pos_d2_q",
        "neg_id",
        "neg_d2_q",
    )
