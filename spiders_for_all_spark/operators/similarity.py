"""Similarity search over embedding columns: brute-force top-k + LSH ANN.

Scale design: brute-force cosine is the correctness baseline (a single
narrow scan + TakeOrderedAndProject — Catalyst turns orderBy+limit into a
per-partition top-k, no full sort).  The scale path buckets both sides with
sign-random-projection LSH so each query only scores its bucket; multiprobe
(flipping one bit) trades compute for recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spiders_for_all_spark.functions.vectors import (
    cosine_rounded,
    dot,
    l2_normalize,
    lsh_bucket,
    norm,
)


def _cos_to_query(vec_col: str, query_vec: list[float]):
    """round(dot(v, q) / (norm(v) * norm(q)), 6) with norm(q) hoisted to
    a Python-computed literal (same sequential float64 sum + sqrt, so the
    value is bit-identical to the in-plan fold) — 3 interpreted folds per
    row become 2."""
    import math

    acc = 0.0
    for x in query_vec:
        acc = acc + float(x) * float(x)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return F.round(
        dot(F.col(vec_col), q) / (norm(F.col(vec_col)) * F.lit(math.sqrt(acc))),
        6,
    )


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector.

    orderBy+limit compiles to TakeOrderedAndProject: each partition keeps a
    k-heap, the driver merges — no global sort at any scale.
    """
    scored = emb.select(
        F.col(id_col), _cos_to_query(vec_col, query_vec).alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def brute_force_topk_per_query(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Batch variant: broadcast the (small) query set, window top-k per query."""
    from pyspark.sql import Window

    joined = emb.crossJoin(F.broadcast(queries)).select(
        F.col(q_id_col),
        F.col(id_col),
        cosine_rounded(F.col(vec_col), F.col(q_vec_col)).alias("cos"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.col(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def probe_buckets(
    query_vec: list[float], n_planes: int = 6, dim: int = 64,
    multiprobe: bool = True,
) -> list[str]:
    """The query's LSH bucket plus (multiprobe) every 1-bit-flip neighbor."""
    from spiders_for_all_spark.functions.vectors import plane_coefficients

    q_bits = []
    for p in range(n_planes):
        coeffs = plane_coefficients(p, dim)
        s = 0.0
        for d in range(dim):
            s = s + query_vec[d] * coeffs[d]
        q_bits.append("1" if round(s, 9) >= 0 else "0")
    q_bucket = "".join(q_bits)
    probes = {q_bucket}
    if multiprobe:
        for i in range(n_planes):
            flipped = list(q_bucket)
            flipped[i] = "0" if flipped[i] == "1" else "1"
            probes.add("".join(flipped))
    return sorted(probes)


def lsh_ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket
    (plus 1-bit-flip neighbor buckets when multiprobe), exact cosine inside.

    At 10^9 vectors with 6 planes this scores ~n/64 · 7 candidates instead
    of n — the partition-pruned IVF analog, expressed as a plain filter so
    Catalyst pushes the bucket predicate to the scan when `bucket` is a
    materialized partition column (see :func:`materialize_lsh_buckets`).
    """
    probes = probe_buckets(query_vec, n_planes, dim, multiprobe)
    bucketed = emb.withColumn(
        "bucket", lsh_bucket(F.col(vec_col), n_planes, dim)
    )
    cands = bucketed.filter(F.col("bucket").isin(*probes))
    scored = cands.select(
        F.col(id_col), _cos_to_query(vec_col, query_vec).alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def _cos_py(a: list[float], b: list[float]) -> float:
    """Driver-side cosine, rounded like cosine_rounded (6 dp) so probe
    selection ties break identically to the Catalyst/DuckDB sides."""
    import math

    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(dot / (na * nb), 6) if na and nb else 0.0


def ivf_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    with_cos: bool = False,
) -> DataFrame:
    """Add the IVF list id: nearest centroid by cosine (ties -> lowest
    cid).  Pure Catalyst — one (cos, -cid) struct per centroid, array_max
    picks the argmax; no shuffle, no UDF.  Centroid count is small (the
    classic IVF regime: k ~ sqrt(n) lists, each a broadcast-size literal).

    ``with_cos=True`` also emits ``centroid_cos`` (the rounded cosine to
    the assigned centroid) — the prototypicality signal SemDeDup-style
    pruning ranks on.

    Cost shape (r06): the HOF folds run interpreted, so the per-row work
    is counted in folds.  The row norm is let-bound ONCE across all k
    cosines and each centroid norm is a Python-computed literal (same
    float64 sequential sum+sqrt, bit-identical), so a row costs k dot
    folds + 1 norm fold instead of k·(dot + 2 norms) — 12 -> 5 folds at
    k=4, same values to the last bit.
    """
    import math

    from spiders_for_all_spark.functions.text import let

    def _py_norm(c: list[float]) -> float:
        acc = 0.0
        for x in c:
            acc = acc + float(x) * float(x)
        return math.sqrt(acc)

    def scored(na):
        return F.array(
            *[
                F.struct(
                    F.round(
                        dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
                        / (na * F.lit(_py_norm(c))),
                        6,
                    ).alias("cos"),
                    F.lit(-cid).alias("ncid"),
                )
                for cid, c in enumerate(centroids)
            ]
        )

    from spiders_for_all_spark.functions.vectors import norm

    best = F.array_max(let(norm(F.col(vec_col)), scored))
    # Determinism fence (same pathology + fix as parse_stage's docs alias):
    # downstream joins/groupBys on cid make the optimizer infer
    # isnotnull(cid), and predicate pushdown substitutes the alias —
    # inlining the FULL k-cosine argmax chain into a Filter below this
    # projection, so every row pays the assignment twice (visible in the
    # pre-fix plans/r06/dedup_semantic_incremental_mid_prefence.txt scan
    # Conditions).  cid is computed, never a scan column, so no pushdown
    # can ever prune I/O with it; the tautological nondeterministic guard
    # (spark_partition_id() >= 0 is always true, bounds-opaque, can't be
    # constant-folded like rand() comparisons) pins such filters above the
    # projection where they test the attribute.  Values unchanged; the
    # never-taken coalesce arm keeps cid non-nullable.
    out = emb.withColumn(
        "cid",
        F.coalesce(
            F.when(
                F.spark_partition_id() >= F.lit(0),
                (-best.getField("ncid")).cast("int"),
            ),
            F.lit(-1).cast("int"),
        ),
    )
    if with_cos:
        out = out.withColumn("centroid_cos", best.getField("cos"))
    return out


def ivf_probe_lists(
    query_vec: list[float], centroids: list[list[float]], nprobe: int = 2
) -> list[int]:
    """The nprobe nearest centroid ids for a query (driver-side: k is
    tiny; ties -> lowest cid, matching ivf_assign)."""
    ranked = sorted(
        range(len(centroids)),
        key=lambda cid: (-_cos_py(query_vec, centroids[cid]), cid),
    )
    return sorted(ranked[:nprobe])


def ivf_ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: score ONLY vectors whose inverted list is
    among the query's nprobe nearest centroids — the coarse-quantizer
    analog of the LSH path, with recall tuned by nprobe instead of
    hyperplane count.  With `cid` as a materialized partition column
    (:func:`materialize_ivf_lists`) the `cid IN (...)` filter prunes at
    the scan."""
    probes = ivf_probe_lists(query_vec, centroids, nprobe)
    cands = ivf_assign(emb, centroids, vec_col).filter(
        F.col("cid").isin(*probes)
    )
    scored = cands.select(
        F.col(id_col), _cos_to_query(vec_col, query_vec).alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Train IVF centroids with Lloyd's iterations as plain DataFrame ops:
    assign (ivf_assign, no shuffle) -> per-cid mean (one partial-agg
    shuffle of k rows) -> collect k x dim floats (bounded driver state).
    Deterministic init: the k lowest-id vectors.  Non-SQL-expressible
    (iterative) — unit-tested rather than oracle-gated."""
    init = (
        emb.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in init]
    dim = len(centroids[0])
    for _ in range(max_iter):
        assigned = ivf_assign(emb, centroids, vec_col)
        means = (
            assigned.groupBy("cid")
            .agg(
                *[
                    F.avg(F.col(vec_col).getItem(i)).alias(f"m{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        new = list(centroids)
        for r in means:
            new[int(r["cid"])] = [float(r[f"m{i}"]) for i in range(dim)]
        if new == centroids:
            break
        centroids = new
    return centroids


def _default_pair_blocks(df: DataFrame, n_clusters: int = 1) -> int:
    """Tile width for the blocked pair scan: ~2·cores tasks TOTAL from
    k·nb(nb+1)/2 tiles -> nb ≈ sqrt(4·parallelism / k), floor 1.
    Derived from the session and the cluster count, not a constant, so
    the same code fans out on any cluster width (guide §2) — and with a
    properly sized k ≈ n/c (many small clusters) nb collapses to 1,
    i.e. one task per cluster with no replication at all."""
    import math

    par = df.sparkSession.sparkContext.defaultParallelism
    return max(
        1, int(math.ceil(math.sqrt(4.0 * max(par, 1) / max(n_clusters, 1))))
    )


def _pair_hit_ids(
    p: DataFrame,
    threshold: float,
    id_col: str,
    nb: int,
) -> DataFrame:
    """Distinct ids of rows having ANY same-cid peer at
    round(dot(nv_l, nv_r), 6) >= threshold, where the peer is either a
    lower-id row or a ``_lo_only`` row (committed-corpus rule: corpus
    wins regardless of id).  ``p`` columns: id_col, ``cid``, ``_vec``
    (raw float32 vector), ``_lo_only`` (bool).

    This is the r06 replacement for the cid self-join pair scan: the
    join on k≈4 cids ran the whole O(Σ c²) pair loop on ≤k tasks with an
    interpreted zip_with+aggregate dot per pair (377 s at sf1.0).  Here
    every row lands in nb deterministic tiles (blk = xxhash64(id) mod nb;
    tile (i,j) = rows with blk∈{i,j}), giving nb(nb+1)/2 independent
    tasks per cluster, and each task hands its block to NumPy/BLAS
    (guide §4.2): one GEMM per tile instead of c²/nb² interpreted folds.

    Bit-exactness vs the Catalyst/DuckDB form: normalization is the same
    float64 sequential sum-of-squares + sqrt + elementwise divide; the
    GEMM result decides only pairs ≥1e-9 away from the HALF_UP rounding
    boundary (thr - 5e-7), and pairs inside that band are recomputed
    with the exact sequential-order dot and java.math.BigDecimal
    HALF_UP semantics (Decimal(repr(d)).quantize) — so the hit set is
    identical to the interpreted evaluation, not approximately so.
    """
    from pyspark.sql.types import StructType

    thr = float(threshold)
    out_schema = StructType([p.schema[id_col]])

    def kernel(key, table):
        import numpy as np
        import pyarrow as pa
        from decimal import ROUND_HALF_UP, Decimal

        # applyInArrow keys arrive as pyarrow scalars
        ti, tj = key[1].as_py(), key[2].as_py()
        id_type = table.schema.field(id_col).type
        ids_all = table.column(id_col).to_numpy(zero_copy_only=False)
        loo_all = table.column("_lo_only").to_numpy(zero_copy_only=False)
        vec = table.column("_vec").combine_chunks()
        dim = len(vec[0]) if len(vec) else 1
        x_all = (
            vec.flatten().to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(len(ids_all), dim)
            if len(ids_all)
            else np.zeros((0, 1))
        )

        def prep(sel):
            ids, lo_only, x = ids_all[sel], loo_all[sel], x_all[sel]
            if not len(ids):
                return ids, lo_only, x
            acc = np.zeros(len(x))
            for k in range(x.shape[1]):
                col = x[:, k]
                acc = acc + col * col
            with np.errstate(divide="ignore", invalid="ignore"):
                nv = x / np.sqrt(acc)[:, None]
            return ids, lo_only, nv

        def exact_hit(a, b) -> bool:
            s = 0.0
            for k in range(len(a)):
                s = s + a[k] * b[k]
            q = Decimal(repr(float(s))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
            return float(q) >= thr

        cut = thr - 5e-7
        hit_ids: list = []

        def scan(lo, hi):
            """Append hi ids with any admissible lo peer >= threshold."""
            ids_l, loo_l, nv_l = lo
            ids_h, loo_h, nv_h = hi
            if not len(ids_l) or not len(ids_h):
                return
            # verdicts only for non-corpus rows
            hsel = ~loo_h
            if not hsel.any():
                return
            ids_h, nv_h = ids_h[hsel], nv_h[hsel]
            d = nv_l @ nv_h.T
            mask = loo_l[:, None] | (ids_l[:, None] < ids_h[None, :])
            # NaN (zero-norm vector): Spark/DuckDB order NaN above every
            # value, so NaN >= threshold is a hit there — replicate it
            definite = ((d >= cut + 1e-9) | np.isnan(d)) & mask
            hit = definite.any(axis=0)
            band = (d > cut - 1e-9) & (d < cut + 1e-9) & mask
            if band.any():
                for j in np.nonzero(band.any(axis=0) & ~hit)[0]:
                    for i in np.nonzero(band[:, j])[0]:
                        if exact_hit(nv_l[i], nv_h[j]):
                            hit[j] = True
                            break
            hit_ids.extend(ids_h[hit].tolist())

        if ti == tj:
            side = prep(slice(None))
            scan(side, side)
        else:
            blk = table.column("_blk").to_numpy(zero_copy_only=False)
            a = prep(blk == ti)
            b = prep(blk == tj)
            scan(a, b)
            scan(b, a)
        return pa.table({id_col: pa.array(hit_ids, type=id_type)})

    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).cast("int")
    tiles = F.array(
        *[
            F.struct(
                F.least(F.col("_blk"), F.lit(t)).alias("ti"),
                F.greatest(F.col("_blk"), F.lit(t)).alias("tj"),
            )
            for t in range(nb)
        ]
    )
    e = (
        p.withColumn("_blk", blk)
        .withColumn("_tile", F.explode(tiles))
        .select(
            F.col("_tile.ti").alias("_ti"),
            F.col("_tile.tj").alias("_tj"),
            "cid",
            "_blk",
            id_col,
            "_vec",
            "_lo_only",
        )
    )
    return (
        e.groupBy("cid", "_ti", "_tj")
        .applyInArrow(kernel, out_schema)
        .distinct()
    )


def semantic_dedup(
    emb: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then inside each
    cluster drop every vector whose cosine to a LOWER-id cluster peer
    reaches ``threshold`` — the lowest id of each semantic-duplicate
    group survives.  Returns one row per input vector:
    ``(id, cid, centroid_cos, kept)``; ``centroid_cos`` is the
    prototypicality signal (cosine to the assigned centroid) that
    SSL-prototype pruning (Sorscher et al. 2022) ranks on, exposed so a
    caller can chain a "drop the most prototypical p%" filter without a
    second assignment pass.

    Scale shape: assignment is the zero-shuffle :func:`ivf_assign` map;
    the only shuffle carries ``(cid, id, vec)`` — text never rides it.
    The in-cluster pair scan is the published algorithm's O(|cluster|²),
    bounded by CHOOSING k: at n vectors pick k ≈ n / c so clusters hold
    ~c ≈ 10³ members (SemDeDup uses k = 11k clusters for 1.3e8 docs) —
    the per-cluster work is then a constant ~c²/2 cosines and the total
    is O(n·c), linear in the corpus.  The no-duplicate verdict joins
    back on id only.  The reference has no embedding pipeline at all
    (it stores raw scraped rows, core/spider.py:196-236).
    """
    # parallelize the assignment map: the source is typically ONE small
    # parquet file (1 scan task) while each row pays k interpreted
    # cosine folds — a hash repartition of the narrow (id, vec) rows
    # spreads that compute over the session's cores (per-row map, so
    # partitioning cannot change any value)
    par = emb.sparkSession.sparkContext.defaultParallelism
    a = ivf_assign(
        emb.repartition(par, F.col(id_col)), centroids, vec_col, with_cos=True
    ).select(F.col(id_col), F.col(vec_col), "cid", "centroid_cos")
    # r06: blocked NumPy pair scan (see _pair_hit_ids) instead of the cid
    # self-join — same hit set, bit-exactly, without the ≤k-task skew or
    # the interpreted per-pair dot
    p = a.select(
        F.col(id_col),
        F.col(vec_col).alias("_vec"),
        "cid",
        F.lit(False).alias("_lo_only"),
    )
    dropped = _pair_hit_ids(
        p, threshold, id_col, _default_pair_blocks(emb, len(centroids))
    ).withColumn("_dup", F.lit(True))
    # no broadcast hint: AQE converts this to a broadcast join when the
    # dropped set is small, and keeps a shuffle join when it is not (the
    # dropped side is O(n) ids in the worst case — never force it)
    return a.join(dropped, id_col, "left").select(
        id_col,
        "cid",
        "centroid_cos",
        F.col("_dup").isNull().alias("kept"),
    )


def prototype_prune(
    emb: DataFrame,
    centroids: list[list[float]],
    frac_ppm: int = 250_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SSL-prototypes data pruning (Sorscher et al. 2022,
    arXiv:2206.14486): within each embedding cluster, drop the most
    PROTOTYPICAL ``frac_ppm`` parts-per-million of members — the ones
    closest to their centroid carry the least marginal training signal
    on large datasets, so "keep hard examples" beats random pruning.
    Returns one row per vector: ``(id, cid, centroid_cos, proto_rank,
    kept)`` with ``proto_rank`` = 1 for the most prototypical member.

    The drop count is INTEGER ppm arithmetic (``(n * frac_ppm) div
    10^6``, the linkrank invariant) and the rank's tiebreak is the id,
    so the pruned set is bit-identical on any engine or partitioning.
    Plan: the zero-shuffle :func:`ivf_assign` map, then ONE shuffle on
    cid for the two windows — per-cluster sort of bounded cluster size
    (choose k as in :func:`semantic_dedup`); no pairwise work at all.
    """
    # hash-repartition before the assignment map: the source is usually a
    # single small parquet file (1 scan task) while each row pays the
    # interpreted cosine folds — per-row map, so values are unaffected
    par = emb.sparkSession.sparkContext.defaultParallelism
    a = ivf_assign(
        emb.repartition(par, F.col(id_col)), centroids, vec_col, with_cos=True
    )
    w_rank = Window.partitionBy("cid").orderBy(
        F.desc("centroid_cos"), F.col(id_col)
    )
    w_all = Window.partitionBy("cid")
    return (
        a.select(F.col(id_col), F.col("cid"), F.col("centroid_cos"))
        .withColumn("proto_rank", F.row_number().over(w_rank))
        .withColumn("_n", F.count("*").over(w_all))
        .withColumn(
            "kept",
            F.col("proto_rank")
            > F.expr(f"(_n * {int(frac_ppm)}) div 1000000"),
        )
        .drop("_n")
    )


def semantic_dedup_incremental(
    index: DataFrame,
    batch: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_keys: bool = True,
) -> DataFrame:
    """Batch-vs-corpus semantic-dedup probe — the :func:`semantic_dedup`
    analogue of the incremental MinHash index (textdedup
    minhash_index_probe): a growing corpus is NEVER re-embedded or
    re-compared to dedup a new batch.  ``index`` is the committed
    corpus with its assignment (``(id, cid, vec)`` — ivf_assign output,
    or a cid-partitioned :func:`materialize_ivf_lists` read, where the
    cid semi-join below becomes partition pruning).  A batch vector
    drops if ANY corpus member of its cluster sits at cosine >=
    ``threshold`` (committed corpus always wins, regardless of id), or
    if a LOWER-id batch peer does (the one-shot rule).  Returns one
    verdict row per batch vector: ``(id, cid, centroid_cos, kept)``.

    Scale shape: the corpus side is a streamed narrow scan semi-joined
    against a BROADCAST of the batch's distinct cluster ids — the
    corpus is never shuffled, mirroring the engine rule that no round
    job shuffles the full seen set.  Only O(batch × cluster-occupancy)
    rows enter the cosine pair work.  Set ``broadcast_keys=False`` for
    very large batches (shuffle semi-join, still O(batch + hits)).
    """
    par = batch.sparkSession.sparkContext.defaultParallelism
    b = ivf_assign(
        batch.repartition(par, F.col(id_col)), centroids, vec_col, with_cos=True
    ).select(F.col(id_col), F.col(vec_col), "cid", "centroid_cos")
    keys = b.select("cid").distinct()
    if broadcast_keys:
        keys = F.broadcast(keys)
    cand = index.select(F.col(id_col), F.col(vec_col), "cid").join(
        keys, "cid"
    )
    # r06: ONE blocked NumPy pair pass covers both rules (see
    # _pair_hit_ids): corpus rows enter lo-only (corpus wins regardless
    # of id), batch rows enter both roles with the lower-id rule —
    # replacing the two cid self/semi-joins whose interpreted per-pair
    # dot ran on ≤k tasks (118 s at sf1.0)
    p = b.select(
        F.col(id_col),
        F.col(vec_col).alias("_vec"),
        "cid",
        F.lit(False).alias("_lo_only"),
    ).unionByName(
        cand.select(
            F.col(id_col),
            F.col(vec_col).alias("_vec"),
            "cid",
            F.lit(True).alias("_lo_only"),
        )
    )
    dropped = _pair_hit_ids(
        p, threshold, id_col, _default_pair_blocks(batch, len(centroids))
    ).withColumn("_dup", F.lit(True))
    return b.join(dropped, id_col, "left").select(
        id_col,
        "cid",
        "centroid_cos",
        F.col("_dup").isNull().alias("kept"),
    )


def materialize_ivf_lists(
    emb: DataFrame,
    out_path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> str:
    """Write the embedding table physically partitioned by IVF list id —
    at 10^9 vectors the probe becomes an nprobe-of-k partition read
    (PartitionFilters), like the LSH index build."""
    ivf_assign(emb, centroids, vec_col).write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(out_path)
    return out_path


def materialize_lsh_buckets(
    emb: DataFrame,
    out_path: str,
    n_planes: int = 6,
    dim: int = 64,
    vec_col: str = "embedding",
) -> str:
    """One-time IVF-style index build: write the embedding table physically
    partitioned by LSH bucket (Iceberg: PARTITIONED BY (bucket)).

    At 10^9 vectors this is what turns the probe filter from a full scan
    into a 7-of-2^n_planes partition read — the scale path the on-the-fly
    variant cannot provide (VERDICT r01 item 7).
    """
    bucketed = emb.withColumn("bucket", lsh_bucket(F.col(vec_col), n_planes, dim))
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(out_path)
    return out_path


def lsh_ann_topk_materialized(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN probe over the materialized bucket layout: the `bucket IN (...)`
    predicate lands in the scan's PartitionFilters, so only the probe
    buckets' files are ever opened (verified in PLANS.md)."""
    probes = probe_buckets(query_vec, n_planes, dim, multiprobe)
    df = spark.read.parquet(index_path)
    cands = df.filter(F.col("bucket").isin(*probes))
    scored = cands.select(
        F.col(id_col), _cos_to_query(vec_col, query_vec).alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)
