"""Similarity search over an embedding column (``array<float>``) — the
ANN stage of an LLM training-data pipeline (no reference counterpart;
driver north star / SURVEY §7.2 M7).

Two tiers, both pure DataFrame (higher-order functions, zero Python in
the row path):

- ``cosine_topk``   — exact brute-force top-k: broadcast the (small)
                      query set, one narrow pass over the corpus, then
                      a per-query top-k window whose map stage is
                      truncated to partition-local top-k by Catalyst's
                      InferWindowGroupLimit (see ``_rank_topk``). At
                      100 TB this is THE baseline: no shuffle of the
                      corpus, scan stays columnar and whole-stage-
                      codegen'd, and the per-query reducer receives
                      ≤ #partitions·k rows, never the corpus's scores.
- ``ann_topk``      — sign-LSH bucketed: corpus hashed once to a
                      2^bits-bucket id from coordinate signs (axis-
                      aligned random-hyperplane LSH, deterministic so
                      the DuckDB oracle reproduces it); queries probe
                      their own bucket plus all hamming-1 neighbors.
                      Candidate volume drops ~(bits+1)/2^bits; recall
                      measured in tests against the exact tier.

Scoring is double-precision end-to-end (floats cast up before any
arithmetic) with left-to-right fold order, so DuckDB's
``list_dot_product`` reproduces cosines bit-for-bit; ranking uses the
ROUNDED cosine with vec_id tiebreak ⇒ deterministic total order on both
sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.functions.layout import fan_out_scan
from optimal_parallel_fp_growth_spark.functions.literals import (
    lit_double_array,
    lit_double_matrix,
    lit_int_array,
    lit_long_array,
)

ANN_BITS = 6  # 64 sign buckets — the pinned default the oracle mirrors
ANN_TARGET_OCCUPANCY = 64  # expected docs per bucket the auto path aims at


def ann_bits_for(
    n_corpus: int,
    dim: int,
    target_occupancy: int = ANN_TARGET_OCCUPANCY,
    min_bits: int = 4,
    max_bits: int = 16,
) -> int:
    """Sign-LSH width for a corpus of ``n_corpus`` ``dim``-dimensional
    vectors: the smallest ``bits`` whose expected uniform bucket
    occupancy ``n/2^bits`` is ≤ ``target_occupancy``, clamped to
    [min_bits, min(max_bits, dim)] — each bucket bit consumes one
    coordinate, and beyond ~16 bits the hamming-1 probe fan-out
    (bits+1 probes) costs more than the occupancy saves. Bucket count
    thus grows linearly with the corpus, keeping per-query candidate
    volume O(target_occupancy · (bits+1)) instead of O(n) at a frozen
    width — the knob the 100 TB path turns."""
    cap = max(min_bits, min(max_bits, dim))
    bits = min_bits
    while bits < cap and n_corpus > target_occupancy * (1 << bits):
        bits += 1
    return bits


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Left-to-right fold — same order as DuckDB's list_dot_product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _prepared(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    # fan out a single-split scan BEFORE the interpreted norm2 fold —
    # the whole vector family (knn/ann/ivf/kmeans/semdedup) builds on
    # this frame, and on the one-file fixture the fold plus everything
    # downstream otherwise serializes on one core (functions/layout.py)
    base = fan_out_scan(
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__e")),
        "vec_id",
    )
    v = _as_double(F.col("__e"))
    return base.select("vec_id", v.alias("v")).withColumn(
        "norm2", _dot(F.col("v"), F.col("v"))
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """scored: (query_id, vec_id, cosine) → exact top-k per query by
    (cosine desc, vec_id asc).

    Deliberately a single per-query window: on Spark ≥3.5 the
    ``rn <= k`` filter over ``row_number`` triggers Catalyst's
    InferWindowGroupLimit, which plants a *Partial* WindowGroupLimit
    in the map stage — every corpus partition is truncated to its own
    top-k per query BEFORE the exchange, so the per-query reducer
    receives ≤ #partitions·k rows, never the full corpus's scores.
    That is exactly the two-phase (partition-local then global) top-k,
    done by the optimizer with zero extra shuffles; a hand-rolled
    spark_partition_id pre-window was measured to add one full
    Exchange for nothing. Pinned by
    tests/test_plan_quality.py::test_knn_topk_has_partial_group_limit.
    Exactness regardless of partitioning: the order (rounded cosine
    desc, vec_id asc) is total, and any global-top-k row is in its
    partition's local top-k."""
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine", "rn")
    )


def _score_topk(cand: DataFrame, k: int) -> DataFrame:
    """cand: (query_id, qv, qnorm2, vec_id, v, norm2) → top-k by cosine."""
    cos = F.round(
        _dot(F.col("qv"), F.col("v")) / F.sqrt(F.col("qnorm2") * F.col("norm2")), 6
    )
    return _rank_topk(cand.select("query_id", "vec_id", cos.alias("cosine")), k)


def _score_topk_arrow(cand: DataFrame, k: int) -> DataFrame:
    """Arrow twin of ``_score_topk``: one numpy matmul per query group
    (``applyInPandas`` on query_id), same round-6 cosine and
    (cosine desc, vec_id asc) order — identical rows to the SQL path.

    Trade vs the SQL window: per-candidate scoring drops from an
    interpreted HOF fold to BLAS, but each query's FULL candidate list
    (vectors included) ships through Arrow to one task, while the SQL
    path pre-trims map-side via WindowGroupLimit and never moves the
    vectors. MEASURED at sf10 (200k corpus, 4k queries): SQL 59.3 s,
    arrow 417.7 s — candidate-vector movement dominates the fold cost,
    so the SQL window is the scale default for ANN/IVF scoring and this
    twin is for fat-per-candidate compute at small candidate volumes
    (kept equality-tested). Contrast semdedup's per-cell Gram prune,
    where the grouped rows are needed in full anyway and arrow wins
    29×."""
    import numpy as np
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(pdf["v"].to_numpy())
        qv = np.asarray(pdf["qv"].iloc[0], dtype=np.float64)
        cos = np.round(
            (V @ qv)
            / np.sqrt(pdf["norm2"].to_numpy(dtype=np.float64) * float(pdf["qnorm2"].iloc[0])),
            6,
        )
        ids = pdf["vec_id"].to_numpy()
        top = np.lexsort((ids, -cos))[:k]
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "vec_id": ids[top],
                "cosine": cos[top],
                "rn": np.arange(1, len(top) + 1, dtype=np.int32),
            }
        )

    return cand.groupBy("query_id").applyInPandas(
        fn, "query_id long, vec_id long, cosine double, rn int"
    )


def _pick_score_topk(impl: str):
    if impl not in ("sql", "arrow"):
        raise ValueError(f"impl must be 'sql' or 'arrow', got {impl!r}")
    return _score_topk_arrow if impl == "arrow" else _score_topk


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.
    → (query_id, vec_id, cosine, rn). Self-matches excluded."""
    corpus = _prepared(emb, id_col, vec_col)
    q = _prepared(queries, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm2").alias("qnorm2"),
    )
    cand = corpus.crossJoin(F.broadcast(q)).where(
        F.col("query_id") != F.col("vec_id")
    )
    return _score_topk(cand, k)


def cosine_topk_arrow(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same result as :func:`cosine_topk`, scored in an Arrow-batched
    ``mapInPandas`` (numpy matmul per batch) instead of JVM expressions.

    Exists as the measured alternative path: for ~64-dim vectors the
    JVM higher-order-function scorer wins (no serialization), but as
    dimensionality or query count grows the BLAS matmul amortizes the
    Arrow transfer — bench both before choosing at a new scale. Top-k
    ranking (rounded cosine, vec_id tiebreak) is identical, so the two
    tiers are interchangeable bit-for-bit.
    """
    import numpy as np
    import pandas as pd

    q_rows = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("v"))
        .collect()
    )
    q_ids = [r.query_id for r in q_rows]
    q_mat = np.array([r.v for r in q_rows], dtype=np.float64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norm))

    def score(batches):
        q_ids_, q_mat_, q_norm_ = bc.value
        for pdf in batches:
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norm = np.sqrt((c_mat * c_mat).sum(axis=1))
            cos = (c_mat @ q_mat_.T) / np.outer(c_norm, q_norm_)
            n_c, n_q = cos.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids_, n_c),
                    "vec_id": np.tile(pdf[id_col].to_numpy(), n_q),
                    "cosine": np.round(cos.T.ravel(), 6),
                }
            )

    scored = emb.select(id_col, vec_col).mapInPandas(
        score, "query_id long, vec_id long, cosine double"
    ).where(F.col("query_id") != F.col("vec_id"))
    return _rank_topk(scored, k)


def _resolve_bits(emb: DataFrame, vec_col: str, bits: int | None) -> int:
    """``bits=None`` → derive from the corpus via :func:`ann_bits_for`.
    Costs one count job plus one first() (dim probe) — negligible next
    to the ANN join, and the count is exactly the statistic the width
    must track."""
    if bits is not None:
        return bits
    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        return 4  # empty corpus: width is irrelevant
    return ann_bits_for(emb.count(), first.d)


def _sign_bucket(vec: Column, bits: int = ANN_BITS) -> Column:
    """LSH bucket id from the signs of the first ``bits`` coordinates."""
    b = F.lit(0)
    for i in range(bits):
        b = b + F.when(F.element_at(vec, i + 1) > 0, F.lit(1 << i)).otherwise(0)
    return b


IVF_CELLS = 16
IVF_PROBE = 2
IVF_MAX_CELLS = 4096


def ivf_cells_for(n_corpus: int, min_cells: int = IVF_CELLS,
                  max_cells: int = IVF_MAX_CELLS) -> int:
    """IVF cell count for a corpus: ~sqrt(n) (the FAISS rule of thumb —
    balances cell size against centroid-scan cost), clamped to
    [min_cells, max_cells]. The centroid table is collected driver-side
    and broadcast: at the 4096-cell clamp with 64-dim doubles that is
    ~2 MB, still broadcast-sized."""
    import math

    return max(min_cells, min(max_cells, int(math.isqrt(max(n_corpus, 1)))))


def _cell_scores(cents: list[tuple[int, list[float], float]]) -> Column:
    """Sorted (neg_cos, cid) struct array scoring a row's ``v``/``norm2``
    against every centroid — rounded cosine with centroid-id tiebreak so
    the DuckDB oracle reproduces cell assignment and probe order
    bit-for-bit. Shared by the one-shot `ivf_topk` and the persisted
    `build_ivf_index`/`ann_against_index` pair."""

    # ONE transform over an index sequence against matrix/array SQL-
    # text literals (functions/literals.py), not one aggregate+zip_with
    # pair per centroid: each HOF lambda costs ~20 ms of py4j traffic
    # to construct and F.lit(list) one gateway round trip per element,
    # so at cells≈isqrt(n) the per-cell form spent more driver time
    # BUILDING the probe plan than running it (knn_ivf_index: 1.5 s of
    # a 5.3 s wall). 3 lambdas total, independent of cell count;
    # values, fold order, rounding and struct typing are unchanged.
    if not cents:
        # F.sequence(1, 0) infers step -1 → [1, 0]: phantom
        # element_at probes on empty literals (ADVICE r17)
        raise ValueError("at least one centroid is required")
    cids = [cid for cid, _, _ in cents]
    ids_arr = (
        lit_int_array(cids)
        if all(-(2**31) <= c < 2**31 for c in cids)
        else lit_long_array(cids)
    )
    cvs = lit_double_matrix([cv for _, cv, _ in cents])
    cns = lit_double_array([cn for _, _, cn in cents])
    return F.array_sort(
        F.transform(
            F.sequence(F.lit(1), F.lit(len(cents))),
            lambda i: F.struct(
                (
                    -F.round(
                        F.aggregate(
                            F.zip_with(
                                F.col("v"),
                                F.element_at(cvs, i),
                                lambda x, y: x * y,
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )
                        / F.sqrt(F.col("norm2") * F.element_at(cns, i)),
                        6,
                    )
                ).alias("neg_cos"),
                F.element_at(ids_arr, i).alias("cid"),
            ),
        )
    )


def build_ivf_index(
    emb: DataFrame,
    name: str,
    n_cells: int | None = IVF_CELLS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int | None = None,
) -> str:
    """Persist a corpus's IVF structure ONCE so repeated query batches
    probe it without recomputing assignments — the standing-index shape
    a production similarity-search deployment runs (the per-vector
    centroid scan is the expensive part of `ivf_topk`, and it is pure
    corpus state):

    - ``<name>_centroids`` (cid, cv, cn) — n_cells rows, collected and
      broadcast at probe time;
    - ``<name>_cells`` (vec_id, v, norm2, cell) BUCKETED on cell — in
      the broadcast-probe regime the corpus side streams with no
      exchange anyway; the bucketing keeps it exchange-free in the
      big-batch regime where the probe side is too large to broadcast
      and the join plans as SMJ on cell.

    Same deterministic seeded centroids as `ivf_topk` (first n_cells
    vectors by id): an index built over a corpus and probed with any
    query subset reproduces `ivf_topk`'s answers exactly.
    """
    spark = emb.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    prepared = _prepared(emb, id_col, vec_col)
    if n_cells is None:
        n_cells = ivf_cells_for(emb.count())
    cent_rows = prepared.orderBy("vec_id").limit(n_cells).collect()
    cents = [(int(r.vec_id), list(r.v), float(r.norm2)) for r in cent_rows]
    spark.createDataFrame(
        cents, "cid long, cv array<double>, cn double"
    ).write.format("parquet").saveAsTable(f"{name}_centroids")
    (
        prepared.withColumn("cell", _cell_scores(cents)[0]["cid"])
        .repartition(n_buckets, "cell")
        .write.bucketBy(n_buckets, "cell")
        .sortBy("cell")
        .format("parquet")
        .saveAsTable(f"{name}_cells")
    )
    return name


def drop_ivf_index(spark, name: str) -> None:
    for suffix in ("_centroids", "_cells"):
        spark.sql(f"DROP TABLE IF EXISTS {name}{suffix}")


def ann_against_index(
    queries: DataFrame,
    name: str,
    k: int = 10,
    n_probe: int = IVF_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "sql",
) -> DataFrame:
    """Probe a query batch against a standing :func:`build_ivf_index`
    → (query_id, vec_id, cosine, rn). Per batch, the corpus costs only
    its bucketed cell scan — assignments are never recomputed and the
    index side is never exchanged; the batch pays its own centroid
    scoring plus the within-cell exact ranking."""
    spark = queries.sparkSession
    cent_rows = spark.table(f"{name}_centroids").collect()
    cents = [(int(r.cid), list(r.cv), float(r.cn)) for r in cent_rows]
    q = (
        _prepared(queries, id_col, vec_col)
        .withColumn("__cells", _cell_scores(cents))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm2").alias("qnorm2"),
            F.explode(
                F.transform(
                    F.slice(F.col("__cells"), 1, n_probe), lambda s: s["cid"]
                )
            ).alias("cell"),
        )
    )
    cand = spark.table(f"{name}_cells").join(F.broadcast(q), "cell").where(
        F.col("query_id") != F.col("vec_id")
    )
    return _pick_score_topk(impl)(cand, k)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int | None = IVF_CELLS,
    n_probe: int = IVF_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "sql",
) -> DataFrame:
    """IVF-flavored ANN: corpus partitioned into coarse cells by nearest
    centroid, queries probe their ``n_probe`` closest cells, exact
    cosine rank inside the probed cells. → (query_id, vec_id, cosine, rn).
    ``n_cells=None`` derives ~sqrt(corpus) cells via
    :func:`ivf_cells_for` (one count job).

    Centroids are SEEDED deterministically (the first ``n_cells``
    vectors by id) instead of k-means-trained — the inverted-file
    structure, assignment, and probing are the real thing; swapping in
    trained centroids changes recall, not the dataflow. Cell ids and
    probe order use rounded cosine with centroid-id tiebreak so the
    DuckDB oracle reproduces the index bit-for-bit."""
    prepared = _prepared(emb, id_col, vec_col)
    if n_cells is None:
        n_cells = ivf_cells_for(emb.count())
    cent_rows = (
        prepared.orderBy("vec_id").limit(n_cells).collect()
    )  # tiny: n_cells × dim
    cents = [(int(r.vec_id), list(r.v), float(r.norm2)) for r in cent_rows]
    scored_cells = _cell_scores(cents)
    corpus = prepared.withColumn("cell", scored_cells[0]["cid"])
    q = (
        _prepared(queries, id_col, vec_col)
        .withColumn("__cells", scored_cells)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm2").alias("qnorm2"),
            F.explode(
                F.transform(
                    F.slice(F.col("__cells"), 1, n_probe), lambda s: s["cid"]
                )
            ).alias("cell"),
        )
    )
    cand = corpus.join(F.broadcast(q), "cell").where(
        F.col("query_id") != F.col("vec_id")
    )
    return _pick_score_topk(impl)(cand, k)


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    bits: int | None = ANN_BITS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup-tier companion
    of ann_topk): candidates from sign-LSH buckets with hamming-1
    multi-probe, exact cosine verify ≥ threshold. → (doc_a, doc_b,
    cosine). All-pairs work is confined to bucket-collision groups —
    the shape that survives a 100 TB corpus where the exact quadratic
    verify is impossible. ``bits=None`` sizes the bucket width to the
    corpus (:func:`ann_bits_for`) so occupancy stays bounded as the
    corpus grows."""
    bits = _resolve_bits(emb, vec_col, bits)
    corpus = _prepared(emb, id_col, vec_col).withColumn(
        "bucket", _sign_bucket(F.col("v"), bits)
    )
    qb = _sign_bucket(F.col("v"), bits)
    probing = _prepared(emb, id_col, vec_col).select(
        F.col("vec_id").alias("doc_a"),
        F.col("v").alias("va"),
        F.col("norm2").alias("na"),
        F.explode(
            F.array_distinct(
                F.array(qb, *[qb.bitwiseXOR(F.lit(1 << j)) for j in range(bits)])
            )
        ).alias("bucket"),
    )
    cand = (
        probing.join(corpus, "bucket")
        .where(F.col("doc_a") < F.col("vec_id"))
        .select("doc_a", F.col("vec_id").alias("doc_b"), "va", "na", "v", "norm2")
        # a pair can collide via a's probe AND b's probe — keep one
        .dropDuplicates(["doc_a", "doc_b"])
    )
    cos = F.round(
        _dot(F.col("va"), F.col("v")) / F.sqrt(F.col("na") * F.col("norm2")), 6
    )
    return (
        cand.select("doc_a", "doc_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int | None = ANN_BITS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "sql",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign
    bucket and its hamming-1 neighbor buckets (multi-probe), then exact
    cosine rank. → (query_id, vec_id, cosine, rn). ``bits=None`` sizes
    the bucket width to the corpus (:func:`ann_bits_for`).
    ``impl="arrow"`` scores each query's candidates with one BLAS
    matmul (identical rows; see ``_score_topk_arrow``)."""
    bits = _resolve_bits(emb, vec_col, bits)
    corpus = _prepared(emb, id_col, vec_col).withColumn(
        "bucket", _sign_bucket(F.col("v"), bits)
    )
    qb = _sign_bucket(F.col("v"), bits)
    q = (
        _prepared(queries, id_col, vec_col)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm2").alias("qnorm2"),
            F.explode(
                F.array_distinct(
                    F.array(qb, *[qb.bitwiseXOR(F.lit(1 << j)) for j in range(bits)])
                )
            ).alias("bucket"),
        )
    )
    cand = corpus.join(F.broadcast(q), "bucket").where(
        F.col("query_id") != F.col("vec_id")
    )
    return _pick_score_topk(impl)(cand, k)


def label_centroids(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label mean embedding, one row per (label, dimension):
    → (label, pos, mean_val, n_vectors). The long layout keeps the
    oracle exact (no cross-engine array hashing) and the shuffle key
    space tiny (labels × dims).

    Scale: posexplode is a codegen'd 64×-row projection (no Python, no
    data copy of the vector beyond the scan), then ONE shuffle on
    (label, pos) with map-side partial avg/count — every executor ships
    labels × dims partial rows regardless of corpus size."""
    pe = emb.select(F.col(label_col).alias("label"),
                    F.posexplode(vec_col).alias("pos", "v"))
    return pe.groupBy("label", "pos").agg(
        F.avg("v").alias("mean_val"), F.count(F.lit(1)).alias("n_vectors")
    )


def random_projection(
    emb: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Johnson-Lindenstrauss dimension reduction: project each vector
    through a deterministic ±1/sqrt(out_dim) sign matrix (Achlioptas
    2003 — JL guarantees hold with the sign ensemble, no Gaussians
    needed). → (vec_id, *keep_cols, proj: array<double>).

    Scale stance: the reduced vectors are what ANN/dedup stages then
    SHUFFLE — at 100 TB cutting 64→16 dims cuts every downstream
    vector exchange 4×, while JL bounds pairwise-distance distortion
    by ~sqrt(log n / out_dim). The projection itself is a shuffle-free
    codegen projection: out_dim dot products against broadcast-literal
    sign rows (same driver-side-literals pattern as k-means
    centroids); the matrix is seeded-deterministic, so re-runs, task
    retries, and the DuckDB twin all see the same R."""
    import numpy as np

    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("random_projection: empty input")
    in_dim = first["d"]
    rng = np.random.default_rng(seed)
    scale = 1.0 / float(np.sqrt(out_dim))
    R = rng.choice((-scale, scale), size=(out_dim, in_dim))
    v = _as_double(F.col(vec_col))
    prepared = emb.select(
        F.col(id_col).alias("vec_id"), *keep_cols, v.alias("__v")
    )
    # one transform over the projection-matrix literal (3 lambdas
    # total) instead of one _dot expression pair per output dim —
    # same rows in order, same left-to-right fold per row
    proj = F.transform(
        lit_double_matrix([[float(x) for x in row] for row in R]),
        lambda r: _dot(F.col("__v"), r),
    )
    return prepared.select("vec_id", *keep_cols, proj.alias("proj"))


def _hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket from the signs of dots against random ±1 hyperplane
    normals — the textbook random-hyperplane family for cosine, vs
    :func:`_sign_bucket`'s coordinate signs (axis-aligned planes, which
    under-spread buckets when coordinates are correlated). Plane rows
    are driver-side literals so the DuckDB oracle reproduces buckets
    bit-for-bit (same L2R dot fold)."""
    # fold over a transform against the plane-matrix literal (4
    # lambdas total) instead of one _dot pair per plane; same terms,
    # same int addition order, same result type
    if not planes:
        # F.sequence(1, 0) infers step -1 → [1, 0]: phantom
        # element_at probes on empty literals (ADVICE r17)
        raise ValueError("at least one hyperplane is required")
    planes_lit = lit_double_matrix([[float(x) for x in row] for row in planes])
    if len(planes) > 31:
        # 1 << 31 exceeds int32 (ADVICE r17): take the long arm, the
        # same silent widening the old per-plane F.lit(1 << j) did
        weights = lit_long_array([1 << j for j in range(len(planes))])
        zero = F.lit(0).cast("long")
    else:
        weights = lit_int_array([1 << j for j in range(len(planes))])
        zero = F.lit(0)
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(len(planes))),
            lambda j: F.when(
                _dot(vec, F.element_at(planes_lit, j)) > 0,
                F.element_at(weights, j),
            ).otherwise(zero),
        ),
        zero,
        lambda acc, x: acc + x,
    )


def hyperplane_planes(bits: int, dim: int, seed: int = 0) -> list[list[float]]:
    """Seeded ±1 hyperplane normals (sign ensemble — same LSH family
    guarantee as Gaussian normals, exactly representable as SQL
    literals)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.choice((-1.0, 1.0), size=(bits, dim)).tolist()


def ann_topk_hyperplane(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int | None = ANN_BITS,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "sql",
) -> DataFrame:
    """:func:`ann_topk` with random-hyperplane buckets instead of
    coordinate signs: candidates restricted to the query's bucket and
    its hamming-1 neighbors (multi-probe), then EXACT cosine rank in
    the original space. Decorrelated planes spread skewed corpora over
    buckets more evenly — same candidate-join shape and cost as
    ``ann_topk``, one seeded matrix of literals extra."""
    bits = _resolve_bits(emb, vec_col, bits)
    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("ann_topk_hyperplane: empty corpus")
    planes = hyperplane_planes(bits, first["d"], seed)
    corpus = _prepared(emb, id_col, vec_col).withColumn(
        "bucket", _hyperplane_bucket(F.col("v"), planes)
    )
    qb = _hyperplane_bucket(F.col("v"), planes)
    q = (
        _prepared(queries, id_col, vec_col)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm2").alias("qnorm2"),
            F.explode(
                F.array_distinct(
                    F.array(qb, *[qb.bitwiseXOR(F.lit(1 << j)) for j in range(bits)])
                )
            ).alias("bucket"),
        )
    )
    cand = corpus.join(F.broadcast(q), "bucket").where(
        F.col("query_id") != F.col("vec_id")
    )
    return _pick_score_topk(impl)(cand, k)


def hard_negatives(
    emb: DataFrame,
    queries: DataFrame,
    lo: float = 0.2,
    hi: float = 0.45,
    k: int = 10,
    bits: int | None = ANN_BITS,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-``k`` candidates whose EXACT cosine lands in the
    similar-but-not-duplicate band [lo, hi] — close enough to be
    informative negatives, below the near-dup zone that would poison
    the label. Candidates come from the random-hyperplane multi-probe
    buckets (:func:`ann_topk_hyperplane`'s generator — biased toward
    high similarity, exactly the region hard negatives live in);
    scoring is exact, so the band test never misclassifies a
    candidate. Pairs the LSH buckets miss are, by construction, the
    easy negatives :func:`~..sampling.negative_pairs` supplies.
    → (query_id, vec_id, cosine, rn) with rn ranked by cosine DESC
    inside the band."""
    bits = _resolve_bits(emb, vec_col, bits)
    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("hard_negatives: empty corpus")
    planes = hyperplane_planes(bits, first["d"], seed)
    corpus = _prepared(emb, id_col, vec_col).withColumn(
        "bucket", _hyperplane_bucket(F.col("v"), planes)
    )
    qb = _hyperplane_bucket(F.col("v"), planes)
    q = (
        _prepared(queries, id_col, vec_col)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm2").alias("qnorm2"),
            F.explode(
                F.array_distinct(
                    F.array(qb, *[qb.bitwiseXOR(F.lit(1 << j)) for j in range(bits)])
                )
            ).alias("bucket"),
        )
    )
    cand = corpus.join(F.broadcast(q), "bucket").where(
        F.col("query_id") != F.col("vec_id")
    )
    cosine = F.round(
        _dot(F.col("qv"), F.col("v")) / F.sqrt(F.col("qnorm2") * F.col("norm2")),
        6,
    )
    # no pair-dedup needed: probes are distinct and each corpus row
    # owns ONE bucket, so a (query, vec) pair matches at most once
    banded = cand.select("query_id", "vec_id", cosine.alias("cosine")).where(
        (F.col("cosine") >= lo) & (F.col("cosine") <= hi)
    )
    return _rank_topk(banded, k)


def quantize_embeddings(
    vectors: DataFrame, col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 scalar quantization (round 14): per-vector scale
    ``max|x|`` and codes ``round(x / scale * 127)`` ∈ [-127, 127] — the
    4× memory cut that keeps a 100 TB embedding corpus ANN-searchable
    in RAM (int8 dot products approximate cosines to ~1e-2, and the
    codes re-expand losslessly to within scale/254 per element by
    construction). All-zero vectors quantize to all-zero codes with
    scale 0. Pure codegen: two `transform` lambdas and an `array_max`
    — no UDF, no shuffle; the quantization is a projection.

    → input columns + (scale double, codes array<int>)."""
    d = F.expr(
        f"transform({col}, x -> abs(cast(x as double)))"
    )
    out = vectors.withColumn("scale", F.array_max(d))
    codes = F.expr(
        f"CASE WHEN scale = 0d THEN transform({col}, x -> 0) "
        f"ELSE transform({col}, x -> "
        f"cast(round(cast(x as double) / scale * 127.0d) as int)) END"
    )
    return out.withColumn("codes", codes)
