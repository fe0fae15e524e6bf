"""Deterministic sampling operators for training-data pipelines
(no reference counterpart; driver north star — corpus splitting and
source mixing are the last mile of every LLM data pipeline).

Both operators decide per-row from an md5-derived bucket of the row's
id, so they are:

- deterministic & reproducible — same input row → same decision on any
  cluster, any partitioning, any Spark version (no RNG, no
  ``rand()``-is-recomputed-per-retry hazard: a failed task's retry gets
  identical decisions, which ``F.rand`` does NOT guarantee under
  speculative execution);
- oracle-checkable — DuckDB reproduces md5 bit-for-bit;
- independent of each other — every operator salts the hash with a
  purpose string, otherwise "test split" and "kept by mixing" would be
  correlated events (a 0.5 mixing rate would annihilate a top-bucket
  test split entirely).

Scale: pure codegen'd projections/filters over the scan — no shuffle,
no UDF, predicate pushes down to parquet row-group pruning where the
id column is sorted.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(id_col: str, salt: str) -> Column:
    """Deterministic bucket in [0, BUCKETS): first 8 hex digits of
    md5(salt || ':' || id) as an integer, mod BUCKETS."""
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BUCKETS


def corpus_split(
    docs: DataFrame,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights
    (must sum to 1). → input columns + ``split``. Boundaries are
    cumulative-weight bucket thresholds, so a (0.9, 0.05, 0.05) split is
    exact to 1/BUCKETS granularity and stable under corpus growth: a
    row's split never changes when other rows are added or removed."""
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if any(w < 0 for _, w in weights):
        raise ValueError("split weights must be non-negative")
    if "split" in docs.columns:
        raise ValueError(
            "input already has a 'split' column - rename or drop it before "
            "split_corpus (withColumn would silently replace it)"
        )
    bucket = hash_bucket(id_col, salt)
    expr = None
    cum = 0.0
    for name, w in weights[:-1]:
        cum += w
        bound = int(round(cum * BUCKETS))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = weights[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(last)
    return docs.withColumn("split", split)


def mix_sources(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-source downsampling (corpus mixing): keep a row
    iff its hash bucket < rate(source)·BUCKETS. Sources absent from
    ``rates`` keep ``default_rate``. → input rows that survive.

    The rates table rides a broadcast join (it is a handful of rows even
    at 100 TB — one per source), so the plan is scan → broadcast hash
    join → codegen'd filter: zero shuffles of the fact table."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    if "keep_below" in docs.columns:
        # the broadcast rates join would make F.col('keep_below') ambiguous
        # (or silently shadow user data).
        raise ValueError(
            "input already has a 'keep_below' column - rename or drop it "
            "before mix_sources (reserved for the internal rates join)"
        )
    spark = docs.sparkSession
    rates_df = spark.createDataFrame(
        [(s, int(round(r * BUCKETS))) for s, r in sorted(rates.items())],
        f"{source_col} string, keep_below int",
    )
    default_below = int(round(default_rate * BUCKETS))
    keep = hash_bucket(id_col, salt) < F.coalesce(
        F.col("keep_below"), F.lit(default_below)
    )
    return (
        docs.join(F.broadcast(rates_df), source_col, "left")
        .where(keep)
        .select(*docs.columns)
    )


def mix_by_temperature(
    docs: DataFrame,
    target_total: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mixtemp",
) -> DataFrame:
    """Temperature-based source mixing: resample so source s's share of
    the output is proportional to count(s)^alpha (alpha=1 keeps natural
    proportions, alpha=0 equalizes sources, alpha≈0.5 is the usual
    multilingual/multi-source rebalance). → input rows that survive.

    Per-source keep rate = min(1, target_total·w_s / count_s) with
    w_s = count_s^alpha / Σ count_s^alpha; rows are kept by the same
    deterministic md5-bucket rule as ``mix_sources`` (retry-safe, no
    RNG). Oversampling is not attempted: a source whose natural count is
    below its target keeps everything (rate capped at 1), so the output
    can undershoot ``target_total`` — by design, this operator never
    duplicates rows.

    Scale: one count aggregation over the fact table (map-side combined),
    a per-source rate table of #sources rows computed with a single-
    partition window over that TINY aggregate (not the fact table), then
    a broadcast join + codegen'd filter — the fact table is never
    shuffled.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    if target_total < 0:
        raise ValueError(f"target_total must be >= 0, got {target_total}")
    if "keep_below" in docs.columns:
        raise ValueError(
            "input already has a 'keep_below' column - rename or drop it "
            "before mix_by_temperature (reserved for the internal rates join)"
        )
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("c_s"))
    pw = F.pow(F.col("c_s"), F.lit(float(alpha)))
    rates = (
        counts.withColumn("pw", pw)
        # empty OVER() = one partition — fine, `counts` has one row per source
        .withColumn("tot", F.sum("pw").over(Window.partitionBy()))
        .withColumn(
            "rate",
            F.least(
                F.lit(1.0),
                F.lit(float(target_total)) * F.col("pw") / F.col("tot") / F.col("c_s"),
            ),
        )
        .select(
            source_col,
            F.round(F.col("rate") * BUCKETS, 0).cast("int").alias("keep_below"),
        )
    )
    keep = hash_bucket(id_col, salt) < F.col("keep_below")
    return (
        docs.join(F.broadcast(rates), source_col, "inner")
        .where(keep)
        .select(*docs.columns)
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    by: Sequence[str] | str | None = None,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: ``n`` rows (per group when
    ``by`` is given, global otherwise), where a row's inclusion
    probability is proportional to ``weight_col`` — the
    Efraimidis–Spirakis A-ES scheme: draw u ~ U(0,1] per row, keep the
    top-n by key u^(1/w) (ranked equivalently on ln(u)/w). → input
    columns. Rows with weight ≤ 0 are excluded (they have probability 0
    in the limit anyway).

    u is md5-derived like every sampler here, so the sample is
    deterministic, retry-safe, and oracle-checkable; the rank key is
    rounded to 9 decimals with an id tiebreak so ordering is identical
    across engines (the same rounded-key-plus-tiebreak contract the
    k-means/cosine oracles use).

    Scale: the grouped path ranks with ``row_number() <= n``, which
    Spark rewrites two-phase via InferWindowGroupLimit — map tasks
    pre-trim to their local n before the single group shuffle. The
    global path is a distributed TakeOrdered (per-partition top-n, then
    a driver merge of ≤ n·partitions rows), no full sort anywhere.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    # u in (0,1]; ln(u)/w is monotone in u^(1/w) for w>0
    key = F.round(
        F.log((h + 1.0) / 4294967296.0) / F.col(weight_col), 9
    )
    pos = df.where(F.col(weight_col) > 0).withColumn("__key", key)
    if by is None:
        out = pos.orderBy(F.desc("__key"), F.col(id_col)).limit(n)
    else:
        cols = [by] if isinstance(by, str) else list(by)
        w = Window.partitionBy(*cols).orderBy(F.desc("__key"), F.col(id_col))
        out = pos.withColumn("__rn", F.row_number().over(w)).where(
            F.col("__rn") <= n
        ).drop("__rn")
    return out.drop("__key")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum
    is smaller), chosen deterministically: rank rows inside each stratum
    by md5(salt:id) and keep the lowest ranks. → input columns.

    Unlike rate-based sampling this hits the requested count EXACTLY,
    at the price of one shuffle on the stratum key. The rank filter is
    ``row_number() <= n``, which Spark ≥3.5 rewrites to a two-phase
    WindowGroupLimit — each map task pre-trims to its local n before the
    shuffle, so a mega-stratum never funnels through one task's memory.
    The (hash, id) sort key is total (md5 ties broken by id), so the
    sample is stable under re-partitioning, retries, and row order.
    """
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def negative_pairs(
    docs: DataFrame,
    k: int = 4,
    id_col: str = "doc_id",
    salt: str = "neg",
    n_buckets: int | None = None,
    exclude: DataFrame | None = None,
) -> DataFrame:
    """K deterministic pseudo-random NEGATIVE partners per document —
    the contrastive-training counterpart of the near-dup miners:
    positives come from LSH/SemDeDup, negatives from here, and the
    pairing is md5-derived so re-runs, task retries, and the DuckDB
    oracle all agree row-for-row (no ``rand()``).

    Mechanics: each document probes ``k`` pseudo-random buckets
    (md5(salt:p:j:id) mod B); every document owns one target bucket
    (md5(salt:t:id) mod B); a probe pairs with the bucket member that
    minimizes an (i, j, t)-keyed md5 tiebreak. One bucket-keyed
    shuffle; with the default B = n/8, expected bucket occupancy is 8,
    so candidate volume is ~8·k·n (linear) and the probability a probe
    finds an empty bucket is e⁻⁸ ≈ 3·10⁻⁴ (those pairs are simply
    absent — expected pairs-per-doc is marginally under k).

    ``exclude`` (doc_a, doc_b near-dup pairs, either orientation)
    removes accidental positives BEFORE the tiebreak pick, so excluded
    probes fall back to the next-best bucket member rather than
    dropping the pair. → (doc_id, pair_idx, neg_id)."""
    n = docs.count()
    B = n_buckets if n_buckets is not None else max(1, n // 8)
    i = F.col(id_col).cast("string")

    def bucket_of(prefix: str, *cols: Column) -> Column:
        h = F.md5(F.concat(F.lit(salt + ":" + prefix + ":"), *cols))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % B

    probes = (
        docs.select(F.col(id_col).alias("i"))
        .select("i", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"))
        .withColumn(
            "bucket",
            bucket_of(
                "p",
                F.col("j").cast("string"),
                F.lit(":"),
                F.col("i").cast("string"),
            ),
        )
    )
    targets = docs.select(F.col(id_col).alias("t")).withColumn(
        "bucket", bucket_of("t", F.col("t").cast("string"))
    )
    cand = probes.join(targets, "bucket").where(F.col("t") != F.col("i"))
    if exclude is not None:
        ex = exclude.select(
            F.col("doc_a").alias("i"), F.col("doc_b").alias("t")
        ).unionByName(
            exclude.select(
                F.col("doc_b").alias("i"), F.col("doc_a").alias("t")
            )
        )
        cand = cand.join(ex, ["i", "t"], "left_anti")
    tb = F.md5(
        F.concat(
            F.lit(salt + ":x:"),
            F.col("i").cast("string"),
            F.lit(":"),
            F.col("j").cast("string"),
            F.lit(":"),
            F.col("t").cast("string"),
        )
    )
    return (
        cand.withColumn("tb", tb)
        .groupBy("i", "j")
        .agg(F.min_by("t", "tb").alias("neg_id"))
        .select(
            F.col("i").alias(id_col),
            F.col("j").alias("pair_idx"),
            "neg_id",
        )
    )
