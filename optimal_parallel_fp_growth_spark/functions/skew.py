"""Skew-mitigation primitives (100 TB stance, SURVEY §4 O6 analog).

AQE's skew-join splitting handles *join* skew at runtime; *aggregation*
skew on a hot key still funnels every row of that key through one
reducer. ``salted_agg`` is the classic two-phase fix: pre-aggregate on
(key, salt) so the hot key's rows spread over ``salt_buckets`` reducers,
then combine the partials. The salt is deterministic (hash of a
discriminator column, not rand()) so runs are reproducible and tests /
oracles stay exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(discriminator: Column | str, buckets: int) -> Column:
    c = F.col(discriminator) if isinstance(discriminator, str) else discriminator
    return F.pmod(F.xxhash64(c), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    discriminator: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → one of 'count'/'sum:<col>'/'min:<col>'/
    'max:<col>' (the decomposable aggregates; avg = sum/count at the call
    site). Phase 1 groups by (keys, salt) — partial per bucket; phase 2
    groups by keys — combines ``salt_buckets`` partials per key.
    """
    salted = df.withColumn("__salt", deterministic_salt(discriminator, salt_buckets))

    def phase1(spec: str) -> Column:
        if spec == "count":
            return F.count("*")
        op, col = spec.split(":", 1)
        return getattr(F, op)(col)

    combine = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    p1 = salted.groupBy(*key_cols, "__salt").agg(
        *[phase1(spec).alias(out) for out, spec in aggs.items()]
    )
    p2 = p1.groupBy(*key_cols).agg(
        *[
            combine[spec.split(":", 1)[0]](out).alias(out)
            for out, spec in aggs.items()
        ]
    )
    return p2


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: a hot key on the BIG side funnels all its
    rows through one reducer in a plain shuffle join. Salt the big side
    (deterministic hash of the whole row's discriminator — here a
    monotonic id is unnecessary: the join key + xxhash64 of the row's
    partition offset would not be deterministic, so the salt hashes the
    big row's OTHER columns via ``xxhash64(struct(*))``), and replicate
    the small side ``salt_buckets``× so every (key, salt) pair finds
    its match. The hot key's rows then spread over ``salt_buckets``
    reducers at the cost of a ``salt_buckets``× small-side blowup —
    cheap when the small side is dimension-sized but past the broadcast
    ceiling (the broadcast join needs no salting at all; AQE's runtime
    skew split handles sort-merge skew when statistics see it — this is
    the explicit, plan-stable form).

    Supports the big-preserving joins: ``inner``, ``left``, and (round
    12, VERDICT r11 task #7 — the shapes the dedup/decontamination
    family needs, e.g. a skewed contamination key) ``left_semi`` /
    ``left_anti``. Semi/anti need no small-side column survival, so
    the rewrite is the same replicate-small-side trick: a big row's
    (key, salt) pair finds its key's replica in exactly its salt
    bucket, so existence (semi) and non-existence (anti) match the
    plain join per row. Output equals the plain join in all four
    modes (salting is join-key-complete by construction)."""
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}"
        )
    if how in ("left_semi", "left_anti"):
        # existence is all that matters: replicate only the key column
        small = small.select(on)
    other = [c for c in big.columns if c != on]
    salt = F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in other])) if other else F.lit(0),
        F.lit(salt_buckets),
    )
    big_s = big.withColumn("__salt", salt.cast("int"))
    small_s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt_buckets).select(
                F.col("id").cast("int").alias("__salt")
            )
        )
    )
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")
