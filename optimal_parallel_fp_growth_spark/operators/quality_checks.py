"""Declarative data-quality constraint suite (Deequ-style) — the
validation pass a training-data pipeline runs before a 100 TB corpus is
allowed into tokenization.

``check_suite`` evaluates a list of :class:`Check` constraints over a
DataFrame in **one single-pass aggregation**: every constraint compiles
to one aggregate expression, all of them land in one ``df.agg(...)``
(Catalyst plans partial+final HashAggregate — one scan, map-side
combine, a single one-row shuffle regardless of how many constraints are
attached), and the one-row result is unpivoted driver-side into the long
``(check, observed, passed)`` verdict table. No per-constraint jobs, no
second scan — adding a constraint is free at scale.

Reference scope note: the reference engine has no validation surface;
this extends the pipeline the same way its loaders assume clean input
(epfp/EPFP.scala:23-27 tokenizes blindly). Null/shape guards that the
reference's ``fit`` does perform (``filter(_ != null)``,
epfp/FPGrowth.scala:63) are the ``completeness`` constraint here.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named constraint: ``observed`` is an aggregate expression over
    the table; ``passed`` is a scalar predicate on the observed value."""

    name: str
    observed: Column
    threshold: float
    op: str = ">="  # observed <op> threshold  →  passed

    def passed(self, observed: Column) -> Column:
        if self.op == ">=":
            return observed >= self.threshold
        if self.op == "<=":
            return observed <= self.threshold
        if self.op == "==":
            return observed == self.threshold
        raise ValueError(f"unsupported op {self.op!r}")


def completeness(col: str) -> Column:
    """Fraction of rows with a non-null value — Deequ's Completeness."""
    return F.avg(F.col(col).isNotNull().cast("double"))


def uniqueness(col: str) -> Column:
    """distinct/count — 1.0 iff the column is a key (exact, one pass:
    count_distinct plans as a two-phase distinct aggregate inside the
    same job, not a separate scan)."""
    return F.count_distinct(F.col(col)) / F.count(F.col(col))


def membership(col: str, allowed: list[str]) -> Column:
    """Fraction of non-null values inside the accepted set."""
    return F.avg(F.col(col).isin(allowed).cast("double"))


def consistency(predicate: Column) -> Column:
    """Fraction of rows satisfying an arbitrary row predicate."""
    return F.avg(predicate.cast("double"))


def min_of(col: str) -> Column:
    return F.min(F.col(col)).cast("double")


def max_of(col: str) -> Column:
    return F.max(F.col(col)).cast("double")


def check_suite(df: DataFrame, checks: list[Check]) -> DataFrame:
    """→ (check string, observed double, passed boolean), one row per
    constraint, computed in one aggregation job over one scan."""
    if not checks:
        raise ValueError("check_suite needs at least one Check")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")
    agg = df.agg(
        *[
            F.round(c.observed, 9).cast("double").alias(c.name)
            for c in checks
        ]
    )
    # Unpivot the one-row wide result into the long verdict table with a
    # stack() projection — still zero extra scans.
    pairs = ", ".join(f"'{c.name}', `{c.name}`" for c in checks)
    long = agg.select(
        F.expr(f"stack({len(checks)}, {pairs}) AS (check, observed)")
    )
    verdict = F.lit(False)
    for c in checks:
        verdict = F.when(
            F.col("check") == c.name, c.passed(F.col("observed"))
        ).otherwise(verdict)
    return long.select("check", "observed", verdict.alias("passed"))


ACCEPTED_LANGS = ["de", "en", "es", "fr", "zh"]


def documents_quality_suite(docs: DataFrame) -> DataFrame:
    """The corpus gate used by the ``dq_documents`` query: key integrity,
    payload completeness, metadata membership, and the n_chars ==
    length(text) consistency invariant the downstream token-count ops
    rely on."""
    return check_suite(
        docs,
        [
            Check("text_complete", completeness("text"), 1.0, "=="),
            Check("doc_id_unique", uniqueness("doc_id"), 1.0, "=="),
            Check("lang_accepted", membership("lang", ACCEPTED_LANGS), 1.0, "=="),
            Check(
                "n_chars_consistent",
                consistency(F.col("n_chars") == F.length("text")),
                0.99,
            ),
            Check("source_complete", completeness("source"), 1.0, "=="),
            Check("min_chars", min_of("n_chars"), 1.0, ">="),
        ],
    )


EVENT_TYPES_ACCEPTED = ["click", "error", "purchase", "signup", "view"]


def events_quality_suite(events: DataFrame) -> DataFrame:
    """The event-stream gate (``dq_events`` query): key integrity,
    timestamp/payload completeness, type membership, the positive-value
    invariant the revenue aggregates rely on, and an event-time sanity
    window (a clock-skewed producer shows up here before it poisons
    watermarks downstream)."""
    return check_suite(
        events,
        [
            Check("event_id_unique", uniqueness("event_id"), 1.0, "=="),
            Check("ts_complete", completeness("ts"), 1.0, "=="),
            Check("user_complete", completeness("user_id"), 1.0, "=="),
            Check(
                "type_accepted",
                membership("event_type", EVENT_TYPES_ACCEPTED),
                1.0,
                "==",
            ),
            Check("value_positive", consistency(F.col("value") > 0), 1.0, "=="),
            Check(
                "ts_in_window",
                consistency(F.year("ts").between(2020, 2030)),
                1.0,
                "==",
            ),
        ],
    )
