"""Physical-plan introspection — the engine's scale contract as DATA.

``plan_report`` parses a DataFrame's executed plan into counts of the
operators that matter at 100 TB (exchanges, joins by strategy, Python
stages, scans with their pushed filters / read schemas), so scale
properties become assertable one-liners in tests and inspectable
values in notebooks instead of eyeballed ``explain()`` dumps. The
repo's plan-quality tests pin exactly these properties; this helper
makes the same checks available to users of the library.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = ["PlanReport", "plan_report"]


@dataclass
class PlanReport:
    hash_exchanges: int
    range_exchanges: int
    broadcast_exchanges: int
    broadcast_hash_joins: int
    sort_merge_joins: int
    nested_loop_joins: int
    python_stages: int  # ArrowEvalPython / BatchEvalPython / mapInPandas etc.
    # WholeStageCodegen markers appear only in the final/formatted plan
    # string (post-AQE); on the pre-final executed plan this is 0.
    wholestage_codegen_spans: int
    scans: list[dict] = field(default_factory=list)  # {source, pushed, schema}
    raw: str = ""

    @property
    def shuffle_free(self) -> bool:
        return self.hash_exchanges + self.range_exchanges == 0

    @property
    def python_free(self) -> bool:
        return self.python_stages == 0


def plan_report(df: DataFrame) -> PlanReport:
    """Parse ``df``'s EXECUTED plan (post-optimizer, pre-AQE-final)
    into a :class:`PlanReport`."""
    spark = df.sparkSession
    # default field-count truncation (25) cuts FileScan lines before
    # PushedFilters/ReadSchema; raise it just for the render
    prev_fields = spark.conf.get("spark.sql.debug.maxToStringFields", "25")
    prev_meta = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.debug.maxToStringFields", prev_fields)
        spark.conf.set("spark.sql.maxMetadataStringLength", prev_meta)
    scans = []
    for line in plan.splitlines():
        if "FileScan" not in line:
            continue
        # metadata values can still end in a "..." elision with no
        # closing bracket at extreme lengths — stop at either
        m_loc = re.search(r"Location: \S+\[(.*?)(?:\]|\.\.\.)", line)
        m_push = re.search(r"PushedFilters: \[(.*?)(?:\]|\.\.\.)", line)
        m_schema = re.search(r"ReadSchema: struct<(.*?)(?:>|\.\.\.)", line)
        scans.append(
            {
                "source": m_loc.group(1) if m_loc else "",
                "pushed": [
                    p.strip() for p in m_push.group(1).split(",") if p.strip()
                ]
                if m_push
                else [],
                "schema": [
                    c.split(":")[0].strip()
                    for c in m_schema.group(1).split(",")
                    if c.strip()
                ]
                if m_schema
                else [],
            }
        )
    return PlanReport(
        hash_exchanges=len(re.findall(r"Exchange hashpartitioning", plan)),
        range_exchanges=len(re.findall(r"Exchange rangepartitioning", plan)),
        broadcast_exchanges=len(re.findall(r"BroadcastExchange", plan)),
        broadcast_hash_joins=len(re.findall(r"BroadcastHashJoin", plan)),
        sort_merge_joins=len(re.findall(r"SortMergeJoin", plan)),
        nested_loop_joins=len(re.findall(r"NestedLoopJoin", plan)),
        python_stages=len(
            re.findall(
                r"ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas"
                r"|MapInPandas|FlatMapsGroupsWithStateInPandas",
                plan,
            )
        ),
        wholestage_codegen_spans=len(re.findall(r"WholeStageCodegen", plan)),
        scans=scans,
        raw=plan,
    )
