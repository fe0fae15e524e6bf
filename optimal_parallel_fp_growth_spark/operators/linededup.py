"""Line-level (boilerplate) deduplication — the CCNet/C4 curation
stage the document-level dedup family (operators/dedup.py) doesn't
cover: a line that recurs across many documents (navigation chrome,
cookie banners, license headers) is removed from EVERY document while
the documents themselves survive.

No reference counterpart (the reference mines itemsets only); built as
pure DataFrame composition:

1. explode documents into (doc_id, pos, line);
2. count DISTINCT documents per line — keyed on ``md5(line)`` so the
   count/join shuffles ship a 32-char key instead of arbitrarily long
   boilerplate paragraphs (the dominant payload at corpus scale);
   within-document repetition deliberately does not count (a chorus
   repeated in one lyric is content, not boilerplate);
3. anti-join lines against the ≥ ``min_docs`` blacklist;
4. reassemble surviving lines in position order.

Scale shape: two aggregation shuffles on the line hash (the distinct
and the count — map-side combined) + one anti-join on the same key
(exchange-reusable) + one reassembly shuffle on doc_id. The blacklist
is NOT force-broadcast: at web scale the repeated-line set can exceed
broadcast limits, and the anti-join key equals the count's shuffle key
anyway. Everything is built-in expressions — no Python in the path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINE_MIN_DOCS = 2


def dedup_lines_from(
    lines: DataFrame,
    min_docs: int = LINE_MIN_DOCS,
    sep: str = "\n",
    id_col: str = "doc_id",
    pos_col: str = "pos",
    line_col: str = "line",
) -> DataFrame:
    """Core on pre-split lines (doc_id, pos, line): drop every line
    whose text occurs in ≥ ``min_docs`` distinct documents, rejoin the
    rest with ``sep`` in ``pos`` order.
    → (doc_id, clean_text, n_lines, n_removed); documents whose every
    line was boilerplate survive with ``clean_text = ''``."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    base = lines.select(
        F.col(id_col).alias("doc_id"),
        F.col(pos_col).alias("pos"),
        F.col(line_col).alias("line"),
        F.md5(line_col).alias("lh"),
    )
    blacklist = (
        base.select("lh", "doc_id")
        .distinct()
        .groupBy("lh")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("lh")
    )
    kept = base.join(blacklist, "lh", "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = base.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return totals.join(reassembled, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_lines",
        (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
    )


def remove_repeated_lines(
    docs: DataFrame,
    min_docs: int = LINE_MIN_DOCS,
    text_col: str = "text",
    sep: str = "\n",
    id_col: str = "doc_id",
) -> DataFrame:
    """Text-in/text-out wrapper: split ``text_col`` on the LITERAL
    separator, dedup lines corpus-wide, reassemble.
    → (doc_id, clean_text, n_lines, n_removed)."""
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias(
            "pos", "line"
        ),
    )
    return dedup_lines_from(lines, min_docs, sep, "doc_id", "pos", "line")
