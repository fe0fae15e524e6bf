"""HTML main-content extraction (round 7) — the first step of every
web-corpus training pipeline (the jusText/trafilatura role): strip a
page to its article text by dropping boilerplate blocks.

Reference scope: the reference engine (Radeity/optimal-parallel-fp-growth)
has no text-extraction surface; this module belongs to the engine's
LLM-data-pipeline north star alongside dedup/quality (SURVEY.md).

Design
------
* ``attach_html`` builds a deterministic, spec-shaped page per doc —
  header nav, sidebar link list, footer (all link-dense boilerplate)
  around the doc's text as the single ``<article>`` paragraph, entity-
  escaped — ENTIRELY in JVM codegen (``format_string`` + ``replace``),
  so the builder side adds zero Python cost and the DuckDB oracle can
  restate it (or its inverse) in SQL.
* ``extract_main_text`` is the REAL extractor: stdlib ``HTMLParser``
  walk (no lxml/bs4 in this container) collecting text and link-text
  lengths per block element, then the classic link-density gate —
  a block survives when ``link_chars/chars <= max_link_density`` and
  ``chars >= min_chars``. Script/style subtrees are dropped wholesale.
  Runs as an Arrow-batched ``mapInPandas`` (compute-bound → spread
  across cores like the media codecs).

Scale: both stages are shuffle-free row-wise maps; the extractor is
embarrassingly parallel and linear in page bytes. At 100 TB the only
exchange is the widen-only codec spread (see
``operators/multimodal.py::_spread_for_codec``).
"""

from __future__ import annotations

from collections.abc import Iterator
from html import unescape
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# elements that start a new text block; everything else is inline
_BLOCK_TAGS = {
    "p", "div", "article", "section", "li", "td", "th", "h1", "h2",
    "h3", "h4", "h5", "h6", "header", "footer", "nav", "aside",
    "blockquote", "pre", "title",
}
# head is metadata, not content — real extractors (trafilatura,
# jusText) work the body; script/style subtrees never contribute text
_DROP_SUBTREE = {"head", "script", "style", "noscript", "svg", "template"}


def attach_html(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, html: string): a deterministic page wrapping the
    doc's entity-escaped text as the lone article paragraph, inside
    link-dense header/sidebar/footer boilerplate. Pure codegen — no
    Python, no shuffle."""
    esc = F.col(text_col)
    for raw, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(raw), F.lit(ent))
    page = F.format_string(
        "<html><head><title>Doc %s</title></head><body>"
        "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> "
        "<a href=\"/contact\">Contact</a></nav>"
        "<aside><ul>"
        "<li><a href=\"/t/%s\">tag-%s</a></li>"
        "<li><a href=\"/u/%s\">user-%s</a></li>"
        "</ul></aside>"
        "<article><p>%s</p></article>"
        "<footer><a href=\"/terms\">Terms</a> <a href=\"/privacy\">"
        "Privacy</a> (c) example</footer>"
        "</body></html>",
        F.col("doc_id"),
        F.col("doc_id"), F.col("doc_id"),
        F.col("doc_id"), F.col("doc_id"),
        esc,
    )
    return docs.select("doc_id", page.alias("html"))


class _BlockCollector(HTMLParser):
    """Collect (text_chars, link_chars, text) per block element."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._cur: dict | None = None
        self._link_depth = 0
        self._drop_depth = 0

    def _flush(self) -> None:
        if self._cur and self._cur["text"].strip():
            self._cur["text"] = " ".join(self._cur["text"].split())
            self.blocks.append(self._cur)
        self._cur = None

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_SUBTREE:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            self._cur = {"tag": tag, "text": "", "chars": 0, "link_chars": 0}
        if tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag):
        if tag in _DROP_SUBTREE:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth:
            return
        if self._cur is None:
            if not data.strip():
                return
            self._cur = {"tag": "", "text": "", "chars": 0, "link_chars": 0}
        self._cur["text"] += data
        n = len(data)
        self._cur["chars"] += n
        if self._link_depth:
            self._cur["link_chars"] += n

    def close(self):
        super().close()
        self._flush()


def extract_page_blocks(html: str) -> list[dict]:
    """Parse one page into its text blocks (local helper, unit-tested
    directly): ``[{"tag", "text", "chars", "link_chars"}, ...]``."""
    c = _BlockCollector()
    c.feed(unescape_entities_guard(html))
    c.close()
    return c.blocks


def unescape_entities_guard(html: str) -> str:
    # HTMLParser(convert_charrefs=True) already unescapes character
    # references in data; pages are fed through verbatim. The hook
    # exists so a future sanitizer has one place to live.
    return html


EXTRACT_SCHEMA = (
    "doc_id long, n_blocks int, n_kept int, main_text string, "
    "n_chars int, link_density double"
)


def extract_main_text(
    with_html: DataFrame,
    html_col: str = "html",
    max_link_density: float = 0.33,
    min_chars: int = 8,
) -> DataFrame:
    """REAL boilerplate removal: per doc, parse the page into blocks,
    keep blocks whose link density and length pass the gate, join
    survivors with a blank line. → (doc_id, n_blocks, n_kept,
    main_text, n_chars, link_density) where link_density is the
    page-level linked-char fraction (boilerplate signal for DQ
    dashboards)."""
    if not 0.0 <= max_link_density <= 1.0:
        raise ValueError("max_link_density must be in [0, 1]")

    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        _spread_for_codec,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, html in zip(pdf["doc_id"], pdf[html_col]):
                blocks = extract_page_blocks(html)
                kept = [
                    b
                    for b in blocks
                    if b["chars"] >= min_chars
                    and (
                        b["link_chars"] / b["chars"] <= max_link_density
                        if b["chars"]
                        else False
                    )
                ]
                text = "\n\n".join(b["text"] for b in kept)
                tot = sum(b["chars"] for b in blocks)
                link = sum(b["link_chars"] for b in blocks)
                rows.append(
                    (
                        doc_id,
                        len(blocks),
                        len(kept),
                        text,
                        len(text),
                        round(link / tot, 6) if tot else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_blocks", "n_kept", "main_text",
                    "n_chars", "link_density",
                ],
            )

    return _spread_for_codec(
        with_html.select("doc_id", html_col)
    ).mapInPandas(run, EXTRACT_SCHEMA)
