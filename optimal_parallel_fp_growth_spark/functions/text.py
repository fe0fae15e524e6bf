"""Text-analysis expression builders (all JVM-side built-ins — these run
inside whole-stage codegen on the scan, no Python in the hot path).

Deterministic by construction so every operator built on them has an
exact DuckDB oracle. Stopword/marker lists are small embedded constants;
at scale they compile into the expression (no join, no broadcast).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny embedded function-word lists for the language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "en", "que", "por"),
}

EN_STOPWORDS: tuple[str, ...] = LANG_MARKERS["en"] + ("this", "with", "as", "on", "at")

# word-ish tokens OR single punctuation — a BPE-ish pre-tokenizer regex
TOKEN_REGEX = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (the reference's split-on-space,
    epfp/EPFP.scala:26)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def regex_token_count(text: Column | str) -> Column:
    """Count of BPE-ish regex tokens (words + punctuation marks)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0)))


def stopword_ratio(toks: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def digit_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    digits = F.length(F.regexp_replace(c, "[^0-9]", ""))
    return digits / F.greatest(F.length(c), F.lit(1))


def marker_hits(toks: Column, lang: str) -> Column:
    """How many tokens are function words of ``lang``."""
    return F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))
