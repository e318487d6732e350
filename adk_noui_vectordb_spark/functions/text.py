"""Text-analysis expressions (tokenization, quality stats) — pure Catalyst.

The reference's text surface is rule-based line scanning (reference:
coding_agent/tools/lsp_tool.py:122-278 — length thresholds, trailing
whitespace, substring predicates) plus whitespace-ish chunking (reference:
coding_agent/tools/indexing_agent.py:290-312). All of it is expressible as
built-in string functions, so the hot path stays inside whole-stage codegen —
no Python per row, which is what makes these usable over a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic small stopword list (shared verbatim with the DuckDB oracles).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# BPE-ish tokenizer regex: word runs, digit runs, single non-space symbols.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def whitespace_tokens(text: Column) -> Column:
    return F.split(text, " ")


def word_count(text: Column) -> Column:
    return F.size(whitespace_tokens(text))


def regex_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(TOKEN_REGEX))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    n = F.length(text)
    stripped = F.regexp_replace(text, "[^A-Za-z0-9 ]", "")
    return F.when(n > 0, (n - F.length(stripped)) / n.cast("double")).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(text: Column) -> Column:
    words = whitespace_tokens(F.lower(text))
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    n = F.size(words)
    return F.when(n > 0, n_stop / n.cast("double")).otherwise(F.lit(0.0))
