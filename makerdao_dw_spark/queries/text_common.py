"""Shared text-normalization fragments (same single-definition rule as
tpch_common.py for money math).

The corpus normalization (lowercase → non-alnum → space → collapse
runs → trim → md5) feeds BOTH dedup_exact_normalized and the dedup
stage of corpus_end_to_end_pipeline, on both engines. One definition
each: a tweak here (e.g. widening the keep-class) propagates to every
consumer and its oracle at once — per-file copies could drift while
every per-query gate still passes, silently desynchronizing the two
pipelines' norm_hash.

Spark and DuckDB need separate spellings (DuckDB's regexp_replace
replaces only the first match without the 'g' flag; Spark's replaces
all and hashes via a binary cast), so the pair is defined together
here and unit-pinned equal in tests/test_review_fixes.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DuckDB: md5 of the normalized text (md5() takes VARCHAR directly)
NORM_HASH_DUCK = (
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g')))"
)


def norm_text(col: str = "text") -> Column:
    """Normalized text as a Spark Column (pure codegen string ops)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(col)), "[^a-z0-9 ]", " "), " +", " "
        )
    )


def norm_hash(col: str = "text") -> Column:
    """md5 of the normalized text — Spark twin of NORM_HASH_DUCK."""
    return F.md5(norm_text(col).cast("binary"))


# --- word tokenization (keep-class [a-zA-Z], lowercased) -------------------
# Shared by the n-gram/LM/prefix-filter family; per-file copies of the
# regex or the length floor could desynchronize queries documented as
# one pipeline.

def tokens_arr(col: str = "text", min_len: int = 2) -> Column:
    """Filtered token ARRAY (Spark): lower → non-letters to space →
    split → drop tokens shorter than min_len."""
    return F.filter(
        F.split(F.lower(F.regexp_replace(col, "[^a-zA-Z ]", " ")), " "),
        lambda t: F.length(t) >= min_len,
    )


def tokens_arr_duck(col: str = "text", min_len: int = 2) -> str:
    """DuckDB twin of tokens_arr."""
    return (
        f"list_filter(string_split(lower(regexp_replace({col}, '[^a-zA-Z ]', ' ', 'g')), ' '),"
        f" t -> len(t) >= {min_len})"
    )


def ws_words_arr(col: str = "text") -> Column:
    """Whitespace word ARRAY (Spark): split on single spaces, drop
    empties — the 'word' unit for density/length/fertility metrics
    (vs tokens_arr's letter-class subword stand-in)."""
    return F.filter(F.split(col, " "), lambda x: x != "")


def ws_words_duck(col: str = "text") -> str:
    """DuckDB twin of ws_words_arr."""
    return f"list_filter(string_split({col}, ' '), x -> x != '')"


def bigram_zip_expr(arr: str = "ts", combine: str = "concat(a, ' ', b)") -> str:
    """Spark SQL expr: zip an array with its tail via two slices whose
    length is clamped >= 0 — a <2-token array yields an EMPTY bigram
    list. The index-based sequence(1, size-1) form crashes there:
    Spark's sequence DESCENDS when start > stop ([1,0]), and arr[1] on
    a 1-element array throws INVALID_ARRAY_INDEX under Spark 4's
    default ANSI mode. `combine` sees the pair as (a, b)."""
    return (
        f"zip_with(slice({arr}, 1, greatest(size({arr}) - 1, 0)),"
        f"         slice({arr}, 2, greatest(size({arr}) - 1, 0)),"
        f"         (a, b) -> {combine})"
    )
