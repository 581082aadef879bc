"""Column-expression builders for text/dedup/similarity operators.

Everything here is pure Catalyst expression composition (JVM-side,
whole-stage-codegen friendly) — no Python UDFs. Hashing is md5-based so
the DuckDB oracles can reproduce signatures bit-for-bit; at production
scale you'd swap md5 for xxhash64 (cheaper) without changing shapes.

Scale notes: all per-document work (shingling, minhash) is embarrassingly
parallel; the only shuffles in the dedup pipeline are the LSH band
group-join (keyed by 128-bit band hash — uniform, skew-free) and the
candidate-pair join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deliberately tiny english stopword list — deterministic, oracle-friendly.
STOPWORDS = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")


def words(text: Column) -> Column:
    """Whitespace tokens (corpus is single-space separated)."""
    return F.split(text, " ")


def shingles_expr(text_col: str, n: int = 3) -> Column:
    """Word n-gram shingles of `text_col` as array<string>.

    Out-of-range element_at -> NULL, and NULL || x propagates, so short
    documents degrade to fewer (never broken) shingles.
    """
    parts = " || ' ' || ".join(f"try_element_at(split({text_col}, ' '), i + {k})" for k in range(n))
    return F.expr(
        f"filter(transform(sequence(1, greatest(size(split({text_col}, ' ')) - {n - 1}, 1)), "
        f"i -> {parts}), s -> s is not null)"
    )


def shingles_sql_duckdb(text_col: str, n: int = 3) -> str:
    """DuckDB twin of shingles_expr (|| propagates NULL, unlike concat)."""
    parts = " || ' ' || ".join(f"string_split({text_col}, ' ')[i + {k}]" for k in range(n))
    return (
        f"list_filter(list_transform(generate_series(1, greatest(len(string_split({text_col}, ' ')) - {n - 1}, 1)), "
        f"i -> {parts}), s -> s IS NOT NULL)"
    )


def minhash_signature(shingle_col: str, num_hashes: int = 16) -> Column:
    """MinHash signature: per seed, min over shingles of md5('seed{i}:'||s)[:16].

    16 lowercase hex chars order lexicographically exactly like the 64-bit
    value they encode, so `array_min` IS min-hash.
    """
    sigs = ", ".join(
        f"array_min(transform({shingle_col}, s -> substring(md5('seed{i}:' || s), 1, 16)))"
        for i in range(num_hashes)
    )
    return F.expr(f"array({sigs})")


def minhash_signature_sql_duckdb(shingle_expr: str, num_hashes: int = 16) -> str:
    sigs = ", ".join(
        f"list_min(list_transform({shingle_expr}, s -> substr(md5('seed{i}:' || s), 1, 16)))"
        for i in range(num_hashes)
    )
    return f"[{sigs}]"


def band_hashes(sig_col: str, bands: int = 4, rows: int = 4) -> Column:
    """LSH banding: hash each contiguous r-slice of the signature."""
    exprs = ", ".join(
        f"named_struct('band', {b}, 'h', md5(array_join(slice({sig_col}, {b * rows + 1}, {rows}), '|')))"
        for b in range(bands)
    )
    return F.expr(f"array({exprs})")


def band_hashes_sql_duckdb(sig_col: str, bands: int = 4, rows: int = 4) -> str:
    exprs = ", ".join(
        f"{{'band': {b}, 'h': md5(array_to_string({sig_col}[{b * rows + 1}:{b * rows + rows}], '|'))}}"
        for b in range(bands)
    )
    return f"[{exprs}]"
