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

    The words array is let-bound (split runs once per row, not per
    shingle). Out-of-range try_element_at -> NULL, and NULL || x
    propagates, so short documents degrade to fewer (never broken)
    shingles.
    """
    parts = " || ' ' || ".join(f"try_element_at({{x}}, i + {k})" for k in range(n))
    return F.expr(
        let_bound(
            f"split({text_col}, ' ')",
            f"filter(transform(sequence(1, greatest(size({{x}}) - {n - 1}, 1)), "
            f"i -> {parts}), s -> s is not null)",
        )
    )


def shingles_sql_duckdb(text_col: str, n: int = 3) -> str:
    """DuckDB twin of shingles_expr (|| propagates NULL, unlike concat)."""
    parts = " || ' ' || ".join(f"string_split({text_col}, ' ')[i + {k}]" for k in range(n))
    return (
        f"list_filter(list_transform(generate_series(1, greatest(len(string_split({text_col}, ' ')) - {n - 1}, 1)), "
        f"i -> {parts}), s -> s IS NOT NULL)"
    )


_LET_COUNTER = [0]


def let_bound(value_expr: str, body_template: str) -> str:
    """Emulate a let-binding in Spark SQL expressions.

    `element_at(transform(array(V), x -> BODY(x)), 1)` evaluates V exactly
    once per row. Without this, Catalyst's projection collapse inlines V
    into every reference site, and non-codegen higher-order lambdas
    re-evaluate outer subexpressions per element — turning O(n) pipelines
    into O(n^2). (Observed: 4 band exprs x 16 minhash exprs recomputed the
    shingle+md5 work ~64x.) Lambda variables are uniquely named so
    let-bound expressions can nest without shadowing.
    """
    _LET_COUNTER[0] += 1
    var = f"__let{_LET_COUNTER[0]}"
    return f"element_at(transform(array({value_expr}), {var} -> {body_template.format(x=var)}), 1)"


def minhash_fold_expr(shingles_sql: str, num_hashes: int = 16) -> str:
    """MinHash signature in ONE pass over the shingles: fold with a
    16-wide min-accumulator, computing the per-seed md5s per shingle.

    16 lowercase hex chars order lexicographically exactly like the 64-bit
    value they encode, so least() IS min-hash. 'z' sentinel sorts after
    every hex digest.
    """
    return (
        f"aggregate({shingles_sql}, array_repeat('zzzzzzzzzzzzzzzz', {num_hashes}), "
        f"(acc, s) -> zip_with(acc, transform(sequence(0, {num_hashes - 1}), "
        f"i -> substring(md5(concat('seed', cast(i as string), ':', s)), 1, 16)), "
        f"(a, h) -> least(a, h)))"
    )


def minhash_signature(shingle_col: str, num_hashes: int = 16) -> Column:
    """MinHash signature column (single-pass fold)."""
    return F.expr(minhash_fold_expr(shingle_col, num_hashes))


def minhash_signature_sql_duckdb(shingle_expr: str, num_hashes: int = 16) -> str:
    sigs = ", ".join(
        f"list_min(list_transform({shingle_expr}, s -> substr(md5('seed{i}:' || s), 1, 16)))"
        for i in range(num_hashes)
    )
    return f"[{sigs}]"


def band_hashes(sig_expr: str, bands: int = 4, rows: int = 4) -> Column:
    """LSH banding: hash each contiguous r-slice of the signature.

    `sig_expr` may be an arbitrarily expensive expression — it is let-bound
    so it evaluates once per row even though every band references it.
    """
    body = ", ".join(
        f"named_struct('band', {b}, 'h', md5(array_join(slice({{x}}, {b * rows + 1}, {rows}), '|')))"
        for b in range(bands)
    )
    return F.expr(let_bound(sig_expr, f"array({body})"))


def band_hashes_sql_duckdb(sig_col: str, bands: int = 4, rows: int = 4) -> str:
    exprs = ", ".join(
        f"{{'band': {b}, 'h': md5(array_to_string({sig_col}[{b * rows + 1}:{b * rows + rows}], '|'))}}"
        for b in range(bands)
    )
    return f"[{exprs}]"
