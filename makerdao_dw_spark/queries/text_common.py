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
