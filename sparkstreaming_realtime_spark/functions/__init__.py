"""Scalar/column function library (SURVEY §2.8).

Everything here is a *Column expression builder* — JVM-side,
whole-stage-codegen friendly. No Python row UDFs in the hot path.
"""

from .datetimes import age_as_of, dt_col, hr_col, ts_to_dt_hr
from .hashing import hash60, oracle_hash60_sql
from .text import (
    match_all_terms,
    ngram_shingles,
    normalize_text,
    tokenize,
)
from .money import money_sum, oracle_money_sum_sql
from .skew import salted_join
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "salted_join",
    "age_as_of",
    "dt_col",
    "hr_col",
    "ts_to_dt_hr",
    "hash60",
    "oracle_hash60_sql",
    "money_sum",
    "oracle_money_sum_sql",
    "match_all_terms",
    "ngram_shingles",
    "normalize_text",
    "tokenize",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
