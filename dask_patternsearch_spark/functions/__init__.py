"""Reusable column-level functions (the engine's `F`-style surface).

Everything here is a Column-in/Column-out helper (or a pandas-UDF factory)
usable in arbitrary DataFrame pipelines, re-exported from the operator
modules where they are defined and tested:

* ``tokens(col)``            -- whitespace tokenization (trim + split)
* ``shingles(tok_col, n)``   -- distinct word n-grams as strings
* ``cosine(a, b)``           -- row-wise cosine similarity of two
  ``array<float>`` columns (Arrow-vectorized float64 einsum)
* ``hyperplane_bucket_udf(planes)`` -- random-hyperplane LSH signature
  pandas-UDF factory (one matmul per batch)
* ``BPE_PATTERN``            -- GPT-2-style pre-tokenizer regex in the
  Java-regex/RE2 common subset
"""

from ..operators.dedup import (  # noqa: F401
    _cosine as cosine,
    _shingles as shingles,
    _tokens as tokens,
    hyperplane_bucket_udf,
)
from ..operators.text import BPE_PATTERN  # noqa: F401

__all__ = ["tokens", "shingles", "cosine", "hyperplane_bucket_udf", "BPE_PATTERN"]
