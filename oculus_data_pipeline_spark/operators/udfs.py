"""Arrow-vectorized pandas UDFs — the sanctioned slow path.

NOTE: no ``from __future__ import annotations`` here — PySpark's
pandas_udf infers the eval type from *resolved* type hints, and
stringified annotations break that inference. Functions stay
UNdecorated at module level: a module-level @pandas_udf runs the UDF
construction inside the Python *worker* at unpickle-import time,
where no SparkSession exists. Callers wrap with F.pandas_udf(...).

These exist to demonstrate and test the UDF surface; hot paths use
built-in expressions (see operators/ docstrings).
"""

import pandas as pd


def n_tokens_fn(text: pd.Series) -> pd.Series:
    """Whitespace token count, same semantics as the built-in
    size(split(normalize_term(text))) expression."""
    return (
        text.str.replace(r"\s+", " ", regex=True)
        .str.strip()
        .str.lower()
        .str.split(" ")
        .str.len()
    )


def packed_score_fn(n_chars: pd.Series, n_tokens: pd.Series) -> pd.Series:
    """Integer feature combiner (2·chars + tokens) — integer-only so
    the oracle comparison is exact."""
    return n_chars * 2 + n_tokens


def top2_per_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas grouped-map: top-2 rows by (value desc, event_id)."""
    out = pdf.sort_values(["value", "event_id"], ascending=[False, True]).head(2)
    return out[["user_id", "event_id", "value"]]
