"""Boolean normalization — SURVEY.md F16/F17.

The reference's CSVs carry booleans as arbitrary string spellings
('True', '1', '1.0', 'false', '0', 'nan', '') and normalize via lookup
maps with null→False defaulting (streamlit_app.py:85-89,127-139).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["to_bool_strict", "to_bool_or_numeric", "TRUTHY", "FALSY"]

TRUTHY = ("true", "1", "1.0", "yes", "t")
FALSY = ("false", "0", "0.0", "no", "f", "nan", "none", "nat", "")


def _lower(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.lower(F.trim(col.cast("string")))


def to_bool_strict(c: Column | str) -> Column:
    """F16 (IsAccurate, streamlit_app.py:85-89): truthy spellings → True,
    everything else (incl. NULL and unmapped) → False."""
    return F.coalesce(_lower(c).isin(*TRUTHY), F.lit(False))


def to_bool_or_numeric(c: Column | str) -> Column:
    """F17 (Rainfall, streamlit_app.py:127-139): boolean spellings first;
    otherwise numeric fallback (>0 → True); unparseable/NULL → False.

    The reference decides the fallback per-file at runtime (data-dependent
    dtype sniffing); with a static schema the three cases become one
    null-safe expression.
    """
    low = _lower(c)
    col = F.col(c) if isinstance(c, str) else c
    return F.coalesce(
        F.when(low.isin(*TRUTHY), F.lit(True))
        .when(low.isin(*FALSY), F.lit(False))
        .otherwise(col.try_cast("double") > 0),
        F.lit(False),
    )
