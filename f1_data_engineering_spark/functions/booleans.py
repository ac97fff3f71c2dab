"""Boolean normalization — SURVEY.md F16/F17.

The reference's CSVs carry booleans as arbitrary string spellings
('True', '1', '1.0', 'false', '0', 'nan', '') and normalize via lookup
maps with null→False defaulting (streamlit_app.py:85-89,127-139).

Parity note: the maps below are the REFERENCE'S EXACT spellings — the
dashboard maps (streamlit_app.py:85-89,127-139) treat anything else
(including 'yes'/'t') as unmapped → False.  The lenient superset lives
in :data:`TRUTHY_LENIENT` / :func:`to_bool_lenient` and is explicitly
NOT the parity path.

Divergence note (documented): the reference's Rainfall fallback
(streamlit_app.py:127-139) decides bool-vs-numeric PER COLUMN at
runtime (if the bool map produced no True/False for the whole column,
retry the column as numeric); :func:`to_bool_or_numeric` applies the
numeric fallback PER ROW.  On homogeneous columns (the reference's
actual data) the results are identical; on mixed columns like
['true','0.5'] the reference would pick one interpretation for the
whole column while this engine resolves each row — per-row is the only
well-defined semantics for a distributed engine with a static schema.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "to_bool_strict",
    "to_bool_or_numeric",
    "to_bool_lenient",
    "TRUTHY",
    "FALSY",
    "TRUTHY_LENIENT",
    "FALSY_LENIENT",
]

#: Reference-exact spellings (streamlit_app.py:85-89,127-139).
TRUTHY = ("true", "1", "1.0")
FALSY = ("false", "0", "0.0", "nan", "none", "")

#: Lenient supersets — extra engine surface, not reference parity.
TRUTHY_LENIENT = TRUTHY + ("yes", "t", "y")
FALSY_LENIENT = FALSY + ("no", "f", "n", "nat")


def _lower(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.lower(F.trim(col.cast("string")))


def to_bool_strict(c: Column | str) -> Column:
    """F16 (IsAccurate, streamlit_app.py:85-89): the reference's truthy
    spellings → True, everything else (incl. NULL and unmapped) → False."""
    return F.coalesce(_lower(c).isin(*TRUTHY), F.lit(False))


def to_bool_or_numeric(c: Column | str) -> Column:
    """F17 (Rainfall, streamlit_app.py:127-139): reference boolean
    spellings first; otherwise numeric fallback (>0 → True);
    unparseable/NULL → False.  Per-row fallback — see the module
    docstring for the documented per-column divergence."""
    low = _lower(c)
    col = F.col(c) if isinstance(c, str) else c
    return F.coalesce(
        F.when(low.isin(*TRUTHY), F.lit(True))
        .when(low.isin(*FALSY), F.lit(False))
        .otherwise(col.try_cast("double") > 0),
        F.lit(False),
    )


def to_bool_lenient(c: Column | str) -> Column:
    """Lenient variant (beyond-reference): accepts yes/no, t/f, y/n."""
    return F.coalesce(_lower(c).isin(*TRUTHY_LENIENT), F.lit(False))
