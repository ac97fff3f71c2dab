"""Vector expression library (beyond-reference scope).

Dense-embedding math over ``array<float>`` columns using higher-order
functions (``zip_with`` / ``aggregate``) — JVM-side, no Python in the
row loop.  Used by the similarity-search and embedding-dedup operators.

At 100 TB these expressions run inside the scan stage (no shuffle), so
brute-force scoring is bandwidth-bound, which is exactly what you want;
the candidate-reduction strategies (LSH bucketing, IVF) live in
operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "l2_norm", "cosine_similarity"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (double accumulator)."""
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ = sqrt(Σ aᵢ²)."""
    return F.sqrt(
        F.aggregate(
            _col(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = a·b / (‖a‖‖b‖); zero-norm inputs → NULL."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(None).cast("double"))
