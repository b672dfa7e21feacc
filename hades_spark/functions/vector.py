"""Vector math over ``array<float>`` columns.

Two tiers, mirroring SURVEY §2.8 F5:
- **JVM column expressions** (``F.zip_with`` + ``F.aggregate``) — stay in
  whole-stage codegen, exact oracle parity with DuckDB's list functions;
  right for one-off scores and small k.
- **pandas/Arrow batch matmul** (see operators/similarity.py) — the hot path
  for many-query / many-candidate scoring, numpy BLAS per batch
  (``backend.py:288-344`` brute-force semantics restated vectorized).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot_col(a: Column, b: Column) -> Column:
    """Float64 dot product of two array<float> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either side has zero norm."""
    denom = norm_col(a) * norm_col(b)
    return F.when(denom > 0, dot_col(a, b) / denom).otherwise(F.lit(0.0))


def link_score_col(a: Column, b: Column) -> Column:
    """Dot-product link score squashed with a sigmoid — the reference's
    link-prediction scoring (``core/graph/model.py:139-149``:
    ``sigmoid(src · dst)``), as a JVM column expression."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-dot_col(a, b)))


def weighted_blend_col(a: Column, b: Column, alpha: float = 0.7,
                       cast_float: bool = True) -> Column:
    """alpha * a + (1-alpha) * b element-wise; ``cast_float=False`` keeps
    float64 components (oracle parity for scale-invariant consumers)."""
    def blend(x, y):
        v = (F.lit(alpha) * x.cast("double")
             + F.lit(1.0 - alpha) * y.cast("double"))
        return v.cast("float") if cast_float else v

    return F.zip_with(a, b, blend)


def late_fusion_col(text_vec: Column, struct_vec: Column,
                    alpha: float = 0.7) -> Column:
    """Weighted late-fusion blend of two L2-normalized vectors
    (``embedders_jina.py:441-465``): out = l2_normalize(alpha * a +
    (1-alpha) * b). Element-wise zip + renormalize, all JVM-side."""
    return l2_normalize_col(weighted_blend_col(text_vec, struct_vec, alpha))


def l2_normalize_col(a: Column) -> Column:
    n = norm_col(a)
    return F.when(
        n > 0, F.transform(a, lambda x: (x.cast("double") / n).cast("float"))
    ).otherwise(a)
