"""Dense-vector scalar functions over array<float|double> columns.

The reference materializes embeddings as an L2-normalized N×384
float32 matrix (code/embeddings.py:82-87,119). Here vectors are just
an ArrayType column and every op is a higher-order-function Column
expression — JVM-side, codegen-eligible, no Python, which is what
makes brute-force cosine top-k viable at cluster scale (the arrays
never cross the JVM/Python boundary).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Elementwise product then sum, accumulated in double."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(
        _c(a), F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    ))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL if either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize (reference: normalize_embeddings=True,
    code/embeddings.py:119). Zero vector → NULL elements avoided by
    guarding the norm."""
    norm = l2_norm(a)
    return F.when(norm > 0, F.transform(_c(a), lambda x: x.cast("double") / norm))
