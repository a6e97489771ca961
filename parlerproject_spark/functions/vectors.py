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


def quant_scale(a: Column | str) -> Column:
    """Per-vector symmetric int8 quantization scale: max|x| / 127
    (0 for the zero vector — its quantized form is all zeros)."""
    amax = F.array_max(F.transform(_c(a), lambda x: F.abs(x.cast("double"))))
    return F.when(amax > 0, amax / 127.0).otherwise(F.lit(0.0))


def quantize_int8(a: Column | str, scale: Column | str) -> Column:
    """x → round(x/scale) as int8 in [-127, 127] (symmetric, no -128
    so negation is closed). HALF_UP rounding on both engines. The 4×
    storage cut is the point at 100 TB: a 384-d float32 embedding
    column is ~1.5 KB/row; int8 + one double scale is ~392 B."""
    s = _c(scale)
    return F.when(s > 0, F.transform(
        _c(a), lambda x: F.round(x.cast("double") / s, 0).cast("int")))


def dequantize(q: Column | str, scale: Column | str) -> Column:
    """int8 vector → approximate float vector (q_i * scale)."""
    s = _c(scale)
    return F.transform(_c(q), lambda x: x.cast("double") * s)
