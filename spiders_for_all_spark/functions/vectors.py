"""Vector math over ``array<float>`` embedding columns — pure Catalyst.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic JVM-side; everything is
cast to double before summation so results are bit-identical to the DuckDB
oracle (which computes list arithmetic in double).  Used by the similarity
and embedding-dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    """Rounded cosine for oracle-hash stability across engines."""
    return F.round(cosine(a, b), digits)


def hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Deterministic ±1 random-hyperplane component sign via md5.

    Sign-random-projection LSH (Charikar, STOC'02) with hyperplane entries
    in {-1,+1} derived from md5("p-d") — reproducible in any engine with
    md5, which is what makes the LSH bucketing oracle-checkable in DuckDB.
    """
    comps = [
        F.when(
            F.substring(F.md5(F.lit(f"{plane}-{d}")), 1, 1).isin(
                *"01234567"
            ),
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))
        * F.element_at(vec, d + 1).cast("double")
        for d in range(dim)
    ]
    total = comps[0]
    for c in comps[1:]:
        total = total + c
    return F.when(total >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(vec: Column, n_planes: int, dim: int) -> Column:
    """Concatenated sign bits of n_planes hyperplanes -> bucket id string."""
    bits = [hyperplane_sign(vec, p, dim).cast("string") for p in range(n_planes)]
    return F.concat_ws("", *bits)
