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


def l2_normalize(a: Column) -> Column:
    """Unit-norm copy of the vector (double elements).

    Pre-normalizing each row ONCE turns every downstream pairwise cosine
    into a single dot product (one zip_with+aggregate instead of three)
    — the classic hoist for pairwise-similarity stages, ~3x on the
    HOF-interpreted pair loop.  The norm is let-bound so it is computed
    once per row, not once per element.  Engines comparing normalized
    dots must BOTH use this form (round-6 absorbs summation-order ulps,
    not the normalize-vs-ratio algebraic difference).
    """
    from spiders_for_all_spark.functions.text import let

    return let(
        norm(a), lambda n: F.transform(a, lambda x: x.cast("double") / n)
    )


def plane_coefficients(plane: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane entries from md5("p-d") — reproducible in
    any engine with md5, which is what makes LSH bucketing oracle-checkable.
    """
    import hashlib

    return [
        1.0
        if hashlib.md5(f"{plane}-{d}".encode()).hexdigest()[0] in "01234567"
        else -1.0
        for d in range(dim)
    ]


def hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Sign-random-projection LSH bit (Charikar, STOC'02).

    The coefficient vector is a literal array and the projection a single
    zip_with+aggregate — compact codegen (an unrolled 64-term sum blows the
    janino 64KB method limit and falls back to interpreted evaluation).
    Summation is sequential in element order, matching both the python twin
    and DuckDB's list_dot_product.
    """
    coeffs = F.array(*[F.lit(c) for c in plane_coefficients(plane, dim)])
    total = dot(vec, coeffs)
    # round before the sign test so bucket bits are bit-identical across
    # engines (sum order / FMA differences live far below 1e-9)
    return F.when(F.round(total, 9) >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(vec: Column, n_planes: int, dim: int) -> Column:
    """Concatenated sign bits of n_planes hyperplanes -> bucket id string."""
    bits = [hyperplane_sign(vec, p, dim).cast("string") for p in range(n_planes)]
    return F.concat_ws("", *bits)
