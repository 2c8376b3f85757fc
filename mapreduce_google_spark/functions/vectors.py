"""Vector expressions over ``array<float>`` embedding columns.

All built on ``zip_with`` / ``aggregate`` higher-order functions: the dot
product and norms run inside the JVM per-row with no Python transfer, so a
brute-force similarity scan is shuffle-free except for the final top-k.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double precision, summed left-to-right (deterministic)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a|·|b|); NaN-safe only insofar as inputs are non-zero."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_similarity_checked(
    a: Column | str, b: Column | str, context: str = "cosine_similarity"
) -> Column:
    """:func:`cosine_similarity` that fails LOUDLY on a zero-norm input
    instead of propagating a non-finite value (ADVICE r16): the fused
    Arrow IVF kernel raises on any non-finite cosine, so the JVM-side
    form it is equality-pinned against must fail identically on a
    degenerate corpus rather than silently ordering NaN/Infinity rows.
    ``raise_error`` runs inside the JVM expression — no extra pre-scan
    pass over the embeddings, and zero cost on the non-degenerate path.

    A NEW function rather than a guard inside :func:`cosine_similarity`
    itself: the unchecked expression sits in six pinned oracle-bearing
    closures (t24/t122/t145/t151/t158/t165) whose NaN-free behavior on
    real corpora is already certified — widening those closures would
    spend driver re-prove slots on a guard their inputs can never trip.
    """
    denom = l2_norm(a) * l2_norm(b)
    return F.when(
        denom == 0,
        F.raise_error(
            F.concat(
                F.lit(f"zero-norm embedding in {context}: |a|*|b| = 0 "),
                F.lit("(cosine undefined; clean the corpus or drop the row)"),
            )
        ).cast("double"),
    ).otherwise(dot(a, b) / denom)
