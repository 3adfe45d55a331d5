"""Shared DuckDB oracle SQL fragments.

Cross-engine float determinism: Spark computes dot products as a
*sequential* IEEE-754 double fold (``functions/vector.py:dot`` —
``aggregate(zip_with(a, b, *), 0.0, +)``).  DuckDB's builtin
``list_dot_product`` makes no ordering promise and can differ by ulps;
at a 6-dp ROUND boundary that flips the last digit and fails the value
hash (observed on knn_join in round 1).  These fragments spell the fold
out explicitly so both engines share accumulation order exactly.
"""

from __future__ import annotations


def seqdot(a: str, b: str) -> str:
    """Sequential-fold dot product of two DOUBLE[] expressions.

    Bit-identical with Spark's ``functions.vector.dot``: products are
    exact per-element (IEEE multiply is order-free), and the running sum
    folds left-to-right from 0.0 in both engines.
    """
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), "
        f"(acc, x) -> acc + x)"
    )


def round_pos(expr: str, digits: int) -> str:
    """ROUND with IEEE negative-zero normalization (``-0.0 + 0.0 = +0.0``).

    DuckDB's ROUND keeps the sign bit: ``ROUND(-1e-17, 6)`` → ``-0.0``,
    while the Spark side is blanket-normalized to ``+0.0``
    (``registry.normalize_neg_zero``) — a bit-level value hash then
    mismatches on numerically identical rows (round-2 ``knn_join``).
    Every rounded DOUBLE *output* column in an oracle goes through this.
    """
    return f"(ROUND({expr}, {digits}) + 0.0)"


def seq_cos_dist(v: str, q: str) -> str:
    """1 - cos(v, q) with sequential folds; operand order matches
    ``functions.vector.cosine_distance(v, q, a_norm, b_norm)`` (denominator
    multiplies |v| * |q| in that order)."""
    return (
        f"1 - {seqdot(v, q)}"
        f" / (sqrt({seqdot(v, v)}) * sqrt({seqdot(q, q)}))"
    )
