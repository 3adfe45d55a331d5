"""Vector math as Catalyst Column expressions.

The reference computes cosine distance inside Postgres with pgvector's
``embedding <=> $query`` operator (reference: ``db/supabase_ops.py:267``,
``core/search.py:142``).  Spark has no vector builtin, but the semantics
are a fold over two arrays — exactly what the higher-order functions
``zip_with`` + ``aggregate`` express.  These stay JVM-side (no Python
boundary) and participate in whole-stage codegen, so the hot path of the
top-k scan never leaves Tungsten.

All math is done in ``double``: inputs are cast from ``array<float>`` so
results are bit-identical with the DuckDB oracle (both engines then run
the same sequential IEEE-754 double fold).

Scale note: for a 100 TB corpus the scan cost is dominated by reading the
embedding column; precompute ``l2_norm(embedding)`` once at index-build
time (see ``sources/highlights.py``) so the per-query work is one dot
product per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two array columns (double)."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def l2_normalize(a: Column | str) -> Column:
    """Divide each element by the vector's L2 norm (null-safe; zero vector → null)."""
    c = _as_double(a)
    n = l2_norm(c)
    return F.when(n > 0, F.transform(c, lambda x: x / n))


def cosine_similarity(
    a: Column | str,
    b: Column | str,
    a_norm: Column | None = None,
    b_norm: Column | None = None,
) -> Column:
    """cos(a, b) = dot(a,b) / (|a| * |b|); pass precomputed norms to skip work.

    Null-safe: a zero-norm vector has no direction → NULL (also keeps
    ANSI mode from raising DIVIDE_BY_ZERO).
    """
    na = a_norm if a_norm is not None else l2_norm(a)
    nb = b_norm if b_norm is not None else l2_norm(b)
    denom = na * nb
    return F.when(denom > 0, dot(a, b) / denom)


def cosine_distance(
    a: Column | str,
    b: Column | str,
    a_norm: Column | None = None,
    b_norm: Column | None = None,
) -> Column:
    """pgvector's ``<=>``: 1 - cosine similarity (smaller = closer)."""
    return F.lit(1.0) - cosine_similarity(a, b, a_norm, b_norm)


# --- SQ8 scalar quantization -------------------------------------------------
#
# pgvector-style scalar quantization: each vector stores a per-vector
# scale (max|x|/127) and int8 components round(x/scale).  8× smaller than
# fp64 scoring input, and — because the per-vector scales cancel in
# cosine — quantized cosine similarity is just integer cosine, exactly
# reproducible in SQL (the suite oracle-checks the whole quantized
# search).  Pure Column math; rounding is floor(x+0.5) so both engines
# agree on half-way cases.


def sq8_quantize(vec: Column | str) -> Column:
    """array<float> → struct<scale double, q array<int>> (SQ8 codes)."""
    c = _as_double(vec)
    mx = F.array_max(F.transform(c, lambda x: F.abs(x)))
    scale = F.when(mx > 0, mx / F.lit(127.0)).otherwise(F.lit(1.0))
    q = F.transform(c, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))
    return F.struct(scale.alias("scale"), q.alias("q"))


def int_code_norm(q: Column) -> Column:
    """sqrt of the exact integer self-dot of a code array — precompute
    once per row/query so scoring reuses it instead of re-folding the
    norm per comparison (same expression, so the value is identical)."""
    to_d = F.transform(q, lambda x: x.cast("double"))
    return F.sqrt(dot(to_d, to_d))


def int_cosine_distance(
    qa: Column,
    qb: Column,
    a_norm: Column | None = None,
    b_norm: Column | None = None,
) -> Column:
    """1 - cos over integer code arrays.  Dot/norms are exact integer sums
    (< 2^53), so the result is bit-identical across engines.  Pass
    precomputed ``int_code_norm`` columns to skip two of the three
    interpreted folds per comparison."""
    to_d = lambda a: F.transform(a, lambda x: x.cast("double"))  # noqa: E731
    return F.lit(1.0) - cosine_similarity(
        to_d(qa), to_d(qb), a_norm=a_norm, b_norm=b_norm
    )


# --- fp16 storage codec ------------------------------------------------------
#
# The reference stores vectors as HALFVEC(3072) — half-precision, halving
# storage (reference models/highlight.py:24-26).  The Spark analogue is a
# BinaryType column of packed little-endian float16.  Spark SQL has no
# fp16 type, so the codec is an Arrow-batched pandas UDF pair — storage
# I/O, not the query hot path: unpack once at index-open (or keep fp32 in
# the working set), never per-query.


def pack_fp16() -> Column:
    """array<float> → binary of little-endian float16 (HALFVEC parity)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _pack(vecs: pd.Series) -> pd.Series:
        return vecs.map(
            lambda v: None
            if v is None
            else np.asarray(v, dtype=np.float16).astype("<f2").tobytes()
        )

    return _pack


def unpack_fp16() -> Column:
    """binary (packed ``<f2``) → array<float> (values carry fp16 rounding)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def _unpack(blobs: pd.Series) -> pd.Series:
        return blobs.map(
            lambda b: None
            if b is None
            else np.frombuffer(b, dtype="<f2").astype(np.float32).tolist()
        )

    return _unpack
