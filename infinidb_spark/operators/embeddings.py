"""Embedding-vector operators for training/serving pipelines:
L2 normalization, symmetric int8 quantization, and quantization-error
auditing.

Storage-side vector ops the reference never had (its DECIMAL columns
stop at scalars — ``dbcon/execplan/simplecolumn_decimal.h``) but a
100 TB embedding corpus needs: int8 quantization cuts a float32 vector
store 4× (the difference between an ANN index fitting in executor
memory or spilling), and the error audit is the gate that decides
whether the quantized store is servable.

Scale design: every operator here is a per-row Column expression —
map-only, zero shuffle, pipelined into whatever scan/join carries the
vectors.  Arithmetic is kept IEEE-deterministic (``floor(x/s + 0.5)``
instead of engine-specific ``round``) so results are bit-identical
across engines — the DuckDB oracle reproduces the full pipeline.

On expression choice: these use higher-order array lambdas
(``transform``/``aggregate``), which Spark evaluates interpreted
(outside whole-stage codegen).  For O(dim)-per-row elementwise math
that constant factor is acceptable and keeps the operator pure-SQL
(oracle-checkable); compute-heavy array work (MinHash) instead uses the
exploded-rows formulation — see operators/dedup.py for that pattern and
the measured 10× rationale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: guard against all-zero vectors — scale never reaches 0 so x/scale
#: stays finite; 1e-12 is far below any real float32 embedding range.
_EPS = 1e-12


def _d(vec: Column) -> Column:
    return vec.cast("array<double>")


def l2_norm(vec: Column) -> Column:
    """Euclidean norm of a float vector (double precision)."""
    v = _d(vec)
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def l2_normalize(vec: Column) -> Column:
    """Unit-normalize a vector; all-zero vectors pass through unchanged
    (norm clamped to eps keeps 0/eps = 0)."""
    v = _d(vec)
    n = F.greatest(l2_norm(v), F.lit(_EPS))
    return F.transform(v, lambda x: x / n)


def quant_scale(vec: Column) -> Column:
    """Symmetric per-vector int8 scale: max|x| / 127, clamped to eps."""
    v = _d(vec)
    amax = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    return F.greatest(amax, F.lit(_EPS)) / F.lit(127.0)


def quantize_int8(vec: Column, scale: Column) -> Column:
    """Symmetric int8 code array: floor(x/scale + 0.5) in [-127, 127].

    ``floor(x + 0.5)`` (round-half-up) instead of ``round`` because
    engines disagree on round-half semantics for doubles; floor is IEEE
    and reproduces bit-identically everywhere.  max|x|/127 scaling means
    the un-clamped code already lies in [-127, 127]; the clamp guards
    the x == -max edge where floor(-127 + 0.5) = -127 exactly."""
    v = _d(vec)
    code = F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)))
    return F.transform(
        code, lambda c: F.greatest(F.least(c, F.lit(127)), F.lit(-127)).cast("int")
    )


def dequantize(codes: Column, scale: Column) -> Column:
    """Reconstruct doubles from int8 codes: code * scale."""
    return F.transform(codes, lambda c: c.cast("double") * scale)


def quant_abs_errors(vec: Column, scale: Column) -> Column:
    """Per-element |x - dequant(quant(x))| without materializing codes:
    err_i = |x_i - floor(x_i/s + 0.5) * s| — one fused expression both
    engines compute identically (max possible value: s/2)."""
    v = _d(vec)
    return F.transform(v, lambda x: F.abs(x - F.floor(x / scale + F.lit(0.5)) * scale))
