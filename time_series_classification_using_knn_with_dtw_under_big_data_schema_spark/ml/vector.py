"""MLlib vector boundary (SURVEY.md §2.9 M1; VERDICT r7 #6).

The engine keeps series native as ``array<double>`` everywhere — Spark's
array functions, codegen, and the Arrow kernels all work on plain arrays,
so there is no internal ``VectorUDT`` (the reference's VectorAssembler at
``Team11-Project.py:107-110`` exists only because MLlib estimators demand
vectors). These two helpers are the explicit boundary for users composing
this engine's output with stock ``pyspark.ml`` stages (scalers, PCA,
clustering, classifiers): convert on the way in, convert back on the way
out. Both are thin wrappers over the JVM-side
``pyspark.ml.functions.array_to_vector`` / ``vector_to_array`` — no Python
crossing, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column

__all__ = ["to_vector", "from_vector", "assemble_vector"]


def to_vector(col: Column) -> Column:
    """``array<double|float>`` column -> MLlib dense ``VectorUDT`` column
    (the input boundary for stock pyspark.ml stages)."""
    from pyspark.ml.functions import array_to_vector

    return array_to_vector(col)


def from_vector(col: Column, dtype: str = "float64") -> Column:
    """MLlib ``VectorUDT`` column -> ``array<double>`` (dtype='float64',
    default) or ``array<float>`` (dtype='float32') — the output boundary
    back into this engine's native layout."""
    from pyspark.ml.functions import vector_to_array

    return vector_to_array(col, dtype)


def assemble_vector(*cols: Column) -> Column:
    """Scalar columns -> one dense vector, the expression twin of the
    reference's ``VectorAssembler(inputCols=[...])`` stage
    (``Team11-Project.py:107-110``) without a fit/transform round-trip:
    ``array_to_vector(array(cols...))``. Stays JVM-side end to end."""
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    return array_to_vector(F.array(*cols))
