"""Python UDTF surface (SURVEY.md §2.10 lists UDTF as absent from the
reference — the closest analog is its per-partition ``mapPartitions``
kNN functions, `Team11-Project.py:166-183`, which this engine eliminated
in favor of declarative plans).

This module exposes the engine's ONE sanctioned escape hatch for
imperative row→rows fan-out: a Spark 4 Python UDTF. The rule of thumb
stays: if explode/sequence/transform can express the fan-out (chunking,
n-grams, frame sampling — see chunk_documents, _token_ngrams,
frame-sampling q41), use the declarative form — it is codegen'd and
shuffle-transparent. Reach for a UDTF only when per-row logic is genuinely
iterative/stateful (e.g. a tokenizer with carry-over state, a parser with
backtracking).

``SeriesSegmentStats`` is the reference example + its conformance test
target: per fixed-length segment of a series, emit (seg_idx, seg_mean,
seg_min, seg_max). It is deliberately chosen to HAVE a declarative twin
(paa-style slice/aggregate) so tests can pin the UDTF path to the codegen
path row-for-row.

Scale note: UDTFs run row-at-a-time in the Python worker (Arrow-batched
transfer, per-row dispatch) — fine for low-volume fan-out, wrong for the
hot path; the equivalence test doubles as a reminder that the declarative
twin exists.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

__all__ = ["SeriesSegmentStats", "series_segment_stats_declarative"]


@udtf(returnType="seg_idx: int, seg_mean: double, seg_min: double, seg_max: double")
class SeriesSegmentStats:
    """Lateral fan-out: one row per ``seg_len`` segment of ``features``.

    Trailing partial segments are dropped (mirrors paa()'s equal-chunk
    contract). Mean is the left-to-right sum / seg_len, matching the
    declarative twin's fold order.
    """

    def eval(self, features, seg_len: int):  # noqa: D401 - UDTF contract
        if features is None or seg_len is None or seg_len <= 0:
            return
        n_full = len(features) // seg_len
        for i in range(n_full):
            seg = features[i * seg_len : (i + 1) * seg_len]
            acc = 0.0
            for v in seg:
                acc += v
            yield i, acc / float(seg_len), min(seg), max(seg)


def series_segment_stats_declarative(df, *, features_col: str = "features", seg_len: int):
    """The codegen twin of SeriesSegmentStats (explode + slice + fold)."""
    from pyspark.sql import functions as F

    n_full = F.floor(F.size(features_col) / F.lit(seg_len)).cast("int")
    # when n_full == 0, sequence(0, -1) would DESCEND; null -> explode drops
    idx = F.when(n_full >= 1, F.sequence(F.lit(0), n_full - 1))
    e = df.select("*", F.explode(idx).alias("seg_idx"))
    seg = F.slice(F.col(features_col), F.col("seg_idx") * seg_len + 1, seg_len)
    return e.select(
        "*",
        (
            F.aggregate(seg, F.lit(0.0), lambda a, v: a + v) / F.lit(float(seg_len))
        ).alias("seg_mean"),
        F.array_min(seg).alias("seg_min"),
        F.array_max(seg).alias("seg_max"),
    ).drop(features_col)
