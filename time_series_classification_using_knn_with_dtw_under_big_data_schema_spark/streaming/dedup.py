"""Streaming deduplication (engine extension; the batch dedup operators'
streaming twins for a continuously-ingesting training-data pipeline).

Two levels, both pure Structured Streaming state machinery — no custom
state code:

- ``stream_dedup_exact``: drop rows whose content key was already seen.
  Unbounded variant keeps all keys in state (exact forever, state grows);
  the watermarked variant (``within``) uses dropDuplicatesWithinWatermark
  so state is evicted once the event-time watermark passes — the only
  sane configuration at 100 TB/day ingest, trading cross-window dups for
  bounded state.
- ``stream_dedup_fingerprint``: dedup on the portable char_hash fingerprint
  (functions/text.py) instead of the full content — state stores a long
  per document rather than the text itself, shrinking state ~100x at a
  ~1e-9/pair mod-P collision false-drop risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_hash


def stream_dedup_exact(
    stream: DataFrame,
    *,
    key_cols: list[str] | None = None,
    event_time_col: str | None = None,
    within: str | None = None,
) -> DataFrame:
    """Drop duplicate rows from a stream by content key.

    ``within`` (e.g. "10 minutes") + ``event_time_col`` bounds the dedup
    state with a watermark (dropDuplicatesWithinWatermark); omitting both
    keeps exact unbounded state.
    """
    key_cols = key_cols or [c for c in stream.columns if c != event_time_col]
    if within is not None:
        if event_time_col is None:
            raise ValueError("within= requires event_time_col=")
        return stream.withWatermark(event_time_col, within).dropDuplicatesWithinWatermark(
            key_cols
        )
    return stream.dropDuplicates(key_cols)


def stream_dedup_fingerprint(
    stream: DataFrame,
    *,
    text_col: str = "text",
    event_time_col: str | None = None,
    within: str | None = None,
) -> DataFrame:
    """Dedup on the 64-bit portable fingerprint of ``text_col`` — state is
    one long per doc. Same watermark semantics as stream_dedup_exact."""
    fp = stream.withColumn("_fp", char_hash(F.col(text_col)))
    out = stream_dedup_exact(
        fp, key_cols=["_fp"], event_time_col=event_time_col, within=within
    )
    return out.drop("_fp")
