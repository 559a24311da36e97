"""Streaming sketches (engine extension): the batch sketch operators'
streaming twins. HLL registers are the canonical streaming-friendly
sketch — the per-bucket MAX is monotone, so update-mode output converges
to exactly the batch registers with O(2^p_bits) state regardless of
stream length (vs stream_dedup_exact whose exact state grows with
distinct keys).

``stream_hll_registers`` IS the batch operator applied to a streaming
DataFrame — hll_registers is a single groupBy(max) over a stateless
projection, which Structured Streaming supports natively — re-exported
here with the streaming state contract documented and test-pinned: the
availableNow drain of a file stream equals the batch registers
bit-for-bit, so a dashboard estimating live distinct counts can hand its
registers to the batch estimator (hll_distinct's fold) at any time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.sketch import hll_registers

__all__ = ["stream_hll_registers"]


def stream_hll_registers(
    stream: DataFrame,
    col: str,
    *,
    p_bits: int = 8,
    w_bits: int = 24,
) -> DataFrame:
    """(b, m) register table over a stream; use with
    outputMode('update'|'complete'). State: <= 2^p_bits rows, forever."""
    return hll_registers(stream, col, p_bits=p_bits, w_bits=w_bits)
