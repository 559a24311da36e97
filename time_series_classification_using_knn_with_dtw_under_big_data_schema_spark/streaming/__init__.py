from .scoring import (  # noqa: F401
    bm25_query_index,
    score_stream,
    score_stream_bm25,
    score_stream_quality,
    score_stream_stateless,
)
from .windows import windowed_event_aggregate, sessionized_event_counts, nanos_to_ts  # noqa: F401
from .stateful import running_user_stats  # noqa: F401
from .dedup import stream_dedup_exact, stream_dedup_fingerprint  # noqa: F401
from .sketch import stream_hll_registers  # noqa: F401
from .joins import attribution_join  # noqa: F401
from .sinks import stream_to_parquet  # noqa: F401
from .drift import stream_drift_monitor, value_histogram  # noqa: F401
