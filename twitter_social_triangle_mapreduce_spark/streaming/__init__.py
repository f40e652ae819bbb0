from .streams import (  # noqa: F401
    read_events_stream,
    read_events_stream_json,
    sessionize_native,
    streaming_dedup_against_corpus,
    streaming_dedup_within_watermark,
    with_quality_metrics,
    streaming_event_window_counts,
    streaming_path2_against_static,
    streaming_path2_stream_stream,
    streaming_sessionize,
    streaming_triangle_closures,
    streaming_user_running_counts,
)
