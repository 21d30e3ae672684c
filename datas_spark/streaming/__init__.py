from datas_spark.streaming.scoring import (  # noqa: F401
    read_event_stream,
    score_stream,
    sequential_monitor_sink,
    sequential_monitor_state,
    sessionize,
    stream_dedup,
    windowed_event_agg,
)
