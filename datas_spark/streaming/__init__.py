from datas_spark.streaming.scoring import (  # noqa: F401
    read_event_stream,
    score_stream,
    sessionize,
    stream_dedup,
    windowed_event_agg,
)
