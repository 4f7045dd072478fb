from nifi_nlp_processor_spark.streaming.sessionize import (  # noqa: F401
    sessionize_stream,
)
