from nifi_nlp_processor_spark.streaming.sessionize import (  # noqa: F401
    sessionize_stream,
)
from nifi_nlp_processor_spark.streaming.windowed import (  # noqa: F401
    windowed_counts,
)
from nifi_nlp_processor_spark.streaming.dedup import (  # noqa: F401
    dedup_stream,
)
from nifi_nlp_processor_spark.streaming.interval_join import (  # noqa: F401
    attribution_pairs,
    interval_join,
)
from nifi_nlp_processor_spark.streaming.metrics import (  # noqa: F401
    ProgressLedger,
    progress_ledger,
    read_ledger,
)
