from nifi_nlp_processor_spark.operators.cdc_lww import (  # noqa: F401
    lww_dedupe,
    lww_dedupe_window,
    salted_lww_dedupe,
)
from nifi_nlp_processor_spark.operators.quarantine import split_valid  # noqa: F401
