"""Change-stream source adapters (binlog/WAL envelope formats)."""

from nifi_nlp_processor_spark.sources.envelope import (
    envelope_schema,
    parse_envelope,
    to_envelope_json,
)

__all__ = ["envelope_schema", "parse_envelope", "to_envelope_json"]
