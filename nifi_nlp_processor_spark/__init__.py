"""PySpark-native CDC / incremental-ingest engine for conversation transcripts.

A from-scratch re-expression of the capabilities of
``pontusvision/nifi-nlp-processor`` (reference at ``/root/reference/``) over
idiomatic Spark: Structured-Streaming-style micro-batch epochs, max-LSN
last-writer-wins dedupe, MERGE-INTO lake upsert with exactly-once epoch
manifests, schema evolution, vectorized (Arrow) enrichment, and the
training-data operators (dedup / similarity / text analysis) a 100 TB
pipeline needs.

The reference is a NiFi processor bundle that handles one FlowFile (record)
per session; this engine inverts that into columnar batch dataflow. See
SURVEY.md for the operator-by-operator mapping with file:line citations.
"""

__version__ = "0.1.0"

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
CHANGE_EVENT_COLUMNS = ["lsn", "op", "epoch_id"] + TRANSCRIPT_COLUMNS
