"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC final-state query at sf0.001;
``queries`` / ``oracle_sql`` expose every implemented operator from
SURVEY.md §2 plus the training-data pipeline ops, each as a
(Spark plan, DuckDB oracle) pair — see nifi_nlp_processor_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from nifi_nlp_processor_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full CDC apply with the enrichment stage inside
    the hot path — quarantine → whole-stage-codegen regex extraction (pure
    Column; the Arrow/pandas parity path stays available for Python-only
    dialects) → max-LSN LWW → bucketed MERGE → final snapshot with entity
    columns (SURVEY §4.3; the north star's headline composition)."""
    return QUERIES["cdc_apply_enriched"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
