"""Model-backed enrichment backend — the reference's actual NER path
(OpenNLP ``TokenNameFinderModel``) re-expressed with the executor-singleton
load-once pattern.

Reference semantics being mirrored:

* ``ModelJSONValidator.java:48-60,131-161`` — a ``{type: model-URL}``
  registry validated EAGERLY (the validator constructs the model object at
  property-validation time, before any record flows) and cached in a
  process-wide ``ConcurrentHashMap`` so the artifact is fetched/compiled
  once, not per record.
* ``PontusNLPProcessor.java:350-352,386-404`` — per record: tokenize, find
  named-entity spans with per-span probabilities, then the shared contract:
  strict `>` threshold filter and set-union merge
  (``PontusProcessorBase.java:69-83,303-327``).

Spark-first shape: the model artifact is a file; each **Python worker
process** loads + compiles it ONCE into a module-global cache (the
``ConcurrentHashMap`` analogue — executors are long-lived, so the load
amortizes over every Arrow batch the worker ever sees), and a vectorized
pandas UDF emits ``array<struct<value, prob>>`` spans through the same
``enrich_entities`` orchestration (P1 → backend → T2 cap → P2 threshold →
A1/A2 merge) as every other backend. Driver-side validation happens at
plan-build time (L2), so a malformed model fails the job before the first
epoch, exactly like the reference's validator.

No ML runtime ships in this environment, so the model FORMAT is a
deterministic stand-in — a JSON gazetteer ``{"terms": {term: prob}}``
scored by word-boundary match — but every seam a real model needs is
exercised for real: artifact file → eager validation → once-per-worker
load/compile → Arrow-batched scoring → (value, prob) threshold contract.
Swapping in a true model changes ``_compile``/``_score`` only.
"""

from __future__ import annotations

import json
import os
import re

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

# process-global model cache: the ConcurrentHashMap analogue
# (ModelJSONValidator.java:23). Keyed by path; values are compiled models.
_MODEL_CACHE: dict[str, dict] = {}
# diagnostics: how many REAL loads this process performed per path — lets
# tests prove load-once-per-worker without a filesystem side channel
_LOAD_COUNTS: dict[str, int] = {}


def validate_model_file(path: str) -> dict:
    """Eager driver-side validation (L2 — the reference validator
    constructs the model during ``customValidate``,
    ModelJSONValidator.java:78-129): the file must exist, parse as JSON,
    and carry a non-empty ``terms`` map of string → probability in [0, 1].
    Raises ``ValueError`` before any epoch runs; returns the parsed spec."""
    if not os.path.exists(path):
        raise ValueError(f"model file not found: {path}")
    try:
        with open(path) as fh:
            spec = json.load(fh)
    except json.JSONDecodeError as e:
        raise ValueError(f"model file {path} is not valid JSON: {e}") from e
    terms = spec.get("terms")
    if not isinstance(terms, dict) or not terms:
        raise ValueError(f"model file {path}: 'terms' must be a non-empty object")
    for t, p in terms.items():
        if not isinstance(t, str) or not t.strip():
            raise ValueError(f"model file {path}: bad term {t!r}")
        if not isinstance(p, (int, float)) or not (0.0 <= float(p) <= 1.0):
            raise ValueError(f"model file {path}: prob of {t!r} not in [0,1]: {p!r}")
    return spec


def _compile(spec: dict) -> dict:
    """Model 'compile': one alternation regex over all gazetteer terms
    (longest-first so overlaps resolve deterministically) + the prob
    lookup. A real model would deserialize its weights here."""
    probs = {t.lower(): float(p) for t, p in spec["terms"].items()}
    alts = sorted(probs, key=len, reverse=True)
    pat = re.compile(r"\b(?:" + "|".join(re.escape(t) for t in alts) + r")\b")
    return {"pattern": pat, "probs": probs}


def _load_model(path: str) -> dict:
    """Executor-singleton load: first call in a worker process reads and
    compiles; every later call (any batch, any task) hits the cache."""
    model = _MODEL_CACHE.get(path)
    if model is None:
        model = _compile(validate_model_file(path))
        _MODEL_CACHE[path] = model
        _LOAD_COUNTS[path] = _LOAD_COUNTS.get(path, 0) + 1
    return model


def model_span_backend(path: str):
    """An ``enrich_entities`` backend backed by a model artifact: returns
    ``data -> array<struct<value:string, prob:double>>``. Validation is
    eager (plan-build time, on the driver); the worker-side load is a
    process singleton. Scoring is a vectorized pandas str op over the
    Arrow batch — no per-row Python in the planner's sense."""
    validate_model_file(path)  # fail fast on the driver (L2)

    @F.pandas_udf("array<struct<value:string, prob:double>>")
    def spans(texts: pd.Series) -> pd.Series:
        # Import the module BY NAME inside the worker: cloudpickle would
        # otherwise ship the closure with its own copy of the module
        # globals per task, defeating the process-wide cache. The named
        # import reaches THE worker process's module instance — one cache
        # shared by every task/UDF that process ever runs (the package
        # ships via spark-submit --py-files, so the import always
        # resolves).
        from nifi_nlp_processor_spark.functions import model_backend as mb

        model = mb._load_model(path)
        pat, probs = model["pattern"], model["probs"]
        hits = texts.fillna("").str.lower().str.findall(pat)
        return hits.map(
            lambda ws: [
                {"value": w, "prob": probs[w]} for w in sorted(set(ws))
            ]
        )

    return lambda data: spans(data)


def model_load_provenance(path: str) -> Column:
    """Diagnostic column for tests: per row, which worker process scored
    it and how many times that process ACTUALLY loaded the model. The
    load-once proof: across any number of rows/batches, every row must
    report ``loads == 1`` (and distinct pids ≤ the worker pool size)."""

    @F.pandas_udf("struct<pid:long, loads:long>")
    def prov(texts: pd.Series) -> pd.DataFrame:
        from nifi_nlp_processor_spark.functions import model_backend as mb

        mb._load_model(path)
        n = len(texts)
        return pd.DataFrame(
            {"pid": [os.getpid()] * n, "loads": [mb._LOAD_COUNTS[path]] * n}
        )

    return prov(F.lit(""))
