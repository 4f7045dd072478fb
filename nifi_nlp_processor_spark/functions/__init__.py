from nifi_nlp_processor_spark.functions.extractors import (  # noqa: F401
    DEFAULT_REGISTRY,
    compile_registry,
    extract_entities,
    extract_entities_sql,
    translate_java_regex,
)
from nifi_nlp_processor_spark.functions.dictionary import (  # noqa: F401
    classify_columns,
    lww_domain_winner,
    membership,
    membership_with_format,
    normalize_analyzed,
    parse_query_format,
    percentage_match,
)
from nifi_nlp_processor_spark.functions.model_backend import (  # noqa: F401
    model_span_backend,
    validate_model_file,
)
