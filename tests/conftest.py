from __future__ import annotations

import pytest

from nifi_nlp_processor_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
