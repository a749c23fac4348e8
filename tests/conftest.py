"""Shared fixtures: one session-scoped SparkSession, planted corpora."""

from __future__ import annotations

import pytest

from dedupe_spark.fixtures import generate_files
from dedupe_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dedupe_spark_tests", master="local[4]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    """Small planted corpus (~80 rows): exact + near families, singletons,
    corrupt rows — the analog of the reference's 9-image conftest corpus."""
    return generate_files(seed=42)


@pytest.fixture(scope="session")
def corpus_with_giant():
    return generate_files(seed=42, giant_family_size=300)
