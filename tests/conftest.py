from __future__ import annotations

import pytest

from ingestion3_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ingestion3-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_table_path(tmp_path):
    return str(tmp_path / "corpus_table")
