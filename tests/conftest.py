import json
import os

import pytest

from unify_spark.fixtures import generate_fixture
from unify_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("unify_spark-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("audio_fixture"))
    generate_fixture(d, n_rows=10_000, n_parts=8, payload_cap_ms=50)
    return d


@pytest.fixture(scope="session")
def manifest(fixture_dir):
    with open(os.path.join(fixture_dir, "manifest.json")) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def audio_tables(spark, fixture_dir):
    from unify_spark.plans import load_audio_tables

    return load_audio_tables(spark, fixture_dir)
