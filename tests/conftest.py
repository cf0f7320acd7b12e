import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from google_vision_ocr_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    from google_vision_ocr_spark import fixtures

    d = tmp_path_factory.mktemp("pages_fixture")
    paths = fixtures.write_fixture_dir(str(d), n_urls=60, seed=42, skew_pages=60)
    return paths
