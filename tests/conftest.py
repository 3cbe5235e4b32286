import pytest

from metacheck_spark import get_spark
from metacheck_spark.fixtures.gen_images import write_images_parquet


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", shuffle_partitions=8, app_name="tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def images_dir(tmp_path_factory):
    """Deterministic 600-row images table + url_status dim."""
    p = tmp_path_factory.mktemp("images")
    write_images_parquet(str(p), 600)
    return str(p)
