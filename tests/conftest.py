from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from ultraviolet_spark.session import get_spark

    s = get_spark(app_name="uv-tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def pages_path(tmp_path_factory):
    from ultraviolet_spark.sources.pages_gen import write_pages

    p = tmp_path_factory.mktemp("pages") / "pages.parquet"
    write_pages(str(p), n_urls=100, max_crawls=10, seed=42)
    return str(p)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
