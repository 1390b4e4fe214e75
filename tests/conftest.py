from __future__ import annotations

import pytest

from colbert_live_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="session")
def oracle_index(documents):
    from colbert_live_spark.oracle import build_oracle_index
    rows = documents.select("doc_id", "text").collect()
    return build_oracle_index([(r.doc_id, r.text) for r in rows])
