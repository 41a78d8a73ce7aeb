from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from zetasketch_spark.session import get_spark

    s = get_spark(app="zetasketch-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_path(tmp_path_factory):
    from zetasketch_spark.sources.transcripts import write_transcripts_parquet

    path = str(tmp_path_factory.mktemp("data") / "transcripts")
    write_transcripts_parquet(path, n_turns=60_000, seed=42, n_convs=800)
    return path


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
