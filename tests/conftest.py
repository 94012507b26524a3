from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("ZS_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE_DIR = "/root/testdata/sf0.001"

# Oracle twins whose pair cardinality explodes on the 10× synthetic
# fixture, declared only so the scalable forms have a verified
# reference: l06/d05 are exact O(n²) self-joins; d16's within-cluster
# pairs and v12's query×corpus scoring grow with the square/product of
# the fixture; r63's matched-pair set is ~44× the point count before
# aggregation. The per-query oracle tests skip these there; the
# production paths (d06 LSH, v01/v02 ANN, the binned join's plan
# shape) still run in full.
QUADRATIC_ORACLES = {
    "l06_similarity_self_join",
    "d05_embedding_neardup",
    "d16_semantic_dedup",
    "v12_knn_classify",
    "r63_binned_range_join",
}


def skip_quadratic_at_scale(name: str) -> None:
    if "ZS_TEST_SF_DIR" in os.environ and name in QUADRATIC_ORACLES:
        pytest.skip(f"{name}: O(n²) oracle twin, skipped on big fixture")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from zappy_spark.session import get_session

    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark = get_session(
        app_name="zappy-spark-tests",
        cpus=8,
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    from zappy_spark.session import TABLES

    for name in TABLES:
        p = f"{SF_DIR}/{name}.parquet"
        # Spark-written tables are directories of part files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')"
        )
    yield con
    con.close()
