"""Every catalog query with an oracle must hash-match DuckDB — the same
gate the driver runs at sf0.01, run here at sf0.001 for speed."""

from __future__ import annotations

import pytest

from cuda_acceleratedvectordatabaseengine_spark.plans import queries as Q

from .conftest import SF_DIR_ORACLE
from .oracle_utils import assert_matches_oracle, duck_con


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR_ORACLE)
    yield c
    c.close()


ORACLE_SPECS = sorted(
    name for name, spec in Q.all_specs().items() if spec.oracle is not None
)


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_query_matches_oracle(spark, con, name):
    spec = Q.get(name)
    df = spec.spark(spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, con, spec.oracle, name=name)


def test_rows_only_queries_run(spark):
    for name, spec in Q.all_specs().items():
        if spec.oracle is None:
            n = spec.spark(spark, SF_DIR_ORACLE).count()
            assert n >= 0, name
