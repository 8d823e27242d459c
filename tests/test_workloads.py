"""Every REGISTRY query with an oracle must match DuckDB at sf0.001 —
the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from samyama_graph_spark.workloads import REGISTRY, load_all_workloads

from tests.util import assert_matches_oracle

load_all_workloads()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert_matches_oracle(df, spec.oracle, sf_dir)


def test_rows_only_queries_run(spark, sf_dir):
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            n = spec.fn(spark, sf_dir).count()
            assert n >= 0, name
