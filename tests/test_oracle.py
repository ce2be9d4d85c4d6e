"""The correctness gate, run locally: every registered query with an oracle
is executed on Spark and DuckDB at sf0.001 and compared exactly — the same
check the driver performs at sf0.01."""

from __future__ import annotations

import pytest

from stateflow_spark.queries import REGISTRY
from tests.conftest import SF_DIR, assert_same_result

ORACLED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    qd = REGISTRY[name]
    sdf = qd.fn(spark, SF_DIR)
    drows = duck.execute(qd.oracle).fetchall()
    # schema sanity: same column count; driver also sorts columns by name,
    # so names must match too
    duck_cols = [d[0] for d in duck.description]
    assert sorted(sdf.columns) == sorted(duck_cols), (
        f"{name}: column names spark={sorted(sdf.columns)} "
        f"duck={sorted(duck_cols)}"
    )
    # driver sorts columns by name before hashing — do the same
    cols = sorted(sdf.columns)
    sdf = sdf.select(*cols)
    idx = [duck_cols.index(c) for c in cols]
    drows = [tuple(r[i] for i in idx) for r in drows]
    assert_same_result(sdf, drows, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    qd = REGISTRY[name]
    sdf = qd.fn(spark, SF_DIR)
    n = sdf.count()
    assert n >= 0
