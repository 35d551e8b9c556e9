"""Mirror of the driver's t2 gate: every registry query runs on Spark AND
its DuckDB oracle; results must match exactly (order-insensitive).

Runs at sf0.001 by default for speed; set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 for the full-fidelity pass.
"""

from __future__ import annotations

import pytest

from presto_ads_spark.queries import load_all
from presto_ads_spark.testing import compare_frames

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(name, spark, duck):
    from tests.conftest import SF_DIR

    spec = REGISTRY[name]
    df = spec.spark_fn(spark, SF_DIR)
    if spec.oracle is None:
        # rows-only check (driver behaves the same for oracle-less entries)
        assert df.count() >= 0
        return
    res = compare_frames(name, df, duck, spec.oracle)
    assert res.ok, f"{name}: {res.detail}"
