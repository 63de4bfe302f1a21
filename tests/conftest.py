"""Shared fixtures. Ray is initialised ONCE per pytest session."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture
def arr():
    """The reference's (3,2,2) golden fixture (tests/test_operations.py:15-30)."""
    from rio_color_ray.color import to_math_type

    return to_math_type(
        (
            np.array([[[1, 2], [3, 4]], [[5, 6], [7, 8]], [[9, 10], [11, 12]]])
        ).astype("uint8")
        * 10
    )


@pytest.fixture
def arr_rgba():
    """The reference's (4,2,2) RGBA fixture (tests/test_operations.py:33-45)."""
    from rio_color_ray.color import to_math_type

    return to_math_type(
        np.array(
            [
                [[1, 2], [3, 4]],
                [[5, 6], [7, 8]],
                [[9, 10], [11, 12]],
                [[0, 0], [25.5, 25.5]],
            ]
        ).astype("uint8")
        * 10
    )


def duckdb_con(tables=("documents",), sf=SF_SMOKE):
    """A DuckDB connection with the given parquet tables as views —
    the shared oracle-connection builder (one definition, not one per
    test module)."""
    import duckdb

    c = duckdb.connect()
    for t in tables:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    return c


def oracle_check(ray_result, con, sql):
    """Value-for-value compare of a Ray result against its DuckDB twin,
    exactly as the external driver does it: sort columns by name, sort
    rows by all columns, exact values. Returns the Ray-side frame."""
    import pandas as pd

    rdf = ray_result if isinstance(ray_result, pd.DataFrame) else ray_result.to_pandas()
    odf = con.sql(sql).df()
    cols = sorted(rdf.columns)
    a = rdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    return rdf
