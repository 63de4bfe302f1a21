"""hash_bucket_agg: the engine's high-cardinality groupby replacement."""

import numpy as np
import pandas as pd


def test_hash_bucket_agg_matches_pandas_int_keys(ray_session):
    import ray.data

    from rio_color_ray.stages.agg import hash_bucket_agg

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            # negative keys included: numpy % keeps Python semantics
            "k": rng.integers(-500, 500, size=5000),
            "v": rng.integers(0, 100, size=5000),
        }
    )
    got = (
        hash_bucket_agg(
            ray.data.from_pandas(df),
            "k",
            lambda d: d.groupby("k", as_index=False)["v"].sum(),
            n_buckets=8,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = df.groupby("k", as_index=False)["v"].sum()
    pd.testing.assert_frame_equal(got, exp)


def test_hash_bucket_agg_string_keys(ray_session):
    import ray.data

    from rio_color_ray.stages.agg import hash_bucket_agg

    df = pd.DataFrame(
        {
            "k": [f"tok{i % 97}" for i in range(3000)],
            "v": np.arange(3000, dtype=np.int64),
        }
    )
    got = (
        hash_bucket_agg(
            ray.data.from_pandas(df),
            "k",
            lambda d: d.groupby("k", as_index=False)["v"].max(),
            n_buckets=8,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = df.groupby("k", as_index=False)["v"].max()
    pd.testing.assert_frame_equal(got, exp)
