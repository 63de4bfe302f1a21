"""High-cardinality groupby aggregation via hash buckets.

Ray Data's sort-based ``groupby(key).aggregate(...)`` pays Python-level
per-group cost in its reduce phase — measured here at ~0.6 ms/group, i.e.
92 s for a 147k-group max over 600k rows (BASELINE.md round-2 notes).
That is fine for low-cardinality keys (priorities, months, languages)
and catastrophic for per-order / per-customer / per-document keys whose
group count grows with the data.

``hash_bucket_agg`` keeps the exchange but swaps the reduce: rows are
bucketed by ``key % n_buckets``, ONE sort-shuffle moves them to their
bucket (n_buckets groups — the per-group Python cost is paid 64 times,
not 147k times), and a caller-supplied VECTORIZED pandas aggregation
runs inside each bucket (same-key rows are guaranteed co-located). The
same pattern the engine already uses for its bucketed hash join and the
min-label CC phases.

Scale notes: buckets are uniform under the modulo of a dense int key —
for adversarial key skew, salt upstream like pipelines/geo.py does.
Callers should pre-aggregate per batch BEFORE calling (partial
combine), so the exchange moves partials, not raw rows. Callers that
MUST ship raw rows (the window family: sessionize, as-of, range join —
their per-row outputs can't pre-reduce) expose ``n_buckets`` and should
size it so one bucket (~1/n_buckets of the table) fits a worker's heap:
n_buckets is the reduce parallelism AND the per-task memory divisor.
"""

import numpy as np
import pandas as pd


def hash_bucket_agg(ds, key, agg_fn, n_buckets=64):
    """Group ``ds`` by int64 column ``key`` at high cardinality.

    ``agg_fn: pd.DataFrame -> pd.DataFrame`` receives one bucket's rows
    (all rows of any given key, possibly many keys) and must perform its
    own ``groupby(key)`` reduction vectorized. Returns the concatenated
    per-bucket results as a Dataset.
    """

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        k = df[key]
        if pd.api.types.is_integer_dtype(k):
            b = k.to_numpy().astype(np.int64) % n_buckets
        else:  # string keys: deterministic 64-bit hash, fixed pandas key
            h = pd.util.hash_pandas_object(k, index=False).to_numpy()
            b = (h % np.uint64(n_buckets)).astype(np.int64)
        df["__b"] = b
        return df

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        return agg_fn(bucket.drop(columns="__b"))

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
    )
