"""Global top-k without a full distributed sort.

``Dataset.sort(...).limit(k)`` is an all-to-all range-partitioned sort of
EVERY row — at 10^12 rows that exchange dwarfs the k rows anyone wants.
``topk_rows`` instead takes a partial top-k inside each block (each block
contributes at most k rows — vectorized pandas sort, no shuffle), then
reduces the <= k x n_blocks survivors in one single-block task. Exactly
equivalent to sort+limit when the key set is totally ordered (callers
pass a tie-breaking column, same as they would to ``sort``).
"""

import pandas as pd


def topk_rows(ds, by, descending, k):
    """Top ``k`` rows of ``ds`` by ``by`` (list of columns), sorted.

    ``descending`` is a list of bools aligned with ``by`` — identical
    semantics (including deterministic tie order) to
    ``ds.sort(by, descending=descending).limit(k)``.
    """
    ascending = [not d for d in descending]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(by, ascending=ascending, kind="mergesort").head(k)

    small = ds.map_batches(partial, batch_format="pandas")
    # survivors: <= k rows per upstream block. One task finishes the job;
    # batch_size=None = whole block per batch, repartition(1) = one block.
    return small.repartition(1).map_batches(
        partial, batch_format="pandas", batch_size=None
    )
