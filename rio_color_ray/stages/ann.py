"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is BROADCAST once
per actor; every batch does one (batch x dim) @ (dim x queries) float64
matmul and emits only per-query local top-k rows. Scale path:
LSH-bucketed search (stages.dedup.EmbeddingLSHStage buckets + probing).

Ranking is by (round(score, 6) DESC, vec_id ASC) — rounding absorbs
summation-order float differences vs the SQL oracle
(list_cosine_similarity), ties break on the id.
"""

import numpy as np
import pandas as pd
import pyarrow as pa


class AnnBruteStage:
    """map_batches actor: per-batch cosine top-k against broadcast queries."""

    def __init__(self, query_ids, query_matrix, k, id_col="vec_id", vec_col="embedding"):
        self.qid = np.asarray(query_ids, dtype=np.int64)
        q = np.asarray(query_matrix, dtype=np.float64)
        self.q = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        vecs = np.stack(batch.column(self.vec_col).to_pylist()).astype(np.float64)
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        scores = vecs @ self.q.T  # (batch, queries)

        # self-exclusion
        for row, i in enumerate(ids):
            hit = np.nonzero(self.qid == i)[0]
            if len(hit):
                scores[row, hit] = -np.inf

        k = min(self.k, scores.shape[0])
        idx = np.argpartition(-scores, k - 1, axis=0)[:k]  # (k, queries)
        qcols = np.broadcast_to(np.arange(scores.shape[1]), idx.shape)
        flat_i, flat_q = idx.ravel(), qcols.ravel()
        keep = np.isfinite(scores[flat_i, flat_q])  # drop self-exclusion sentinels
        flat_i, flat_q = flat_i[keep], flat_q[keep]
        return pa.table(
            {
                "query_id": pa.array(self.qid[flat_q], pa.int64()),
                "vec_id": pa.array(ids[flat_i].astype(np.int64), pa.int64()),
                "score_r6": pa.array(
                    np.round(scores[flat_i, flat_q], 6), pa.float64()
                ),
            }
        )


def ann_topk_reduce(group: pd.DataFrame, k: int) -> pd.DataFrame:
    """Final per-query reduce: rank by (rounded score desc, vec_id asc)."""
    if len(group) == 0 or "query_id" not in group.columns:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "vec_id": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
            }
        )
    g = group.sort_values(
        ["score_r6", "vec_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pd.DataFrame(
        {
            "query_id": g["query_id"].to_numpy(),
            "vec_id": g["vec_id"].to_numpy(),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
        }
    )
