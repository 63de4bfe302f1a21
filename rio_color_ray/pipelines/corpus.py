"""Corpus pipelines: dedup, text analysis, similarity search.

Every function takes sf_dir and returns a Dataset (or small DataFrame for
driver-side reduces); oracle SQL lives in __ray_entry__.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..sources.pages import REP_STRIDE
from ..stages.ann import AnnBruteStage, ann_topk_reduce
from ..stages.dedup import (
    EmbeddingLSHStage,
    MinHashStage,
    candidate_pairs_from_bands,
    exact_dedup,
    hamming64,
    jaccard,
    simhash_batch,
)
from ..stages.text import (
    LangIdStage,
    fingerprint_batch,
    quality_batch,
    token_count_batch,
)
from .geo import pages


def documents(sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


# --- text analysis ----------------------------------------------------------


def token_counts(sf_dir):
    return documents(sf_dir).map_batches(token_count_batch, batch_format="pyarrow")


def quality_scores(sf_dir):
    return documents(sf_dir).map_batches(quality_batch, batch_format="pyarrow")


def lang_id(sf_dir, concurrency=4):
    return documents(sf_dir).map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=(1, concurrency)
    )


def fingerprints(sf_dir):
    return documents(sf_dir).map_batches(fingerprint_batch, batch_format="pyarrow")


# --- dedup ------------------------------------------------------------------


def dedup_exact_docs(sf_dir):
    """Min doc_id per distinct text (trivially all-keep on this corpus —
    the oracle still verifies the machinery value-for-value)."""
    return exact_dedup(documents(sf_dir), key_col="text", id_col="doc_id")


def dedup_exact_pages(sf_dir, replicate=3):
    """Min url per distinct text over a corpus with real duplicates.

    With replication, every text occurs `replicate` times under distinct
    urls — the dedup keeps exactly one url per text (lexicographic min).
    """
    ds = pages(sf_dir, replicate=replicate).select_columns(["url", "text"])
    return exact_dedup(ds, key_col="text", id_col="url")


def near_dup_pairs_minhash(sf_dir, replicate=2, threshold=0.8, concurrency=4):
    """MinHash-LSH near-duplicate url pairs over the replicated corpus.

    Pipeline: signatures+banding (actor pool) -> groupby (band, band_hash)
    -> candidate pairs -> exact Jaccard verification against the
    broadcast text of the candidate urls. Returns Dataset[url_a, url_b]
    with verified jaccard >= threshold.
    """
    ds = pages(sf_dir, replicate=replicate).select_columns(["url", "text"])
    bands = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"id_col": "url", "text_col": "text"},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )
    cand = candidate_pairs_from_bands(bands).to_pandas()

    if cand.empty:
        return pd.DataFrame({"url_a": [], "url_b": []})

    # verification: fetch texts of candidate urls only (semi-join filter)
    need = set(cand["id_a"]) | set(cand["id_b"])

    def keep(batch: pa.Table) -> pa.Table:
        mask = np.asarray([u in need for u in batch.column("url").to_pylist()])
        return batch.filter(pa.array(mask))

    texts = dict(
        ds.map_batches(keep, batch_format="pyarrow")
        .to_pandas()[["url", "text"]]
        .itertuples(index=False, name=None)
    )
    ok = [
        jaccard(texts[a], texts[b]) >= threshold
        for a, b in zip(cand["id_a"], cand["id_b"])
    ]
    out = cand[np.asarray(ok)].rename(columns={"id_a": "url_a", "id_b": "url_b"})
    return out.sort_values(["url_a", "url_b"]).reset_index(drop=True)


def near_dup_pairs_simhash(sf_dir, replicate=2, max_hamming=3):
    """SimHash near-dup url pairs (banded 16-bit keys, verified Hamming)."""
    ds = pages(sf_dir, replicate=replicate).select_columns(["url", "text"])
    bands = ds.map_batches(
        simhash_batch(id_col="url", text_col="text"), batch_format="pyarrow"
    )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(group["id"], group["simhash"])))
        out_a, out_b = [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if hamming64(rows[i][1], rows[j][1]) <= max_hamming:
                    out_a.append(rows[i][0])
                    out_b.append(rows[j][0])
        return pd.DataFrame({"url_a": out_a, "url_b": out_b})

    cand = bands.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pandas")
    out = cand.to_pandas().drop_duplicates()
    return out.sort_values(["url_a", "url_b"]).reset_index(drop=True)


# --- similarity search ------------------------------------------------------


def _query_vectors(sf_dir, n_queries):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = t.column("vec_id").to_numpy()
    sel = vid < n_queries
    mat = np.stack(np.asarray(t.column("embedding").to_pylist(), dtype=object)[sel])
    return vid[sel], mat.astype(np.float64)


def ann_topk(sf_dir, k=10, n_queries=8, concurrency=4):
    """Exact brute-force cosine top-k (query side broadcast)."""
    qid, qmat = _query_vectors(sf_dir, n_queries)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    partial = ds.map_batches(
        AnnBruteStage,
        fn_constructor_args=(qid, qmat, k),
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )
    return partial.groupby("query_id").map_groups(
        lambda g: ann_topk_reduce(g, k), batch_format="pandas"
    )


def embedding_buckets(sf_dir, concurrency=2):
    """LSH bucket assignment for every embedding (the ANN scale path's
    partitioning key; same-bucket ids are near-dup candidates)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return ds.map_batches(
        EmbeddingLSHStage, batch_format="pyarrow", concurrency=(1, concurrency)
    )


def embedding_near_dup(sf_dir, threshold=0.95):
    """Embedding near-dup pairs: LSH buckets -> within-bucket exact cosine."""
    buckets = embedding_buckets(sf_dir).to_pandas()
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vecs = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    by_id = dict(zip(t.column("vec_id").to_numpy(), range(len(vecs))))

    out_a, out_b = [], []
    for _, grp in buckets.groupby("bucket"):
        ids = sorted(grp["id"])
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                va, vb = vecs[by_id[ids[i]]], vecs[by_id[ids[j]]]
                if float(va @ vb) >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
    return (
        pd.DataFrame({"vec_id_a": out_a, "vec_id_b": out_b})
        .drop_duplicates()
        .sort_values(["vec_id_a", "vec_id_b"])
        .reset_index(drop=True)
    )
