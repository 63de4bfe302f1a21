"""Deduplication operators: exact, MinHash-LSH, SimHash, embedding LSH.

Shuffle discipline (ray_guide "Aggregation at scale"): content hashes are
computed vectorized inside map_batches; the exchange moves only
(hash, key) pairs or per-band signature rows, never document bodies.
Candidate pairs from banding are verified (exact Jaccard / Hamming /
cosine) before being reported.

Hash collisions: exact dedup keys on a 64-bit content hash
(pd.util.hash_array, deterministic across processes); at 10^12 docs the
expected collision count is ~0.03 — documented approximation, exact at
test scale (verified against a GROUP BY text oracle).
"""

import numpy as np
import pandas as pd
import pyarrow as pa

# --- exact dedup ------------------------------------------------------------


def content_hash_batch(key_col, id_col):
    """map_batches fn factory: (id, h64) rows, one per input row."""

    def fn(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch.column(key_col).to_pylist(), dtype=object)
        h = pd.util.hash_array(vals).astype(np.int64)
        return pa.table({id_col: batch.column(id_col), "h64": pa.array(h, pa.int64())})

    return fn


def exact_dedup(ds, key_col="text", id_col="doc_id"):
    """Keep the minimum id per distinct key value. Returns Dataset[id]."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(content_hash_batch(key_col, id_col), batch_format="pyarrow")

    # partial min-per-hash inside each batch, then a tiny groupby
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("h64", as_index=False)[id_col].min()

    part = hashed.map_batches(partial, batch_format="pandas")
    out = part.groupby("h64").aggregate(Min(id_col, alias_name=id_col))
    return out.select_columns([id_col])


# --- MinHash + LSH ----------------------------------------------------------

N_HASHES = 64
N_BANDS = 16  # 16 bands x 4 rows
_ROWS_PER_BAND = N_HASHES // N_BANDS
_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text, n=3):
    """Word n-gram shingle hashes for one document (vectorized per doc)."""
    toks = text.split()
    if len(toks) < n:
        toks = toks + ["\x00"] * (n - len(toks))
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return pd.util.hash_array(np.asarray(grams, dtype=object)).astype(np.uint64)


class MinHashStage:
    """Actor: permutation coefficients generated once per actor (seeded)."""

    def __init__(self, id_col="doc_id", text_col="text", shingle_n=3):
        rng = np.random.default_rng(12345)
        self.a = rng.integers(1, (1 << 61) - 1, N_HASHES, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, N_HASHES, dtype=np.uint64)
        self.id_col = id_col
        self.text_col = text_col
        self.n = shingle_n

    def signature(self, text):
        sh = _shingle_hashes(text, self.n)
        # (shingles, hashes) universal hash, min over shingles
        v = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return v.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_band, out_bh = [], [], []
        P = np.uint64(1099511628211)
        for i, t in zip(ids, texts):
            sig = self.signature(t)
            bands = sig.reshape(N_BANDS, _ROWS_PER_BAND)
            bh = np.zeros(N_BANDS, dtype=np.uint64)
            for c in range(_ROWS_PER_BAND):  # FNV-style fold of the band rows
                bh = bh * P + bands[:, c]
            out_id.extend([i] * N_BANDS)
            out_band.extend(range(N_BANDS))
            out_bh.extend((bh % np.uint64(1 << 63)).astype(np.int64).tolist())
        return pa.table(
            {
                "id": pa.array(out_id),
                "band": pa.array(out_band, pa.int64()),
                "band_hash": pa.array(out_bh, pa.int64()),
            }
        )


def candidate_pairs_from_bands(band_ds):
    """groupby (band, band_hash) -> unique candidate id pairs (a < b)."""

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["id"]))
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        a, b = zip(*[(x, y) for xi, x in enumerate(ids) for y in ids[xi + 1 :]])
        return pd.DataFrame({"id_a": list(a), "id_b": list(b)})

    cand = band_ds.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )

    def departial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates()

    return (
        cand.map_batches(departial, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )


def jaccard(text_a, text_b, n=3):
    """Exact word n-gram Jaccard for verification."""
    ta, tb = text_a.split(), text_b.split()
    sa = set(" ".join(ta[i : i + n]) for i in range(max(1, len(ta) - n + 1)))
    sb = set(" ".join(tb[i : i + n]) for i in range(max(1, len(tb) - n + 1)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# --- SimHash ----------------------------------------------------------------

SIMHASH_BITS = 64
_SIM_BANDS = 4  # hamming <= 3 guarantees >= 1 equal 16-bit band


def simhash_batch(id_col="doc_id", text_col="text"):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        token_lists = [t.split() for t in texts]
        counts = np.asarray([len(t) for t in token_lists], dtype=np.int64)
        flat = [w for toks in token_lists for w in toks]
        sims = np.zeros(len(texts), dtype=np.uint64)
        if flat:
            h = pd.util.hash_array(np.asarray(flat, dtype=object)).astype(np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            ) * 2 - 1
            starts = np.cumsum(counts) - counts
            valid = counts > 0
            if valid.any():
                acc = np.add.reduceat(bits, starts[valid], axis=0)
                sgn = (acc > 0).astype(np.uint64)
                sims[valid] = (sgn << np.arange(64, dtype=np.uint64)[None, :]).sum(
                    axis=1, dtype=np.uint64
                )
        rows_id, rows_band, rows_key, rows_sim = [], [], [], []
        for i, s in zip(ids, sims):
            for b in range(_SIM_BANDS):
                rows_id.append(i)
                rows_band.append(b)
                rows_key.append(int((s >> np.uint64(16 * b)) & np.uint64(0xFFFF)))
                rows_sim.append(int(s % (1 << 63)))
        return pa.table(
            {
                "id": pa.array(rows_id),
                "band": pa.array(rows_band, pa.int64()),
                "band_hash": pa.array(rows_key, pa.int64()),
                "simhash": pa.array(rows_sim, pa.int64()),
            }
        )

    return fn


def hamming64(a, b):
    return bin(int(a) ^ int(b)).count("1")


# --- embedding LSH (random hyperplanes) ------------------------------------


class EmbeddingLSHStage:
    """Actor: seeded random hyperplanes; emits (id, bucket) sign-bit keys.

    ``carry_vec=True`` keeps the embedding column in the output so the
    downstream per-bucket verification shuffles vectors alongside their
    keys instead of re-reading them (the distributed near-dup path).
    """

    def __init__(
        self,
        dim=64,
        n_planes=16,
        seed=777,
        id_col="vec_id",
        vec_col="embedding",
        carry_vec=False,
        n_tables=1,
    ):
        rng = np.random.default_rng(seed)
        # n_tables independent plane sets: near-dup pairs missed by one
        # table (a sign flip near a hyperplane) are caught by another —
        # classic multi-table LSH recall boost
        self.planes = rng.standard_normal((n_tables, dim, n_planes))
        self.id_col = id_col
        self.vec_col = vec_col
        self.carry_vec = carry_vec
        self.n_tables = n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch.column(self.vec_col).to_pylist()).astype(np.float64)
        n = len(vecs)
        ids = batch.column(self.id_col)
        out = []
        for t in range(self.n_tables):
            signs = (vecs @ self.planes[t]) > 0
            buckets = np.zeros(n, dtype=np.int64)
            for j in range(self.planes.shape[2]):
                buckets |= signs[:, j].astype(np.int64) << j
            cols = {
                "id": ids,
                "table": pa.array(np.full(n, t, dtype=np.int64)),
                "bucket": pa.array(buckets, pa.int64()),
            }
            if self.carry_vec:
                cols["embedding"] = batch.column(self.vec_col)
            out.append(pa.table(cols))
        return pa.concat_tables(out)


def bucket_cosine_pairs(threshold):
    """map_groups fn: within-bucket exact pairwise cosine >= threshold."""

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"vec_id_a": [], "vec_id_b": []})
        order = np.argsort(group["id"].to_numpy())
        ids = group["id"].to_numpy()[order]
        vecs = np.stack(group["embedding"].to_numpy()[order]).astype(np.float64)
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sim = vecs @ vecs.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sim[ia, ib] >= threshold
        return pd.DataFrame({"vec_id_a": ids[ia[keep]], "vec_id_b": ids[ib[keep]]})

    return pairs
