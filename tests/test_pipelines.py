"""End-to-end pipeline tests on sf0.001 (Ray session-scoped, 4 CPUs).

The graft's core conformance contract (SURVEY.md §5): Ray pipeline output
at any parallelism == single-process oracle, uint8-identical tiles, and
extracted text byte-identical per url.
"""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def geo(ray_session):
    from rio_color_ray.pipelines import geo as g

    return g


def test_pages_shape_and_text_identity(ray_session):
    import duckdb

    from rio_color_ray.pipelines.geo import pages

    df = pages(SF).to_pandas()
    assert list(df.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert df["url"].is_unique
    # byte-identical text per url vs the source documents (input_hint invariant)
    src = duckdb.sql(
        f"SELECT 'https://' || source || '.example.com/doc/' || doc_id AS url, text "
        f"FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    m = df.merge(src, on="url", suffixes=("_ray", "_src"))
    assert len(m) == len(df)
    assert (m["text_ray"] == m["text_src"]).all()
    # text is embedded in html verbatim (bytes)
    row = df.iloc[0]
    assert row["text"].encode() in row["html"]


def test_geocode_matches_integer_derivation(ray_session, geo):
    import duckdb

    from rio_color_ray.sources.pages import page_coords_microdeg

    df = geo.geocode_query(SF).to_pandas()
    doc_id = df["url"].str.rsplit("/", n=1).str[1].astype(np.int64).to_numpy()
    lat_u, lon_u = page_coords_microdeg(doc_id)
    # parse(format(x)) must round-trip to the exact double microdeg/1e6
    assert np.array_equal(df["lat"].to_numpy(), lat_u / 1e6)
    assert np.array_equal(df["lon"].to_numpy(), lon_u / 1e6)


def test_cell_agg_salted_equals_plain(ray_session, geo):
    a = geo.cell_agg_salted(SF, "h3_r8").to_pandas().sort_values("h3_r8").reset_index(drop=True)
    b = (
        geo.cell_agg_h8(SF)
        .to_pandas()[["h3_r8", "n_pages"]]
        .sort_values("h3_r8")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[["h3_r8", "n_pages"]], check_dtype=False)
    assert int(a["n_pages"].sum()) == 500  # every page counted exactly once


def test_pip_join_vs_bruteforce(ray_session, geo):
    from rio_color_ray.sources.pages import page_coords_microdeg
    from rio_color_ray.sources.polygons import make_admin_polygons
    from rio_color_ray.spatial import points_in_polygon

    got = geo.pip_join(SF, mode="inner").to_pandas()
    doc_id = np.arange(500)
    lat_u, lon_u = page_coords_microdeg(doc_id)
    lat, lon = lat_u / 1e6, lon_u / 1e6
    expect = set()
    for p in make_admin_polygons():
        inside = points_in_polygon(p["xs"], p["ys"], lon, lat)
        for d in doc_id[inside]:
            expect.add((d, p["admin_id"]))
    got_ids = got["url"].str.rsplit("/", n=1).str[1].astype(int)
    assert set(zip(got_ids, got["admin_id"])) == expect


def test_pip_join_modes_consistent(ray_session, geo):
    inner = geo.pip_join(SF, mode="inner").to_pandas()
    semi = geo.pip_join(SF, mode="semi").to_pandas()
    anti = geo.pip_join(SF, mode="anti").to_pandas()
    left = geo.pip_join(SF, mode="left").to_pandas()
    assert set(semi["url"]) == set(inner["url"])
    assert set(anti["url"]) == set(left["url"]) - set(inner["url"])
    assert len(left) == 500
    matched_left = left[left["admin_id"] >= 0]
    # left keeps the lowest admin_id among matches
    best = inner.groupby("url")["admin_id"].min()
    assert dict(zip(matched_left["url"], matched_left["admin_id"])) == best.to_dict()


def test_color_tiles_match_single_process_oracle(ray_session):
    """Parallel Ray output == serial oracle, uint8-identical (the graft's
    analog of rio-color's -j1 vs -j2 test, reference tests/test_cli.py:19-81)."""
    from rio_color_ray.color import parse_operations, scale_dtype, to_math_type
    from rio_color_ray.pipelines.tiles import DEFAULT_OPS, color_tiles, render_tiles
    from rio_color_ray.sources.tiles import decode_tile

    raw = {r["tile_id"]: r for r in render_tiles(SF).to_pandas().to_dict("records")}
    corrected = color_tiles(SF).to_pandas()
    assert len(corrected) == len(raw)
    ops = parse_operations(DEFAULT_OPS)
    for r in corrected.to_dict("records"):
        src = raw[r["tile_id"]]
        arr = to_math_type(
            decode_tile(src["pixels"], src["band_count"], src["dtype"], 32, 32)
        )
        for fn in ops:
            arr = fn(arr)
        expect = scale_dtype(arr, "uint8")
        got = decode_tile(r["pixels"], r["band_count"], r["dtype"], 32, 32)
        assert np.array_equal(got, expect), r["tile_id"]


def test_render_tiles_deterministic(ray_session):
    from rio_color_ray.pipelines.tiles import render_tiles

    a = render_tiles(SF).to_pandas().sort_values("tile_id").reset_index(drop=True)
    b = render_tiles(SF).to_pandas().sort_values("tile_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # conservation: every geocoded page lands in exactly one tile pixel
    from rio_color_ray.sources.tiles import decode_tile

    total = 0
    for r in a.to_dict("records"):
        px = decode_tile(r["pixels"], r["band_count"], r["dtype"], 32, 32)
        # band 1 is the occupancy mask; band 0 is log density — recover
        # counts only where exactly one page landed (b0 == 32)
        total += int((px[1] == 255).sum())
    assert total >= 300  # 500 pages minus pixel-collisions inside hotspots


def test_actor_pool_and_task_pool_paths_identical(ray_session):
    """use_actors=True (dedicated actor pools) must produce exactly the
    same tiles as the default fused task-pool path."""
    from rio_color_ray.pipelines.flagship import flagship

    a = (
        flagship(SF, use_actors=True, concurrency=2)
        .to_pandas()
        .sort_values("tile_id")
        .reset_index(drop=True)
    )
    b = (
        flagship(SF, use_actors=False)
        .to_pandas()
        .sort_values("tile_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_color_tiles_content_vs_sql_oracle(ray_session):
    """The LUT-based DuckDB twin reproduces the colored pixel bytes."""
    import duckdb

    import pandas as pd
    from rio_color_ray.pipelines.tiles import (
        band_uniform_lut,
        color_tiles_content,
        color_tiles_content_sql,
    )

    lut = band_uniform_lut()
    assert lut[0] == 0 and len(lut) == 256
    assert (pd.Series(lut).diff().dropna() >= 0).all()  # monotone program

    rdf = color_tiles_content("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    odf = con.sql(color_tiles_content_sql()).df()
    cols = sorted(rdf.columns)
    assert cols == sorted(odf.columns)
    a = rdf[cols].sort_values(["tile_id"]).reset_index(drop=True)
    b = odf[cols].sort_values(["tile_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_top_grid_cells_vs_sql_oracle(ray_session, geo):
    """top_grid_cells moved below the driver's 50-entry window in round 4
    (evicted to admit ann_topk_ivf_fullprobe) — this pin keeps it
    value-exact against its DuckDB twin every pytest run."""
    import duckdb

    import pandas as pd
    from __ray_entry__ import oracle_sql

    rdf = geo.top_grid_cells(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    odf = con.sql(oracle_sql()["top_grid_cells"]).df()
    cols = sorted(rdf.columns)
    assert cols == sorted(odf.columns)
    a = rdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_knn_vs_sql_oracle(ray_session):
    """knn (brute) moved below the driver's 50-entry window in round 4
    (evicted to admit embedding_near_dup_exact) — this pin keeps it
    value-exact against its DuckDB twin every pytest run, alongside the
    existing numpy brute-force oracle in tests/test_corpus.py."""
    import duckdb

    import pandas as pd
    from __ray_entry__ import oracle_sql, queries

    rdf = queries()["knn"](SF)
    if not isinstance(rdf, pd.DataFrame):
        rdf = rdf.to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    odf = con.sql(oracle_sql()["knn"]).df()
    cols = sorted(rdf.columns)
    assert cols == sorted(odf.columns)
    a = rdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_embedding_near_dup_exact_matches_ground_truth(ray_session):
    """The recall-1.0 entry really is exact: engine pairs == the
    all-pairs cosine ground truth at test scale (both planted-pair
    complete and free of extras)."""
    import duckdb

    import pandas as pd
    from __ray_entry__ import oracle_sql, queries

    rdf = queries()["embedding_near_dup_exact"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    odf = con.sql(oracle_sql()["embedding_near_dup_exact"]).df()
    cols = ["vec_id_a", "vec_id_b"]
    a = rdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_registry_driver_window_keeps_key_oracles():
    """The graft driver value-verifies only the FIRST 50 queries()
    entries: inserting a new query above these must not silently evict
    the pinned set from the verified window. Round-5 (final) rotation
    (VERDICT r04 #2/#3): the pinned set is (a) entries that have never
    had a driver row — pagerank_edges (new) and dedup_incremental,
    (b) the whole round-3-green tail (LLM dedup/ANN/curation/multimodal
    families, geo variants), so the union of CORRECTNESS_r04 + r05
    covers every registry entry, and (c) the every-round core:
    byte-exact tile-content twins + the north-rule geospatial path."""
    from rio_color_ray.registry import queries

    window = list(queries())[:50]
    for name in (
        # never driver-verified before this round
        "pagerank_edges",
        "dedup_incremental",
        # last driver-green in round 3 — the final-round sweep must
        # re-verify them so no entry's last hard signal is >1 round old
        "top_grid_cells",
        "dedup_clusters",
        "near_dup_simhash",
        "near_dup_jaccard",
        "ann_topk",
        "embedding_near_dup",
        "media_features",
        "train_test_split",
        "vocab_top_tokens",
        "pack_sequences",
        "decontaminate",
        "mix_sources",
        "token_counts",
        "lang_id",
        "cell_agg_h8",
        "pip_join_semi",
        "knn",
        "render_tiles",
        "color_tiles",
        # every-round core
        "color_tiles_content",
        "render_tiles_content",
        "geocode",
        "grid_cell_agg",
        "cell_agg_salted_h8",
        "rect_join",
        "pip_join",
        "curate_corpus",
        "near_dup_minhash",
        "dedup_exact_docs",
    ):
        assert name in window, f"{name} fell out of the driver's 50-entry window"

    # the round-4-green families must still be registered (pytest-pinned
    # below the cutoff), just not re-verified by the driver this round
    tail = list(queries())[50:]
    for name in ("extract_text", "pagerank", "q1_pricing_summary",
                 "cell_agg_s2", "knn_cells", "token_counts_bpe"):
        assert name in tail, f"{name} missing from the registry tail"


def test_embedding_dup_clusters_matches_reachability(ray_session):
    """CC over the exact-config embedding near-dup pairs == recursive
    reachability over the all-pairs cosine ground truth, including
    singleton labeling and the (node, key=min-endpoint) edge encoding."""
    import duckdb

    import pandas as pd
    from __ray_entry__ import oracle_sql, queries

    rdf = queries()["embedding_dup_clusters"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    odf = con.sql(oracle_sql()["embedding_dup_clusters"]).df()
    cols = ["vec_id", "cluster_id"]
    a = rdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    # the planted configuration: every base vector pairs with exactly its
    # jittered replica -> every cluster has exactly 2 members
    sizes = rdf.groupby("cluster_id").size()
    assert (sizes == 2).all() and len(sizes) * 2 == len(rdf)


def test_assemble_bucket_empty_range():
    """A boundary-partitioned exchange can hand the assemble fn an empty
    block (an unpopulated bucket range at sparse zooms); it must return
    the full tile schema with zero rows, not crash or emit a schemaless
    table that would poison the downstream union."""
    import pyarrow as pa

    from rio_color_ray.pipelines.tiles import _assemble_bucket

    empty = pa.table(
        {
            "tile_key": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.int64()),
            "pix": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )
    out = _assemble_bucket(empty)
    assert out.num_rows == 0
    assert out.column_names == [
        "tile_id", "z", "x", "y", "band_count", "dtype",
        "width", "height", "pixels",
    ]


def test_read_table_strips_schema_metadata(ray_session):
    """io.read_table blocks must carry NO pandas schema metadata — the
    raw parquet schema is unhashable (pyarrow raises on the embedded
    pandas dict) and triggers Ray's per-concat schema-hash warning in
    every reduce downstream."""
    import pyarrow.parquet as pq

    from rio_color_ray.io import read_table

    raw = pq.read_schema(f"{SF}/documents.parquet")
    assert raw.metadata  # the testdata really does embed pandas metadata
    ds = read_table(SF, "documents", columns=["doc_id"])
    batch = next(iter(ds.iter_batches(batch_format="pyarrow", batch_size=4)))
    assert batch.schema.metadata is None
    hash(batch.schema)  # hashable now — the property the fix exists for
