"""Web-corpus page operators vs their DuckDB oracle twins.

Parametrized over sf0.001 AND sf0.01 (BASELINE.md's claim; ADVICE r04) —
both corpora have 500 documents, so the structural asserts hold at both
while the oracle compare exercises two distinct document tables.
"""

import pytest

from conftest import SF_CORRECT, SF_SMOKE, duckdb_con, oracle_check


@pytest.fixture(scope="module", params=[SF_SMOKE, SF_CORRECT])
def SF(request):
    return request.param


@pytest.fixture(scope="module")
def con(SF):
    return duckdb_con(sf=SF)


@pytest.fixture(scope="module")
def cte():
    from rio_color_ray.sources.pages import pages_sql_cte

    return pages_sql_cte()


def test_extract_text_byte_identical(ray_session, con, cte, SF):
    """Extraction from html bytes reproduces the source text column —
    the input_hint's byte-identical-text-per-url invariant, value-checked
    against an oracle that never touches the html."""
    from rio_color_ray.pipelines import web

    out = oracle_check(web.extract_text(SF), con, web.extract_text_sql(cte))
    assert len(out) == 500
    assert out["text"].notna().all()


def test_host_stats(ray_session, con, cte, SF):
    from rio_color_ray.pipelines import web

    out = oracle_check(web.host_stats(SF), con, web.host_stats_sql(cte))
    # one host per documents.source; counts cover the whole corpus
    assert out["n_pages"].sum() == 500
    assert (out["n_langs"] >= 1).all()


def test_latest_page_snapshot(ray_session, con, cte, SF):
    from rio_color_ray.pipelines import web

    out = oracle_check(
        web.latest_page_snapshot(SF), con, web.latest_page_snapshot_sql(cte)
    )
    # 4 crawls per canonical page; the kept doc is the group max
    assert len(out) == 125
    assert (out["canon_id"] % 4 == 0).all()
    kept = out["url"].str.extract(r"/doc/(\d+)$")[0].astype(int)
    assert (kept - kept % 4 == out["canon_id"]).all()
    assert (kept % 4 == 3).all()  # warc_ts increases with doc_id


def test_url_canonical_dedup(ray_session, con, cte, SF):
    from rio_color_ray.pipelines import web

    out = oracle_check(
        web.url_canonical_dedup(SF), con, web.url_canonical_dedup_sql(cte)
    )
    # every page keeps its canonical url; variant multiplicity is
    # 1 + (odd) + (div by 3): doc_id 0 -> 2, 1 -> 2, 3 -> 3, 2 -> 1
    assert len(out) == 500
    got = dict(
        zip(
            out["canon_url"].str.extract(r"/doc/(\d+)$")[0].astype(int),
            out["n_variants"],
        )
    )
    assert got[0] == 2 and got[1] == 2 and got[2] == 1 and got[3] == 3


def test_extract_text_handles_markup_in_text(ray_session):
    """A text body containing html-looking bytes must survive extraction
    unchanged (the regex anchors on the document tail, not the first
    closing tag)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rio_color_ray.pipelines import web
    from rio_color_ray.sources.pages import synth_pages_batch

    tricky = 'a</p></body></html> trap <p>b\nline2'
    batch = pa.table(
        {
            "doc_id": pa.array([7], pa.int64()),
            "source": ["srcX"],
            "text": [tricky],
            "lang": ["en"],
        }
    )
    pages = synth_pages_batch(batch)
    hits = pc.extract_regex(pc.cast(pages.column("html"), pa.string()), web._TEXT_RE)
    assert pc.struct_field(hits, "text").to_pylist() == [tricky]
