"""Named-query registry: every implemented pipeline, one callable per
name, each taking an ``sf_dir`` and returning a Dataset (or a small
DataFrame for driver-sized results).

Single source of truth: ``__ray_entry__.queries()`` (the graft driver
contract) and the ``engine query`` CLI both resolve names here. Oracle
SQL twins live in ``__ray_entry__.oracle_sql()``.
"""

from collections.abc import Callable
from typing import Any


def queries() -> dict[str, Callable[[str], Any]]:
    from .pipelines import corpus, curate, geo, graph, knn, relational, tiles, web

    # Ordering matters: the graft driver's CORRECTNESS window covers the
    # FIRST 50 entries (dict order); see the window comment inside.
    return {
        # --- round-5 window (first 50; driver verifies dict order) ------
        # Final-round rotation (VERDICT r04 #2/#3): IN the window is
        # everything whose last driver-green row is round 3 or that has
        # never had one (dedup_incremental — ADVICE r04; pagerank_edges —
        # new this round), plus the byte-exact flagship-evidence core that
        # keeps a driver row every round. Everything driver-green in
        # round 4 (web family, pagerank, the round-4 additions, the
        # relational block, cell_agg_s2, knn_cells) drops below the
        # cutoff, so the union of CORRECTNESS_r04 + r05 covers the whole
        # registry. The tail stays pytest-pinned to its DuckDB oracles.
        "pagerank_edges": graph.pagerank_edges,
        "dedup_incremental": corpus.dedup_incremental,
        "top_grid_cells": geo.top_grid_cells,
        "dedup_exact_pages": corpus.dedup_exact_pages,
        "dedup_clusters": corpus.dedup_clusters,
        "near_dup_simhash": corpus.near_dup_pairs_simhash,
        "near_dup_jaccard": corpus.near_dup_pairs_jaccard,
        "dedup_canonical": corpus.dedup_canonical,
        "ann_topk": corpus.ann_topk,
        "ann_topk_filtered": corpus.ann_topk_filtered,
        "ann_topk_ivf": corpus.ann_topk_ivf,
        "embedding_near_dup": corpus.embedding_near_dup,
        "label_centroids": corpus.label_centroids,
        "media_features": corpus.media_features,
        "media_resize": corpus.media_resize,
        "audio_frames": corpus.audio_frames,
        "video_frames": corpus.video_frames,
        "train_test_split": curate.train_test_split,
        "sample_stratified": curate.sample_stratified,
        "sample_k_per_stratum": curate.sample_k_per_stratum,
        "vocab_top_tokens": curate.vocab_top_tokens,
        "tfidf_top_terms": curate.tfidf_top_terms,
        "pack_sequences": curate.pack_sequences,
        "chunk_documents": curate.chunk_documents,
        "decontaminate": corpus.decontaminate,
        "repetition_signals": corpus.repetition_signals,
        "mix_sources": curate.mix_sources,
        "embed_quantize": corpus.embed_quantize,
        "token_counts": corpus.token_counts,
        "quality_scores": corpus.quality_scores,
        "lang_id": corpus.lang_id,
        "fingerprints": corpus.fingerprints,
        "cell_agg_h8": geo.cell_agg_h8,
        "rect_join_semi": lambda sf: geo.rect_join(sf, mode="semi"),
        "rect_join_anti": lambda sf: geo.rect_join(sf, mode="anti"),
        "pip_join_semi": lambda sf: geo.pip_join(sf, mode="semi"),
        "pip_join_anti": lambda sf: geo.pip_join(sf, mode="anti"),
        "knn": knn.knn,
        "render_tiles": tiles.render_tiles,
        "color_tiles": tiles.color_tiles,
        # byte-exact flagship evidence + north-rule geospatial core:
        # these keep a driver row EVERY round
        "render_tiles_content": tiles.render_tiles_content,
        "color_tiles_content": tiles.color_tiles_content,
        "geocode": geo.geocode_query,
        "grid_cell_agg": geo.grid_cell_agg,
        "cell_agg_salted_h8": lambda sf: geo.cell_agg_salted(sf, "h3_r8"),
        "rect_join": geo.rect_join,
        "pip_join": geo.pip_join,
        "curate_corpus": curate.curate_corpus,
        "near_dup_minhash": corpus.near_dup_pairs_minhash,
        "dedup_exact_docs": corpus.dedup_exact_docs,
        # ---- driver window cutoff (entry 50) ----------------------------
        # everything below was driver-green in round 4 (CORRECTNESS_r04)
        # and stays pinned to its DuckDB/golden oracle in every pytest run
        "extract_text": web.extract_text,
        "host_stats": web.host_stats,
        "latest_page_snapshot": web.latest_page_snapshot,
        "url_canonical_dedup": web.url_canonical_dedup,
        "pagerank": graph.pagerank,
        "ann_topk_ivf_fullprobe": corpus.ann_topk_ivf_fullprobe,
        "embedding_near_dup_exact": corpus.embedding_near_dup_exact,
        "cap_per_source": curate.cap_per_source,
        "length_filter_median": curate.length_filter_median,
        "shuffle_shards": curate.shuffle_shards,
        "embedding_dup_clusters": corpus.embedding_dup_clusters,
        "token_counts_bpe": corpus.token_counts_bpe,
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q3_top_orders": relational.q3_top_orders,
        "q5_nation_revenue": relational.q5_nation_revenue,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "q14_promo_revenue": relational.q14_promo_revenue,
        "events_daily": relational.events_daily,
        "events_sliding_window": relational.events_sliding_window,
        "sessionize": relational.sessionize,
        "top_users_by_value": relational.top_users_by_value,
        "distinct_users_per_type": relational.distinct_users_per_type,
        "q10_returned_revenue": relational.q10_returned_revenue,
        "q18_large_orders": relational.q18_large_orders,
        "asof_join_clicks": relational.asof_join_clicks,
        "topk_orders_per_priority": relational.topk_orders_per_priority,
        "value_quantiles_per_type": relational.value_quantiles_per_type,
        "range_join_clicks": relational.range_join_clicks,
        "customer_order_counts": relational.customer_order_counts,
        "event_gaps": relational.event_gaps,
        "users_click_and_purchase": relational.users_click_and_purchase,
        "events_pivot": relational.events_pivot,
        "late_events": relational.late_events,
        "q4_late_shipments": relational.q4_late_shipments,
        "user_running_value": relational.user_running_value,
        "approx_distinct_users_kmv": relational.approx_distinct_users_kmv,
        "events_rollup": relational.events_rollup,
        "users_click_no_purchase": relational.users_click_no_purchase,
        "cell_agg_s2": geo.cell_agg_s2,
        "knn_cells": knn.knn_cells,
    }
