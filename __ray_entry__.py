"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship spatial pipeline on sf0.001;
``queries()`` exposes every implemented operator/pipeline from
SURVEY.md §2 as ``name -> fn(sf_dir) -> Dataset``; ``oracle_sql()``
gives the DuckDB mirror for each SQL-expressible query (same column
names; floats rounded identically in both engines; spatial math
mirrored bit-exactly — see plasmap_ray.oracle).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` anywhere in the import graph.
"""

from __future__ import annotations

import sys
import os
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from plasmap_ray import fixtures, golden, oracle, queryast  # noqa: E402
from plasmap_ray.stages import sketch  # noqa: E402
from plasmap_ray.pipelines import ann, bpe, cluster, dedup, denormalize, hotspot, images, index, multimodal, privacy, raster, relational, routing, snap, spatial, stats, text, trajectory, windows  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"

KNN_K = 3
RADIUS_DEG = 0.05
TILE_Z = 12
ANN_K = 10
ANN_QUERY_ID = 1
EMB_NEARDUP_T = 0.40  # pairs above this are "near" in this corpus (max sim ~0.48)
EMB_TOP_PAIRS = 20
SEARCH_TOKENS = ("spark", "data")  # TF-IDF ranked-search query terms
SEARCH_K = 20
HH_K = 20  # heavy-hitter top-k
MULTI_VEC_IDS = (1, 2, 3, 4, 5, 6, 7, 8)  # batched-ANN query set
BLOOM_N, BLOOM_FP, BLOOM_PARTS = 1000, 0.01, 32  # reference budget, Queries.scala:297

# AST demo constants (the three canonical queries of SURVEY.md §7.2 #11)
AST_PT = (6.5561, 51.0423)  # a point inside Essenheim / Essenheim-d5
AST_K = 5
SEARCH_TOKEN = "spark"
# tile containing many fixture points, z=10 (computed from the kernel)
from plasmap_ray import tiles as _tiles  # noqa: E402
import numpy as _np  # noqa: E402

_tx, _ty = _tiles.tile_xy(_np.array([AST_PT[0]]), _np.array([AST_PT[1]]), 10)
AST_TILE = (10, int(_tx[0]), int(_ty[0]))

from plasmap_ray import cells as _cells  # noqa: E402

# coarse quadtree cell (precision 6) for the prefix range-scan query
PREFIX_CELL = int(_cells.encode(_np.array([6.55]), _np.array([51.0]), 6)[0])


def _ast_ctx(sf_dir: str) -> "queryast.EngineContext":
    import pyarrow.parquet as pq

    from plasmap_ray import fixtures as _fx

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    import pyarrow as _pa

    points = _pa.table(
        {
            "doc_id": _pa.array(ids, type=_pa.int64()),
            "lon": _pa.array(_fx.derive_lon(ids)),
            "lat": _pa.array(_fx.derive_lat(ids)),
        }
    )
    return queryast.EngineContext(points=points)


def entry() -> Any:
    """Flagship pipeline: points -> cell index -> PiP join -> kNN ->
    tiling aggregate, on sf0.001."""
    return spatial.flagship_pipeline(SF0001)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # --- spatial core (cell index / tiles / PiP / kNN) ---
        "cell_index": spatial.cell_index_pipeline,
        "theil_decomposition": spatial.theil_decomposition,
        "segregation_index": spatial.segregation_index,
        "s2_cell_index": spatial.s2_cell_index_pipeline,
        "s2_cell_histogram": spatial.s2_cell_histogram_pipeline,
        "hex_bin_index": spatial.hex_bin_index_pipeline,
        "hex_hot_cells": spatial.hex_hot_cells_pipeline,
        "kmeans_clusters": ann.kmeans_embeddings,
        "pca_project": ann.pca_project,
        "pca_explained_variance": ann.pca_explained_variance,
        "semantic_dedup": ann.semantic_dedup,
        "zone_embedding_centroid": ann.zone_embedding_centroid,
        "zone_embedding_dispersion": ann.zone_embedding_dispersion,
        "embedding_label_outliers": ann.embedding_label_outliers,
        "zone_label_purity": ann.zone_label_purity,
        "kmeans_cluster_sizes": ann.kmeans_cluster_sizes,
        "simplified_silhouette": ann.simplified_silhouette,
        "sq8_quantization_error": ann.sq8_quantization_error,
        "cluster_label_confusion": ann.cluster_label_confusion,
        "knn_classify": ann.knn_classify,
        "knn_pr_curve": ann.knn_pr_curve,
        "tile_assign": lambda sf: spatial.tile_assign_pipeline(sf, z=TILE_Z),
        "tile_histogram": spatial.tile_histogram_pipeline,
        "tile_histogram_salted": lambda sf: spatial.tile_histogram_pipeline(sf, salted=True),
        "tile_pyramid": lambda sf: spatial.tile_pyramid_pipeline(sf, z_base=10, z_top=6),
        "incremental_tile_counts": spatial.incremental_tile_counts,
        "tile_gini": spatial.tile_gini,
        "quadtree_leaves": lambda sf: spatial.quadtree_leaves(sf, z_top=6, z_base=10),
        "spatial_split": spatial.spatial_split,
        "pip_join": spatial.pip_join_pipeline,
        "pip_join_shuffle": spatial.pip_join_shuffle_pipeline,
        "pip_join_strtree": spatial.pip_join_strtree,
        "pip_join_auto": spatial.pip_join_auto,
        "pip_count": spatial.pip_count_pipeline,
        "pip_anti_join": spatial.pip_anti_join_pipeline,
        "zone_overlap_point_counts": spatial.zone_overlap_point_counts,
        "zone_overlay_area": lambda sf: spatial.zone_overlay_area(sf),
        "tile_child_coverage": spatial.tile_child_coverage,
        "zone_border_distance": spatial.zone_border_distance,
        "zone_median_center": spatial.zone_median_center,
        "tile_raster": lambda sf: raster.tile_raster_pipeline(sf, z=10),
        "raster_to_vector": lambda sf: raster.raster_to_vector(sf, z=10),
        "raster_focal_mean": lambda sf: raster.raster_focal_mean(sf, z=10),
        "raster_hillshade": lambda sf: raster.raster_hillshade(sf, z=10),
        "flow_accumulation": lambda sf: raster.flow_accumulation(sf, z=10),
        "watershed_basins": lambda sf: raster.watershed_basins(sf, z=10),
        "viewshed": lambda sf: raster.viewshed(sf, z=10),
        "boundary_simplify": raster.boundary_simplify_query,
        "zonal_stats": lambda sf: raster.zonal_stats(sf, z=10),
        "cell_coverage_weights": raster.cell_coverage_weights,
        "areal_interpolation": raster.areal_interpolation,
        "segment_cell_lengths": raster.segment_cell_lengths,
        "cell_prefix_scan": spatial.cell_prefix_scan_pipeline,
        "geohash_strings": spatial.geohash_strings,
        "hilbert_index": spatial.hilbert_index,
        "hilbert_locality_stats": spatial.hilbert_locality_stats,
        "convex_hull_per_area": spatial.convex_hull_per_area,
        # --- routing over the road graph (block-synchronous SSSP) ---
        "sssp_dists": routing.sssp_dists_query,
        "isochrone_bands": routing.isochrone_bands_query,
        "pagerank": routing.pagerank_query,
        "mst_boruvka": routing.mst_boruvka_query,
        "tsp_tours": routing.tsp_tours_query,
        "traffic_assignment": routing.traffic_assignment,
        "betweenness_sampled": routing.betweenness_sampled,
        "harmonic_centrality": routing.harmonic_centrality,
        "percolation_curve": routing.percolation_curve,
        "alt_heuristic_eval": routing.alt_heuristic_eval,
        "bridge_edges": routing.bridge_edges,
        "detour_ratio": routing.detour_ratio,
        "graph_eccentricity": routing.graph_eccentricity,
        "knn_pois": lambda sf: spatial.knn_pipeline(sf, k=KNN_K),
        "knn_pois_shuffle": lambda sf: spatial.knn_shuffle_pipeline(sf, k=KNN_K),
        "knn_pois_auto": lambda sf: spatial.knn_pois_auto(sf, k=KNN_K),
        "radius_join": lambda sf: spatial.radius_pipeline(sf, radius_deg=RADIUS_DEG),
        "poi_in_area": spatial.poi_in_area_pipeline,
        "flagship": spatial.flagship_pipeline,
        # --- query AST / planner (PMQuery -> pipeline; QueryTranslator) ---
        "ast_containing_areas": lambda sf: queryast.translate(
            queryast.from_json(queryast.to_json(queryast.ContainingAreas(*AST_PT))), _ast_ctx(sf)
        ),
        "ast_nearest_pois": lambda sf: queryast.translate(queryast.NearestPois(*AST_PT, k=AST_K), _ast_ctx(sf)),
        "ast_features_in_tile": lambda sf: queryast.translate(queryast.FeaturesInTile(*AST_TILE), _ast_ctx(sf)),
        "ast_districts_of_area": lambda sf: queryast.translate(
            queryast.DistrictsOfArea(queryast.AreaByName("Essenheim")), _ast_ctx(sf)
        ),
        "ast_pois_near_point": lambda sf: queryast.translate(
            queryast.PoisNearPoint(*AST_PT, radius_deg=0.2, category="cafe"), _ast_ctx(sf)
        ),
        "ast_explain": lambda sf: queryast.explain(
            queryast.PoisInArea(queryast.DistrictsOfArea(queryast.AreaByName("Essenheim")), "cafe")
        ),
        "ast_pois_in_area": lambda sf: queryast.translate(
            queryast.PoisInArea(queryast.AreaByName("Duisheim"), "restaurant"), _ast_ctx(sf)
        ),
        # typed area ladder (CityQuery / DistrictQuery analogues)
        "ast_city_of_point": lambda sf: queryast.translate(
            queryast.from_json(queryast.to_json(queryast.TypedAreaAt("city", *AST_PT))), _ast_ctx(sf)
        ),
        "ast_district_of_point": lambda sf: queryast.translate(
            queryast.TypedAreaAt("district", *AST_PT), _ast_ctx(sf)
        ),
        # --- denormalization DAG (ways->rings->polygons, J1/J2) ---
        "way_assembly": denormalize.way_assembly_query,
        "way_lengths": denormalize.way_lengths_query,
        "zone_way_length": denormalize.zone_way_length_query,
        "way_junctions": denormalize.way_junctions_query,
        "boundary_assembly": denormalize.boundary_assembly_query,
        "boundary_stats": denormalize.boundary_stats_query,
        "boundary_geodesic_area": denormalize.boundary_geodesic_area_query,
        # --- relational / aggregation ---
        "pricing_summary": relational.pricing_summary,
        "referential_integrity": relational.referential_integrity,
        "association_rules": relational.association_rules,
        "duplicate_orders": relational.duplicate_orders,
        "orders_by_nation": relational.orders_by_nation,
        "part_cooccurrence": relational.part_cooccurrence,
        "topk_orders_per_customer": relational.topk_orders_per_customer,
        "filtered_part_stats": relational.filtered_stats,
        "top_unshipped_orders": relational.top_unshipped_orders,
        "customer_high_value_counts": relational.customer_high_value_counts,
        "part_price_stats": relational.part_price_stats,
        "local_supplier_volume": relational.local_supplier_volume,
        "nation_trade_volume": relational.nation_trade_volume,
        "returned_revenue": relational.returned_revenue,
        "promo_revenue": relational.promo_revenue,
        "large_orders": relational.large_orders,
        "order_priority_counts": relational.order_priority_counts,
        "skyline_parts": relational.skyline_parts,
        "forecast_revenue": relational.forecast_revenue,
        "market_share": relational.market_share,
        "important_parts": relational.important_parts,
        "line_priority_counts": relational.line_priority_counts,
        "customer_distribution": relational.customer_distribution,
        "top_supplier": relational.top_supplier,
        "small_quantity_revenue": relational.small_quantity_revenue,
        "disjunctive_revenue": relational.disjunctive_revenue,
        "exclusive_return_suppliers": relational.exclusive_return_suppliers,
        "idle_customers": relational.idle_customers,
        "min_cost_supplier": relational.min_cost_supplier,
        "product_profit": relational.product_profit,
        "supplier_part_variety": relational.supplier_part_variety,
        "dominant_part_suppliers": relational.dominant_part_suppliers,
        "revenue_rollup": relational.revenue_rollup,
        "customer_value_rank": relational.customer_value_rank,
        "blame_suppliers": relational.blame_suppliers,
        "window_distinct_users": windows.window_distinct_users,
        "bloom_semi_join": relational.bloom_semi_join,
        "hourly_gap_fill": windows.hourly_gap_fill,
        # --- stream-shaped ---
        "tumbling_window": windows.tumbling_window,
        "daily_cusum": windows.daily_cusum,
        "sessionize": windows.sessionize,
        "sliding_window": windows.sliding_window,
        "sampled_event_stats": windows.sampled_event_stats,
        "late_event_stats": windows.late_event_stats,
        "asof_join": windows.asof_join_purchases,
        "range_join_campaigns": windows.range_join_campaigns,
        "session_campaign_overlap": windows.session_campaign_overlap,
        "winsorize_stats": stats.winsorize_stats,
        "event_type_rates": windows.event_type_rates,
        "conversion_funnel": windows.conversion_funnel,
        "events_union": windows.union_event_streams,
        "distinct_users": windows.distinct_users,
        "value_quantiles": stats.value_quantiles,
        "hist_quantile_eval": stats.hist_quantile_eval,
        "hill_tail_index": stats.hill_tail_index,
        "event_value_quantiles": stats.event_value_quantiles,
        "interpolated_quantiles": stats.interpolated_quantiles,
        "mad_robust_stats": stats.mad_robust_stats,
        "value_concentration": stats.value_concentration,
        "hour_type_pivot": stats.hour_type_pivot,
        "corpus_summary": stats.corpus_summary,
        "distinct_users_approx": windows.distinct_users_approx,
        "count_min_eval": windows.count_min_eval,
        "distinct_users_hll": windows.distinct_users_hll,
        "seasonal_decompose": windows.seasonal_decompose,
        "time_to_convert": windows.time_to_convert,
        "value_percent_rank": windows.value_percent_rank,
        "kaplan_meier": windows.kaplan_meier,
        "did_uplift": windows.did_uplift,
        "event_transition_lift": windows.event_transition_lift,
        # --- text analysis ---
        "token_stats": text.token_stats,
        "readability_scores": text.readability_scores,
        "mtld_diversity": text.mtld_diversity,
        "heaps_law": text.heaps_law,
        "sequence_packing": text.sequence_packing,
        "corpus_flagship": text.corpus_flagship,
        "shuffled_packing": text.shuffled_packing,
        "token_budget_sample": text.token_budget_sample,
        "packing_stats": text.packing_stats,
        "length_bucket_padding": text.length_bucket_padding,
        "vocab_coverage_curve": text.vocab_coverage_curve,
        "bpe_merges": bpe.bpe_merges,
        "bpe_encode_stats": bpe.bpe_encode_stats,
        "lang_histogram": text.lang_histogram,
        "text_quality": text.quality_pipeline,
        "langid_confusion": text.langid_confusion,
        "redact_pii": text.redact_pii,
        "gopher_rules": text.gopher_rules,
        "naive_bayes_domain": text.naive_bayes_domain,
        "huffman_code_lengths": text.huffman_code_lengths,
        "good_turing_unseen": text.good_turing_unseen,
        "stratified_kfold": text.stratified_kfold,
        "word_burstiness": text.word_burstiness,
        "ams_f2_eval": text.ams_f2_eval,
        "doc_fingerprint": text.fingerprint,
        "winnowing_overlap": text.winnowing_overlap,
        "ndcg_eval": index.ndcg_eval,
        "repetition_ratio": text.repetition_ratio,
        "lz78_complexity": text.lz78_complexity,
        "unigram_logprob": text.unigram_logprob,
        "bigram_lm_score": text.bigram_lm_score,
        "zipf_fit": text.zipf_fit,
        "curriculum_buckets": text.curriculum_buckets,
        "common_ngram_fraction": text.common_ngram_fraction,
        "subword_stats": text.subword_stats,
        "bigram_pmi": text.bigram_pmi,
        "domain_mixture_weights": text.domain_mixture_weights,
        "domain_kl_matrix": text.domain_kl_matrix,
        "balanced_shards": text.balanced_shards,
        "dup_span_fraction": text.dup_span_fraction,
        "dup_spans": text.dup_spans,
        "search_by_token": lambda sf: index.search_by_token(sf, SEARCH_TOKEN),
        "search_ranked": lambda sf: index.search_ranked(sf, tokens=SEARCH_TOKENS, k=SEARCH_K),
        "search_bm25": lambda sf: index.search_bm25(sf, tokens=SEARCH_TOKENS, k=SEARCH_K),
        "rbo_rankings": lambda sf: index.rbo_rankings(sf, tokens=SEARCH_TOKENS, k=SEARCH_K),
        "rrf_fusion": lambda sf: index.rrf_fusion(sf, tokens=SEARCH_TOKENS, k=SEARCH_K),
        "token_doc_frequency": lambda sf: index.token_doc_frequency(sf, min_docs=50),
        "anti_search": lambda sf: index.anti_search(sf, SEARCH_TOKEN),
        # --- dedup ---
        "exact_dedup": dedup.exact_dedup_by_key,
        "text_md5_dedup": dedup.text_md5_dedup,
        "dedup_survivorship": dedup.dedup_survivorship,
        "minhash_near_dup": dedup.minhash_near_dup,
        "ngram_jaccard_near_dup": dedup.ngram_jaccard_near_dup,
        "set_similarity_join": dedup.set_similarity_join,
        "fuzzy_name_match": dedup.fuzzy_name_match,
        "simhash": dedup.simhash_pipeline,
        "near_dup_clusters": cluster.near_dup_clusters,
        "st_dbscan": cluster.st_dbscan,
        "dbscan_clusters": cluster.dbscan_clusters,
        "bloom_dedup": lambda sf: cluster.bloom_dedup(sf, BLOOM_N, BLOOM_FP, BLOOM_PARTS),
        "heavy_hitters": lambda sf: text.heavy_hitters(sf, k=HH_K),
        # --- similarity search ---
        "ann_topk": lambda sf: ann.ann_topk(sf, k=ANN_K, vec_id=ANN_QUERY_ID),
        "ann_multi_topk": lambda sf: ann.ann_multi_topk(sf, k=ANN_K, vec_ids=MULTI_VEC_IDS),
        "ann_lsh_topk": lambda sf: ann.lsh_bucket_topk(sf, k=ANN_K, vec_id=ANN_QUERY_ID),
        "ann_ivf_topk": lambda sf: ann.ivf_topk(sf, k=ANN_K, vec_id=ANN_QUERY_ID),
        "ann_ivfpq_topk": lambda sf: ann.ivfpq_topk(sf, k=ANN_K, vec_id=ANN_QUERY_ID),
        "jl_projection_audit": ann.jl_projection_audit,
        "ann_filtered_topk": lambda sf: ann.ann_filtered_topk(sf, k=ANN_K, vec_id=ANN_QUERY_ID),
        "pq_encode": ann.pq_encode,
        "embedding_top_pairs": lambda sf: ann.embedding_top_pairs(sf, k=EMB_TOP_PAIRS),
        "mutual_nn_pairs": ann.mutual_nn_pairs,
        "knn_graph_reciprocity": ann.knn_graph_reciprocity,
        "embedding_near_dup": lambda sf: ann.embedding_near_dup(sf, threshold=EMB_NEARDUP_T),
        "embedding_near_dup_lsh": lambda sf: ann.embedding_near_dup_lsh(sf, threshold=EMB_NEARDUP_T),
        # --- image payload ---
        "image_fidelity": images.fidelity_pipeline,
        "image_format_migration": images.image_format_migration,
        "image_lossy_migration": images.image_lossy_migration,
        "image_ssim_audit": images.image_ssim_audit,
        "image_features": images.image_features,
        "image_thumbnails": images.image_thumbnails,
        "image_meta_stats": images.image_meta_stats,
        "shard_manifest": images.shard_manifest,
        "best_image_per_tile": images.best_image_per_tile,
        "zone_image_stats": images.zone_image_stats,
        "zone_color_signature": images.zone_color_signature,
        "caption_location_histogram": images.caption_location_histogram,
        "zone_top_terms": images.zone_top_terms,
        "phash_dedup": images.phash_dedup,
        "split_leakage_phash": images.split_leakage_phash,
        "phash_quadrant_pairs": images.phash_quadrant_pairs,
        "phash_pixel_verify": images.phash_pixel_verify,
        "tile_montage": images.tile_montage,
        "phash_near_dup_pairs": images.phash_near_dup_pairs,
        "phash_dedup_eval": images.phash_dedup_eval,
        # --- audio / video payloads (real WAV decode; raw frame sampling) ---
        "audio_features": multimodal.audio_features,
        "audio_clipping": multimodal.audio_clipping,
        "audio_silence_trim": multimodal.audio_silence_trim,
        "audio_band_energy": multimodal.audio_band_energy,
        "audio_fingerprint": multimodal.audio_fingerprint,
        "audio_lossy_migration": multimodal.audio_lossy_migration,
        "video_shot_segmentation": multimodal.video_shot_segmentation,
        "audio_dedup_manifest": multimodal.audio_dedup_manifest,
        "cell_modality_mix": multimodal.cell_modality_mix,
        "video_frame_stats": multimodal.video_frame_stats,
        "video_temporal_smoothness": multimodal.video_temporal_smoothness,
        "video_motion_vectors": multimodal.video_motion_vectors,
        "audio_harmonicity": multimodal.audio_harmonicity,
        "video_keyframes": multimodal.video_keyframes,
        # --- trajectory / movement analytics ---
        "trajectory_stats": trajectory.trajectory_stats,
        "trip_stats": trajectory.trip_stats,
        "od_matrix": trajectory.od_matrix,
        "od_gravity": trajectory.od_gravity,
        "speed_audit": trajectory.speed_audit,
        "mode_segmentation": trajectory.mode_segmentation,
        "hits_scores": trajectory.hits_scores,
        "label_propagation_communities": trajectory.label_propagation_communities,
        "flow_divergence": trajectory.flow_divergence,
        "ipf_od_balancing": trajectory.ipf_od_balancing,
        "place_ppr": trajectory.place_ppr,
        "displacement_histogram": trajectory.displacement_histogram,
        "transition_entropy": trajectory.transition_entropy,
        "gravity_decay_fit": trajectory.gravity_decay_fit,
        "user_mobility_entropy": trajectory.user_mobility_entropy,
        "predictability_bound": trajectory.predictability_bound,
        "spatial_self_join": trajectory.spatial_self_join,
        "colocation_join": trajectory.colocation_join,
        "stay_points": trajectory.stay_points,
        "heading_histogram": trajectory.heading_histogram,
        "route_conformance": trajectory.route_conformance,
        "frechet_conformance": trajectory.frechet_conformance,
        "radius_of_gyration": trajectory.radius_of_gyration,
        "cell_transition_matrix": trajectory.cell_transition_matrix,
        "link_prediction": trajectory.link_prediction,
        "first_passage_time": trajectory.first_passage_time,
        "spectral_partition": trajectory.spectral_partition,
        "trajectory_simplify": trajectory.trajectory_simplify,
        "degree_assortativity": trajectory.degree_assortativity,
        "transition_stationary": trajectory.transition_stationary,
        "zone_modularity": trajectory.zone_modularity,
        "cotravel_pairs": trajectory.cotravel_pairs,
        "path_crossings": trajectory.path_crossings,
        "home_cells": trajectory.home_cells,
        "getis_ord_hotspots": hotspot.getis_ord_hotspots,
        "local_moran": hotspot.local_moran,
        "global_moran": hotspot.global_moran,
        "geary_c": hotspot.geary_c,
        "occupancy_closing": hotspot.occupancy_closing,
        "radiation_model": hotspot.radiation_model,
        "cell_adjacency_triangles": hotspot.cell_adjacency_triangles,
        "occupancy_kcore": hotspot.occupancy_kcore,
        "turn_histogram": trajectory.turn_histogram,
        "rayleigh_test": trajectory.rayleigh_test,
        "kde_density": hotspot.kde_density,
        "cross_k": hotspot.cross_k,
        "nearest_neighbor": hotspot.nearest_neighbor,
        "clark_evans": hotspot.clark_evans,
        "k_anonymity": privacy.k_anonymity,
        "l_diversity": privacy.l_diversity,
        "t_closeness": privacy.t_closeness,
        "geo_inconsistent_dups": images.geo_inconsistent_dups,
        "caption_spam": images.caption_spam,
        "dissolve_zones": cluster.dissolve_zones,
        "idw_interpolation": hotspot.idw_interpolation,
        "idw_loocv": hotspot.idw_loocv,
        "space_time_cube": hotspot.space_time_cube,
        "cell_entropy": hotspot.cell_entropy,
        "burst_cells": hotspot.burst_cells,
        "quadrat_chi2": hotspot.quadrat_chi2,
        "cell_trend": hotspot.cell_trend,
        "theil_sen_cell_trend": hotspot.theil_sen_cell_trend,
        "mann_kendall_cells": hotspot.mann_kendall_cells,
        "mann_kendall_fdr": hotspot.mann_kendall_fdr,
        "semivariogram": hotspot.semivariogram,
        "anisotropy_variogram": hotspot.anisotropy_variogram,
        "kriging_field": hotspot.kriging_field,
        "huff_model": hotspot.huff_model,
        "poi_accessibility": hotspot.poi_accessibility,
        "hot_cell_clusters": hotspot.hot_cell_clusters,
        "cell_mad_outliers": hotspot.cell_mad_outliers,
        "p_median_greedy": hotspot.p_median_greedy,
        "fractal_dimension": hotspot.fractal_dimension,
        "lacunarity": hotspot.lacunarity,
        "cell_peak_hours": hotspot.cell_peak_hours,
        "join_count_stats": hotspot.join_count_stats,
        "emerging_hotspots": hotspot.emerging_hotspots,
        "knox_statistic": hotspot.knox_statistic,
        "eb_shrunk_rates": hotspot.eb_shrunk_rates,
        "moran_correlogram": hotspot.moran_correlogram,
        "benford_audit": stats.benford_audit,
        "chi2_independence": stats.chi2_independence,
        "lineitem_corr_matrix": stats.lineitem_corr_matrix,
        "rank_correlation": relational.rank_correlation,
        "discount_elasticity": stats.discount_elasticity,
        "kmv_overlap_eval": stats.kmv_overlap_eval,
        "ks_weekend_test": stats.ks_weekend_test,
        "mann_whitney_u": stats.mann_whitney_u,
        "hbos_outliers": stats.hbos_outliers,
        "interpurchase_intervals": relational.interpurchase_intervals,
        "cohort_ltv": relational.cohort_ltv,
        "ship_delay_quantiles": relational.ship_delay_quantiles,
        "supplier_ontime_wilson": relational.supplier_ontime_wilson,
        "pps_sample": relational.pps_sample,
        "bootstrap_ci": stats.bootstrap_ci,
        "expectations_audit": stats.expectations_audit,
        "neyman_allocation": stats.neyman_allocation,
        "runs_test": stats.runs_test,
        "ols_regression": stats.ols_regression,
        "decision_stump": stats.decision_stump,
        "logistic_newton": stats.logistic_newton,
        "psi_drift": stats.psi_drift,
        "conformal_interval": stats.conformal_interval,
        "mutual_info_rank": stats.mutual_info_rank,
        "quantile_regression": stats.quantile_regression,
        "isotonic_calibration": stats.isotonic_calibration,
        "tail_dependence": stats.tail_dependence,
        "gmm_em": stats.gmm_em,
        "lof_outliers": hotspot.lof_outliers,
        "scan_statistic": hotspot.scan_statistic,
        "cca_analysis": stats.cca_analysis,
        "perceptron_averaging": stats.perceptron_averaging,
        "simpsons_paradox": stats.simpsons_paradox,
        "als_factorization": stats.als_factorization,
        "jackknife_se": stats.jackknife_se,
        "capture_recapture": stats.capture_recapture,
        "mediation_analysis": stats.mediation_analysis,
        "acf_hourly": windows.acf_hourly,
        "dtw_profiles": windows.dtw_profiles,
        "pacf_durbin": windows.pacf_durbin,
        "granger_causality": windows.granger_causality,
        "hurst_exponent": windows.hurst_exponent,
        "kalman_smooth": windows.kalman_smooth,
        "kleinberg_bursts": windows.kleinberg_bursts,
        "sax_motifs": windows.sax_motifs,
        "theil_u_eval": windows.theil_u_eval,
        "ccf_event_types": windows.ccf_event_types,
        "dau_wau_ratio": windows.dau_wau_ratio,
        "binseg_changepoints": windows.binseg_changepoints,
        "peak_concurrency": windows.peak_concurrency,
        "markov_attribution": windows.markov_attribution,
        "follows_latency": windows.follows_latency,
        "dp_tile_counts": privacy.dp_tile_counts,
        "location_unicity": privacy.location_unicity,
        "latest_event_per_user": windows.latest_event_per_user,
        "kde_contours": hotspot.kde_contours,
        "distance_raster": hotspot.distance_raster,
        "voronoi_assign": hotspot.voronoi_assign,
        "ripley_k": hotspot.ripley_k,
        "change_detection": hotspot.change_detection,
        "spatial_thinning": hotspot.spatial_thinning,
        "zone_dispersion": hotspot.zone_dispersion,
        "std_ellipse": hotspot.std_ellipse,
        "stratified_sample": trajectory.stratified_sample,
        "rolling_window": windows.rolling_window,
        "scd2_intervals": windows.scd2_intervals,
        "recency_weighted_value": windows.recency_weighted_value,
        "user_retention": windows.user_retention,
        "road_components": routing.road_cheap_components,
        "embedding_dim_stats": ann.embedding_dim_stats,
        "route_corridor": snap.route_corridor,
        "aspect_buckets": images.aspect_buckets,
        "user_burstiness": stats.user_burstiness,
        "event_dedup": windows.event_dedup,
        "ngram_decontaminate": dedup.ngram_decontaminate,
        "snapshot_diff": dedup.snapshot_diff,
        "layout_pruning_stats": spatial.layout_pruning_stats,
        "matryoshka_fidelity": ann.matryoshka_fidelity,
        "hmm_map_match": snap.hmm_map_match,
        "sequence_pattern_counts": windows.sequence_pattern_counts,
        "doc_keywords": index.doc_keywords,
        "iqr_outliers": stats.iqr_outliers,
        "ann_recall_eval": lambda sf: ann.ann_recall_eval(sf, k=ANN_K, vec_ids=MULTI_VEC_IDS),
        "binary_hamming_topk": lambda sf: ann.binary_hamming_topk(sf, k=ANN_K, vec_ids=MULTI_VEC_IDS),
        "binary_embedding_eval": lambda sf: ann.binary_embedding_eval(sf, k=ANN_K, vec_ids=MULTI_VEC_IDS),
        "mmd_two_sample": ann.mmd_two_sample,
        "knn_calibration": ann.knn_calibration,
        "intrinsic_dimension": ann.intrinsic_dimension,
        "kcenter_coreset": ann.kcenter_coreset,
        "minhash_accuracy_eval": dedup.minhash_accuracy_eval,
        "edit_distance_verify": dedup.edit_distance_verify,
        "lsh_blocking_eval": dedup.lsh_blocking_eval,
        "dedup_manifest": dedup.dedup_manifest,
        "table_profile": stats.table_profile,
        "rfm_features": stats.rfm_features,
        "global_row_numbers": windows.global_row_numbers,
        "event_trigram_counts": windows.event_trigram_counts,
        "weighted_sample": windows.weighted_sample,
        "hash_split_counts": dedup.hash_split_counts,
        "filter_funnel": text.filter_funnel,
        "incremental_md5_dedup": dedup.incremental_md5_dedup,
        "cdc_chunk_dedup": dedup.cdc_chunk_dedup,
        "cdc_savings": dedup.cdc_savings,
        "ohlc_hourly": windows.ohlc_hourly,
        "audio_pitch_histogram": multimodal.audio_pitch_histogram,
        "price_band_pairs": relational.price_band_pairs,
        "compression_stats": images.compression_stats,
        "value_hour_correlation": stats.value_hour_correlation,
        "label_class_weights": stats.label_class_weights,
        "image_augment": images.image_augment,
        "image_blur_scores": images.image_blur_scores,
        "image_entropy": images.image_entropy,
        "image_otsu": images.image_otsu,
        "image_quadtree": images.image_quadtree,
        "image_harris_corners": images.image_harris_corners,
        "image_border_detect": images.image_border_detect,
        "image_hough_lines": images.image_hough_lines,
        "image_glcm": images.image_glcm,
        "caption_complexity_corr": images.caption_complexity_corr,
        "image_channel_correlation": images.image_channel_correlation,
        "image_blob_count": images.image_blob_count,
        "image_orientation_histogram": images.image_orientation_histogram,
        "image_haar_energy": images.image_haar_energy,
        "image_dynamic_range": images.image_dynamic_range,
        "phash_scale_stability": images.phash_scale_stability,
        "image_blockiness": images.image_blockiness,
        "image_saliency_centroid": images.image_saliency_centroid,
        "dct_energy_profile": images.dct_energy_profile,
        "image_palette": images.image_palette,
        "image_edge_density": images.image_edge_density,
        "caption_conflict_dups": images.caption_conflict_dups,
        "caption_geo_alignment": images.caption_geo_alignment,
        "contrastive_negatives": images.contrastive_negatives,
        "image_crop_manifest": images.image_crop_manifest,
        "image_dedup_survivor": images.image_dedup_survivor,
        "image_quality_survivor": images.image_quality_survivor,
        "phash_bit_stats": images.phash_bit_stats,
        "decontaminate": dedup.decontaminate,
        # --- map-matching / geofencing ---
        "snap_to_ways": snap.snap_to_ways,
        "dwell_in_zone": trajectory.dwell_in_zone,
        "geofence_transitions": trajectory.geofence_transitions,
    }


def _pts_cte(src: str = "documents", id_col: str = "doc_id") -> str:
    return (
        f"pts AS (SELECT {id_col}, {oracle.sql_derive_lon(id_col)} AS lon, "
        f"{oracle.sql_derive_lat(id_col)} AS lat FROM {src})"
    )


def _tile_union(zooms=(6, 10, 14)) -> str:
    parts = [
        f"SELECT doc_id, {z} AS z, {oracle.sql_tile_x('lon', z)} AS x, {oracle.sql_tile_y('lat', z)} AS y FROM pts"
        for z in zooms
    ]
    return " UNION ALL ".join(parts)


def oracle_sql() -> dict[str, str]:
    low = 11  # cells.PRECISION_LOW
    rects = oracle.sql_admin_rects_values()
    rects6 = oracle.sql_admin_rects_values(admin_level=6)
    pois = oracle.sql_pois_values()
    sqd = oracle.sql_sqdist_deg("pts.lon", "pts.lat", "p.lon", "p.lat")
    img_pq = f"read_parquet('{images.images_path_for(SF001)}')"

    _KNN_ORACLE_SQL = f"""
WITH {_pts_cte()},
d AS (SELECT doc_id, p.poi_id, row_number() OVER (PARTITION BY doc_id ORDER BY {sqd}, p.poi_id) AS knn_rank
      FROM pts CROSS JOIN {pois})
SELECT doc_id, CAST(knn_rank AS INTEGER) AS knn_rank, poi_id FROM d WHERE knn_rank <= {KNN_K}"""

    tile_hist = f"WITH {_pts_cte()}, u AS ({_tile_union()}) SELECT z, x, y, count(*) AS n_images FROM u GROUP BY z, x, y"

    # KDE raster CTE chain (shared by kde_density and kde_contours):
    # ends at `sw(cx, cy, n_events, sum_w_fp)`
    _kde_cte = f"""evv AS (
  SELECT {oracle.sql_derive_lon('event_id')} AS lon, {oracle.sql_derive_lat('event_id')} AS lat
  FROM events),
sites AS (
  SELECT i.i AS cx, j.j AS cy,
         {fixtures.LON_MIN!r} + (i.i + 0.5) * {hotspot.GI_EPS!r} AS sx,
         {fixtures.LAT_MIN!r} + (j.j + 0.5) * {hotspot.GI_EPS!r} AS sy
  FROM generate_series(0, {hotspot.GI_GX - 1}) AS i(i)
  CROSS JOIN generate_series(0, {hotspot.GI_GY - 1}) AS j(j)),
pw AS (
  SELECT s.cx, s.cy,
         1.0 - ((e.lon - s.sx) * (e.lon - s.sx) + (e.lat - s.sy) * (e.lat - s.sy)) / {hotspot.KDE_H * hotspot.KDE_H!r} AS w
  FROM evv e JOIN sites s
  ON e.lon >= s.sx - {hotspot.KDE_H!r} AND e.lon <= s.sx + {hotspot.KDE_H!r}
  WHERE (e.lon - s.sx) * (e.lon - s.sx) + (e.lat - s.sy) * (e.lat - s.sy)
        <= {hotspot.KDE_H * hotspot.KDE_H!r}),
sw AS (
  SELECT cx, cy, count(*) AS n_events,
         CAST(sum(CAST(floor(w * {hotspot.KDE_FP!r} + 0.5) AS BIGINT)) AS BIGINT) AS sum_w_fp
  FROM pw GROUP BY cx, cy)"""

    _r0 = fixtures.admin_rects()[0]  # DiD treatment zone (first city rect)
    # event points with user/ts carried (trajectory family)
    _epts = (
        f"epts AS (SELECT event_id, user_id, ts, {oracle.sql_derive_lon('event_id')} AS lon, "
        f"{oracle.sql_derive_lat('event_id')} AS lat FROM events)"
    )

    def _fp_sql(dlon: str, dlat: str) -> str:
        """Fixed-point planar length == trajectory._seg_fp bit-for-bit."""
        return (
            f"CAST(floor(sqrt({dlon} * {dlon} + {dlat} * {dlat}) * {trajectory.FP_SCALE!r} + 0.5) AS BIGINT)"
        )

    # OD matrix body (shared by od_matrix and od_gravity)
    _od_body = f"""
WITH {_epts},
w AS (SELECT user_id,
        first_value(lon) OVER uwf AS flon, first_value(lat) OVER uwf AS flat,
        last_value(lon) OVER uwf AS llon, last_value(lat) OVER uwf AS llat
      FROM epts
      WINDOW uwf AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
u AS (SELECT user_id, max(flon) AS flon, max(flat) AS flat,
             max(llon) AS llon, max(llat) AS llat FROM w GROUP BY user_id),
{oracle.sql_morton_ctes('u', 'user_id, llon, llat', trajectory.OD_PRECISION, 'o_cell', lon_col='flon', lat_col='flat', prefix='mo')},
{oracle.sql_morton_ctes('mo_out', 'user_id, o_cell', trajectory.OD_PRECISION, 'd_cell', lon_col='llon', lat_col='llat', prefix='md')}
SELECT o_cell, d_cell, count(*) AS n_users FROM md_out GROUP BY o_cell, d_cell"""

    d = {
        "cell_index": f"""
WITH {_pts_cte()},
{oracle.sql_morton_ctes('pts', 'doc_id', low, 'cell_low')}
SELECT doc_id, cell_low, (cell_low >> 4) AS cell_verylow FROM m_out""",
        # mirrors spatial.segregation_index: |a·B − b·A| integer terms,
        # absent cells folded via (T − Σ_present t)·A
        "segregation_index": f"""
WITH dpts AS (SELECT doc_id, lang, {oracle.sql_derive_lon('doc_id')} AS lon,
                     {oracle.sql_derive_lat('doc_id')} AS lat FROM documents),
{oracle.sql_morton_ctes('dpts', 'doc_id, lang', low, 'cell', prefix='sg')},
cl AS (SELECT cell, lang, CAST(count(*) AS BIGINT) AS a FROM sg_out GROUP BY 1, 2),
ct AS (SELECT cell, CAST(sum(a) AS BIGINT) AS t_cell FROM cl GROUP BY 1),
lt AS (SELECT lang, CAST(sum(a) AS BIGINT) AS a_tot FROM cl GROUP BY 1),
tot AS (SELECT CAST(sum(a) AS BIGINT) AS t_all FROM cl),
tm AS (SELECT cl.lang,
              CAST(sum(abs(cl.a * (tot.t_all - lt.a_tot) - (ct.t_cell - cl.a) * lt.a_tot)) AS BIGINT) AS num,
              CAST(sum(ct.t_cell) AS BIGINT) AS t_present,
              CAST(count(*) AS BIGINT) AS n_cells_present
       FROM cl JOIN ct USING (cell) JOIN lt ON lt.lang = cl.lang CROSS JOIN tot
       GROUP BY 1),
f AS (SELECT tm.lang, lt.a_tot AS n_lang, tm.n_cells_present,
             CAST(tm.num + (tot.t_all - tm.t_present) * lt.a_tot AS DOUBLE) AS num_f,
             CAST(lt.a_tot AS DOUBLE) AS a_f,
             CAST(tot.t_all - lt.a_tot AS DOUBLE) AS b_f
      FROM tm JOIN lt ON lt.lang = tm.lang CROSS JOIN tot)
SELECT lang, n_lang, n_cells_present,
       round(num_f / (2.0 * a_f * b_f), 6) AS dissimilarity
FROM f ORDER BY lang""",
        # mirrors spatial.theil_decomposition: fixed-point n·ln(n) terms
        # pinned once per cell/region, identity T_total = T_b + T_w
        "theil_decomposition": f"""
WITH ev AS (SELECT event_id, {oracle.sql_derive_lon('event_id')} AS lon,
                   {oracle.sql_derive_lat('event_id')} AS lat FROM events),
{oracle.sql_morton_ctes('ev', 'event_id', low, 'cell_low', prefix='tm')},
c AS (SELECT cell_low AS cell, CAST(count(*) AS BIGINT) AS x FROM tm_out GROUP BY 1),
ct AS (SELECT (cell >> 4) AS grp, x,
              CAST(floor(CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT) AS s1
       FROM c),
g AS (SELECT grp, CAST(sum(x) AS BIGINT) AS xg, CAST(sum(s1) AS BIGINT) AS s1,
             CAST(count(*) AS BIGINT) AS ng FROM ct GROUP BY 1),
gt AS (SELECT xg, s1, ng,
              CAST(floor(CAST(xg AS DOUBLE) * ln(CAST(xg AS DOUBLE) / CAST(ng AS DOUBLE))
                         * 1000000000.0 + 0.5) AS BIGINT) AS s2
       FROM g),
tot AS (SELECT CAST(sum(xg) AS BIGINT) AS total_events, CAST(sum(s1) AS BIGINT) AS s1,
               CAST(sum(s2) AS BIGINT) AS s2, CAST(sum(ng) AS BIGINT) AS n_cells,
               CAST(count(*) AS BIGINT) AS n_groups FROM gt)
SELECT n_cells, n_groups, total_events,
       round((CAST(s1 AS DOUBLE) / 1000000000.0) / CAST(total_events AS DOUBLE)
             - ln(CAST(total_events AS DOUBLE) / CAST(n_cells AS DOUBLE)), 6) AS theil_total,
       round((CAST(s2 AS DOUBLE) / 1000000000.0) / CAST(total_events AS DOUBLE)
             - ln(CAST(total_events AS DOUBLE) / CAST(n_cells AS DOUBLE)), 6) AS theil_between,
       round((CAST(s1 AS DOUBLE) / 1000000000.0) / CAST(total_events AS DOUBLE)
             - (CAST(s2 AS DOUBLE) / 1000000000.0) / CAST(total_events AS DOUBLE), 6) AS theil_within
FROM tot""",
        "spatial_split": f"""
WITH {_pts_cte()},
{oracle.sql_morton_ctes('pts', 'doc_id', low, 'cell_low')}
SELECT doc_id, cell_low,
  CASE WHEN ((cell_low * {spatial.SPLIT_MULT} + {spatial.SPLIT_ADD}) % {spatial.SPLIT_M31})
            / {spatial.SPLIT_M31} < {spatial.SPLIT_TEST_FRAC!r}
       THEN 'test' ELSE 'train' END AS split
FROM m_out""",
        "tile_assign": f"""
WITH {_pts_cte()},
t AS (SELECT doc_id, {TILE_Z} AS z, {oracle.sql_tile_x('lon', TILE_Z)} AS x, {oracle.sql_tile_y('lat', TILE_Z)} AS y FROM pts)
SELECT doc_id, z, x, y, {oracle.sql_quadkey(TILE_Z)} AS quadkey FROM t""",
        "cell_prefix_scan": f"""
WITH {_pts_cte()},
{oracle.sql_morton_ctes('pts', 'doc_id', low, 'cell_low')}
SELECT doc_id, cell_low FROM m_out
WHERE cell_low >= ({PREFIX_CELL} << 10) AND cell_low < (({PREFIX_CELL} + 1) << 10)""",
        "tile_histogram": tile_hist,
        "tile_histogram_salted": tile_hist,
        # each zoom computed DIRECTLY from the points — must equal the
        # engine's roll-up exactly because slippy tiles nest (x>>1, y>>1)
        "tile_pyramid": (
            f"WITH {_pts_cte()}, u AS ({_tile_union(zooms=(6, 7, 8, 9, 10))}) "
            "SELECT z, x, y, count(*) AS n_images FROM u GROUP BY z, x, y"
        ),
        # adaptive quadtree: a tile with data is a leaf iff it fits (or is
        # at z_base) and NO ancestor in (z_top..z-1] fit — mirrors the
        # engine's top-down split walk exactly (slippy ancestors nest by
        # right-shift)
        "quadtree_leaves": f"""
WITH {_pts_cte()}, u AS ({_tile_union(zooms=(6, 7, 8, 9, 10))}),
l AS (SELECT z, x, y, count(*) AS n_images FROM u GROUP BY z, x, y)
SELECT t.z, t.x, t.y, t.n_images FROM l t
WHERE (t.n_images <= {spatial.QUAD_THRESHOLD} OR t.z = 10)
  AND NOT EXISTS (SELECT 1 FROM l a WHERE a.z >= 6 AND a.z < t.z
      AND a.x = (t.x >> (t.z - a.z)) AND a.y = (t.y >> (t.z - a.z))
      AND a.n_images <= {spatial.QUAD_THRESHOLD})""",
        "tile_raster": f"SELECT * FROM read_parquet('{golden.tile_raster_path(SF001, z=10)}')",
        "raster_to_vector": f"SELECT * FROM read_parquet('{golden.raster_vector_path(SF001, z=10)}')",
        "raster_hillshade": f"""
WITH v AS (SELECT (x * 16 + px) AS gx0, (y * 16 + py) AS gy0, n_points
           FROM read_parquet('{golden.raster_vector_path(SF001, z=10)}')),
d(ox, oy, wx, wy) AS (VALUES
  (-1,-1,-1,-1),(-1,0,-2,0),(-1,1,-1,1),(0,-1,0,-2),(0,1,0,2),
  (1,-1,1,-1),(1,0,2,0),(1,1,1,1)),
n AS (SELECT gx0 - ox AS gx, gy0 - oy AS gy, wx * n_points AS sx, wy * n_points AS sy
      FROM v CROSS JOIN d),
a AS (SELECT gx, gy, CAST(sum(sx) AS BIGINT) AS dzdx_num, CAST(sum(sy) AS BIGINT) AS dzdy_num
      FROM n GROUP BY 1, 2),
f AS (SELECT gx, gy, dzdx_num, dzdy_num,
        CAST(dzdx_num AS DOUBLE) / 8.0 AS dx, CAST(dzdy_num AS DOUBLE) / 8.0 AS dy FROM a)
SELECT gx, gy, dzdx_num, dzdy_num,
       round(cos(pi() / 4.0) * cos(atan(sqrt(dx * dx + dy * dy)))
             + sin(pi() / 4.0) * sin(atan(sqrt(dx * dx + dy * dy)))
               * cos(7.0 * pi() / 4.0 - atan2(dy, -dx)), 6) AS hillshade
FROM f ORDER BY gx, gy""",
        "viewshed": f"SELECT * FROM read_parquet('{golden.viewshed_path(SF001, 10, 16)}')",
        "watershed_basins": f"""
WITH RECURSIVE
v AS (SELECT (x * 16 + px) AS gx, (y * 16 + py) AS gy, n_points
      FROM read_parquet('{golden.raster_vector_path(SF001, z=10)}')),
d(dir, ox, oy, wt) AS (VALUES {", ".join(f"({i},{dx},{dy},{wt})" for i, dx, dy, wt in raster.D8_DIRS)}),
nb AS (
  SELECT a.gx, a.gy, d.dir, b.gx AS tgx, b.gy AS tgy,
         (a.n_points - b.n_points) * d.wt AS score
  FROM v a CROSS JOIN d JOIN v b ON b.gx = a.gx + d.ox AND b.gy = a.gy + d.oy
  WHERE b.n_points < a.n_points),
pick AS (
  SELECT gx, gy, tgx, tgy,
         row_number() OVER (PARTITION BY gx, gy ORDER BY score DESC, dir) AS rk
  FROM nb),
flow AS (
  SELECT v.gx, v.gy,
         coalesce(p.tgx, v.gx) AS to_gx, coalesce(p.tgy, v.gy) AS to_gy,
         CAST(p.gx IS NULL AS BIGINT) AS is_sink
  FROM v LEFT JOIN (SELECT * FROM pick WHERE rk = 1) p ON p.gx = v.gx AND p.gy = v.gy),
walk(gx, gy, cx, cy) AS (
  SELECT gx, gy, gx, gy FROM flow
  UNION ALL
  SELECT w.gx, w.gy, f.to_gx, f.to_gy
  FROM walk w JOIN flow f ON f.gx = w.cx AND f.gy = w.cy WHERE f.is_sink = 0),
lab AS (
  SELECT w.gx, w.gy, w.cx AS basin_gx, w.cy AS basin_gy
  FROM walk w JOIN flow f2 ON f2.gx = w.cx AND f2.gy = w.cy WHERE f2.is_sink = 1)
SELECT l.gx, l.gy, l.basin_gx, l.basin_gy, CAST(s.n AS BIGINT) AS basin_size
FROM lab l JOIN (SELECT basin_gx, basin_gy, count(*) AS n FROM lab GROUP BY 1, 2) s
  ON s.basin_gx = l.basin_gx AND s.basin_gy = l.basin_gy""",
        "flow_accumulation": f"""
WITH RECURSIVE
v AS (SELECT (x * 16 + px) AS gx, (y * 16 + py) AS gy, n_points
      FROM read_parquet('{golden.raster_vector_path(SF001, z=10)}')),
d(dir, ox, oy, wt) AS (VALUES {", ".join(f"({i},{dx},{dy},{wt})" for i, dx, dy, wt in raster.D8_DIRS)}),
nb AS (
  SELECT a.gx, a.gy, d.dir, b.gx AS tgx, b.gy AS tgy,
         (a.n_points - b.n_points) * d.wt AS score
  FROM v a CROSS JOIN d JOIN v b ON b.gx = a.gx + d.ox AND b.gy = a.gy + d.oy
  WHERE b.n_points < a.n_points),
pick AS (
  SELECT gx, gy, tgx, tgy,
         row_number() OVER (PARTITION BY gx, gy ORDER BY score DESC, dir) AS rk
  FROM nb),
flow AS (
  SELECT v.gx, v.gy, v.n_points,
         coalesce(p.tgx, v.gx) AS to_gx, coalesce(p.tgy, v.gy) AS to_gy,
         CAST(p.gx IS NULL AS BIGINT) AS is_sink
  FROM v LEFT JOIN (SELECT * FROM pick WHERE rk = 1) p ON p.gx = v.gx AND p.gy = v.gy),
walk(sgx, sgy, gx, gy) AS (
  SELECT gx, gy, gx, gy FROM flow
  UNION ALL
  SELECT w.sgx, w.sgy, f.to_gx, f.to_gy
  FROM walk w JOIN flow f ON f.gx = w.gx AND f.gy = w.gy WHERE f.is_sink = 0)
SELECT f.gx, f.gy, f.n_points, f.to_gx, f.to_gy, f.is_sink,
       CAST(c.n AS BIGINT) AS n_upstream
FROM flow f JOIN (SELECT gx, gy, count(*) AS n FROM walk GROUP BY 1, 2) c
  ON c.gx = f.gx AND c.gy = f.gy""",
        "raster_focal_mean": f"""
WITH v AS (SELECT (x * 16 + px) AS gx0, (y * 16 + py) AS gy0, n_points
           FROM read_parquet('{golden.raster_vector_path(SF001, z=10)}')),
d(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
n AS (SELECT gx0 + dx AS gx, gy0 + dy AS gy, n_points FROM v CROSS JOIN d)
SELECT gx, gy, CAST(sum(n_points) AS BIGINT) AS neigh_sum,
       CAST(sum(n_points) AS DOUBLE) / 9.0 AS focal_mean
FROM n GROUP BY 1, 2 ORDER BY 1, 2""",
        "boundary_simplify": (
            "SELECT * FROM read_parquet('"
            + golden.boundary_simplify_path(raster.SIMPLIFY_TOL, raster.DENSIFY_PER_EDGE)
            + "')"
        ),
        # raster×vector fusion: pixel features (golden raster_to_vector
        # table — rounded centroids identical to the engine's output)
        # PiP-joined to the rect boundaries, aggregated per zone
        "zonal_stats": f"""
SELECT rel_id, count(*) AS n_pixels, CAST(sum(n_points) AS BIGINT) AS n_points
FROM read_parquet('{golden.raster_vector_path(SF001, z=10)}') v JOIN {rects}
ON v.lon >= b.lon_min AND v.lon < b.lon_max AND v.lat >= b.lat_min AND v.lat < b.lat_max
GROUP BY rel_id""",
        "pip_join": f"""
WITH {_pts_cte()}
SELECT doc_id, rel_id, admin_level FROM pts JOIN {rects}
ON pts.lon >= b.lon_min AND pts.lon < b.lon_max AND pts.lat >= b.lat_min AND pts.lat < b.lat_max""",
        "pip_join_shuffle": f"""
WITH {_pts_cte()}
SELECT doc_id, rel_id, admin_level FROM pts JOIN {rects}
ON pts.lon >= b.lon_min AND pts.lon < b.lon_max AND pts.lat >= b.lat_min AND pts.lat < b.lat_max""",
        "pip_anti_join": f"""
WITH {_pts_cte()}
SELECT doc_id, lon, lat FROM pts
WHERE NOT EXISTS (
  SELECT 1 FROM {rects}
  WHERE pts.lon >= b.lon_min AND pts.lon < b.lon_max AND pts.lat >= b.lat_min AND pts.lat < b.lat_max)""",
        "zone_median_center": f"SELECT * FROM read_parquet('{golden.zone_median_center_path(SF001)}')",
        "hilbert_index": f"SELECT * FROM read_parquet('{golden.hilbert_index_path(SF001 + '/events.parquet')}')",
        "hilbert_locality_stats": f"SELECT * FROM read_parquet('{golden.hilbert_locality_stats_path(SF001 + '/events.parquet')}')",
        # mirrors spatial.geohash_strings: same quantization, the
        # shared interleave CTE chain (lon even bits -> MSB pair leads
        # with lon), base32 chars from 5-bit groups
        "geohash_strings": f"""
WITH {_pts_cte()},
q AS (
  SELECT doc_id,
         CAST(floor((lon + 180.0) / 360.0 * 262144.0) AS BIGINT) AS lx,
         CAST(floor((lat + 90.0) / 180.0 * 131072.0) AS BIGINT) AS ly
  FROM pts),
{oracle.sql_interleave_ctes('q', 'doc_id', 'lx', 'ly', out_col='code', prefix='g')},
gh AS (
  SELECT doc_id,
         {" || ".join(f"substr('" + "0123456789bcdefghjkmnpqrstuvwxyz" + f"', CAST(((code >> {35 - 5 * (i + 1)}) & 31) AS INTEGER) + 1, 1)" for i in range(7))} AS geohash
  FROM g_out)
SELECT doc_id, geohash, substr(geohash, 1, 4) AS geohash4 FROM gh""",
        # mirrors spatial.tile_child_coverage: distinct z12 children per
        # z10 parent via the shared tile arithmetic
        "tile_child_coverage": f"""
WITH img AS (SELECT CAST(substr(image_id, 5, 12) AS BIGINT) AS img_id FROM {img_pq}),
pts2 AS (SELECT {oracle.sql_derive_lon('img_id')} AS lon, {oracle.sql_derive_lat('img_id')} AS lat FROM img),
ch AS (
  SELECT {oracle.sql_tile_x('lon', 12)} AS cx, {oracle.sql_tile_y('lat', 12)} AS cy, count(*) AS n
  FROM pts2 GROUP BY 1, 2)
SELECT cx >> 2 AS px, cy >> 2 AS py,
       CAST(count(*) AS BIGINT) AS n_children_occupied,
       CAST(sum(n) AS BIGINT) AS n_images,
       round(CAST(count(*) AS DOUBLE) / 16.0, 6) AS coverage
FROM ch GROUP BY 1, 2""",
        # mirrors spatial.zone_border_distance: four rect margins,
        # fixed-point min/sum, one mirrored mean
        "zone_border_distance": f"""
WITH {_pts_cte()},
j AS (
  SELECT b.rel_id,
         CAST(floor(least(pts.lon - b.lon_min, b.lon_max - pts.lon,
                          pts.lat - b.lat_min, b.lat_max - pts.lat) * 1000000000.0 + 0.5) AS BIGINT) AS dfp
  FROM pts JOIN {rects}
  ON pts.lon >= b.lon_min AND pts.lon < b.lon_max AND pts.lat >= b.lat_min AND pts.lat < b.lat_max)
SELECT rel_id, CAST(count(*) AS BIGINT) AS n_points,
       CAST(min(dfp) AS BIGINT) AS min_depth_fp,
       round(CAST(sum(dfp) AS DOUBLE) / 1000000000.0 / CAST(count(*) AS DOUBLE), 6) AS mean_depth
FROM j GROUP BY rel_id""",
        "zone_overlay_area": f"SELECT * FROM read_parquet('{golden.zone_overlay_area_path()}')",
        # mirrors spatial.zone_overlap_point_counts: double containment,
        # ordered pair (rel_a < rel_b)
        "zone_overlap_point_counts": f"""
WITH {_pts_cte()}
SELECT a.rel_id AS rel_a, c.rel_id AS rel_b, CAST(count(*) AS BIGINT) AS n_points
FROM pts
JOIN {oracle.sql_admin_rects_values().replace(") AS b(", ") AS a(")} 
  ON pts.lon >= a.lon_min AND pts.lon < a.lon_max AND pts.lat >= a.lat_min AND pts.lat < a.lat_max
JOIN {oracle.sql_admin_rects_values().replace(") AS b(", ") AS c(")} 
  ON pts.lon >= c.lon_min AND pts.lon < c.lon_max AND pts.lat >= c.lat_min AND pts.lat < c.lat_max
     AND c.rel_id > a.rel_id
GROUP BY 1, 2""",
        "pip_join_auto": f"""
WITH {_pts_cte()}
SELECT doc_id, rel_id, admin_level FROM pts JOIN {rects}
ON pts.lon >= b.lon_min AND pts.lon < b.lon_max AND pts.lat >= b.lat_min AND pts.lat < b.lat_max""",
        "pip_join_strtree": f"""
WITH {_pts_cte()}
SELECT doc_id, rel_id, admin_level FROM pts JOIN {rects}
ON pts.lon >= b.lon_min AND pts.lon < b.lon_max AND pts.lat >= b.lat_min AND pts.lat < b.lat_max""",
        "pip_count": f"""
WITH {_pts_cte()}
SELECT rel_id, count(*) AS n_points FROM pts JOIN {rects}
ON pts.lon >= b.lon_min AND pts.lon < b.lon_max AND pts.lat >= b.lat_min AND pts.lat < b.lat_max
GROUP BY rel_id""",
        # ONE SQL string for all three kNN plans (broadcast / shuffle /
        # auto) — the "both plans are oracle-identical" invariant is
        # only checked if they literally share the mirror
        "knn_pois": _KNN_ORACLE_SQL,
        "knn_pois_shuffle": _KNN_ORACLE_SQL,
        "knn_pois_auto": _KNN_ORACLE_SQL,
        "radius_join": f"""
WITH {_pts_cte()}
SELECT doc_id, p.poi_id FROM pts JOIN {pois} ON {sqd} <= {RADIUS_DEG * RADIUS_DEG!r}""",
        "poi_in_area": f"""
SELECT b.rel_id, count(*) AS n_pois FROM {pois} JOIN {rects6}
ON p.lon >= b.lon_min AND p.lon < b.lon_max AND p.lat >= b.lat_min AND p.lat < b.lat_max
WHERE p.value = 'restaurant' GROUP BY b.rel_id""",
        "flagship": f"""
WITH {_pts_cte()},
j AS (SELECT doc_id, lon, lat, rel_id FROM pts JOIN {rects}
      ON pts.lon >= b.lon_min AND pts.lon < b.lon_max AND pts.lat >= b.lat_min AND pts.lat < b.lat_max),
t AS (SELECT doc_id, rel_id, 10 AS z, {oracle.sql_tile_x('lon', 10)} AS x, {oracle.sql_tile_y('lat', 10)} AS y FROM j)
SELECT CAST(z AS INTEGER) AS z, x, y, rel_id, count(*) AS n_images FROM t GROUP BY z, x, y, rel_id""",
        # mirrors relational.duplicate_orders: (customer, exact cents)
        # blocking + date-window verify
        "duplicate_orders": f"""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) // {relational.DUP_ORDER_BAND_CENTS} AS band,
         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day
  FROM orders)
SELECT a.o_custkey, a.band,
       least(a.o_orderkey, b.o_orderkey) AS order_a,
       greatest(a.o_orderkey, b.o_orderkey) AS order_b,
       abs(a.day - b.day) AS day_gap
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.band = b.band
 AND a.o_orderkey < b.o_orderkey
 AND abs(a.day - b.day) <= {relational.DUP_ORDER_WINDOW_DAYS}""",
        # mirrors relational.association_rules: both directed rules per
        # supported pair; confidence = s/n_a, lift = conf/(n_b/n_orders)
        "association_rules": f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pc AS (SELECT l_partkey AS p, CAST(count(*) AS BIGINT) AS n FROM lp GROUP BY 1),
no AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM lp),
pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, CAST(count(*) AS BIGINT) AS support
          FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND b.l_partkey > a.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= {relational.COOC_MIN_SUPPORT}),
r AS (SELECT part_a AS antecedent, part_b AS consequent, support FROM pairs
      UNION ALL SELECT part_b, part_a, support FROM pairs)
SELECT r.antecedent, r.consequent, r.support, ca.n AS n_a, cb.n AS n_b,
       round(CAST(r.support AS DOUBLE) / CAST(ca.n AS DOUBLE), 6) AS confidence,
       round((CAST(r.support AS DOUBLE) / CAST(ca.n AS DOUBLE))
             / (CAST(cb.n AS DOUBLE) / CAST(no.n_orders AS DOUBLE)), 6) AS lift
FROM r JOIN pc ca ON ca.p = r.antecedent JOIN pc cb ON cb.p = r.consequent CROSS JOIN no""",
        # mirrors relational.referential_integrity: per-FK-edge anti-join
        "referential_integrity": " UNION ALL ".join(
            f"""
SELECT '{child}' AS child_table, '{ckey}' AS fk_column, '{parent}' AS parent_table,
       (SELECT CAST(count(*) AS BIGINT) FROM {child}) AS n_child_rows,
       (SELECT CAST(count(DISTINCT {ckey}) AS BIGINT) FROM {child}) AS n_child_keys,
       (SELECT CAST(count(*) AS BIGINT) FROM
          (SELECT DISTINCT {ckey} AS k FROM {child}) c
          WHERE c.k NOT IN (SELECT {pkey} FROM {parent})) AS n_orphan_keys,
       (SELECT CAST(count(*) AS BIGINT) FROM {child} c
          WHERE c.{ckey} NOT IN (SELECT {pkey} FROM {parent})) AS n_orphan_rows"""
            for child, ckey, parent, pkey in relational.FK_EDGES
        ),
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_revenue,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "orders_by_nation": """
SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_revenue
FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name""",
        "local_supplier_volume": """
SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name""",
        "nation_trade_volume": """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1','NATION_2') AND cn.n_name IN ('NATION_1','NATION_2')
  AND sn.n_name <> cn.n_name
  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
GROUP BY 1, 2, 3""",
        "returned_revenue": """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey LIMIT 20""",
        "promo_revenue": """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1.0 - l_discount)), 2) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'""",
        "large_orders": """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, CAST(o_orderkey AS BIGINT) AS o_orderkey,
       o_orderdate, o_totalprice, sum(l_quantity) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1, 2, 3, 4, 5
HAVING sum(l_quantity) > 300.0""",
        "forecast_revenue": """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""",
        "market_share": """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(round(sum(CASE WHEN sn.n_name = 'NATION_2' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END), 2)
             / round(sum(l_extendedprice * (1.0 - l_discount)), 2), 6) AS mkt_share
FROM lineitem JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY 1 ORDER BY 1""",
        "important_parts": """
WITH pp AS (
  SELECT l_partkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
  FROM lineitem GROUP BY 1)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name, revenue
FROM pp JOIN part ON p_partkey = l_partkey
WHERE revenue > (SELECT round(sum(revenue), 2) * 0.00075 FROM pp)
ORDER BY revenue DESC, p_partkey""",
        "line_priority_counts": """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus ORDER BY l_linestatus""",
        "customer_distribution": """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
  SELECT c_custkey, CAST(count(o_custkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderdate >= DATE '2001-01-01'
  GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
        "top_supplier": """
WITH pp AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_revenue
FROM pp JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM pp)
ORDER BY s_suppkey""",
        "small_quantity_revenue": """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < 0.2 * (
    SELECT sum(l2.l_quantity) / count(*) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)""",
        "disjunctive_revenue": """
SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1.0 AND 11.0)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10.0 AND 20.0)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20.0 AND 30.0)""",
        "exclusive_return_suppliers": """
WITH pairs AS (
  SELECT l_orderkey, l_suppkey, max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS any_r
  FROM lineitem GROUP BY 1, 2),
per_order AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(any_r) AS n_returning
  FROM pairs GROUP BY 1)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM pairs JOIN per_order USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE any_r = 1 AND n_supp > 1 AND n_returning = 1
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""",
        "idle_customers": """
WITH thr AS (SELECT round(avg(c_acctbal), 2) AS t FROM customer WHERE c_acctbal > 0.0)
SELECT n_name, CAST(count(*) AS BIGINT) AS n_custs, round(sum(c_acctbal), 2) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey CROSS JOIN thr
WHERE c_acctbal > t
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderdate >= DATE '2001-01-01')
GROUP BY n_name ORDER BY n_name""",
        "min_cost_supplier": """
WITH pf AS (SELECT p_partkey, p_name FROM part WHERE p_size = 15 AND p_type = 'SMALL'),
sr AS (SELECT s_suppkey, s_name, s_acctbal, n_name
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
uc AS (SELECT l_partkey, l_suppkey, min(round(l_extendedprice / l_quantity, 2)) AS unit_cost
       FROM lineitem JOIN pf ON l_partkey = p_partkey JOIN sr ON l_suppkey = s_suppkey
       GROUP BY 1, 2),
mins AS (SELECT l_partkey, min(unit_cost) AS min_cost FROM uc GROUP BY 1)
SELECT s_acctbal, s_name, n_name, CAST(uc.l_partkey AS BIGINT) AS p_partkey, p_name, min_cost
FROM uc JOIN mins ON uc.l_partkey = mins.l_partkey AND uc.unit_cost = mins.min_cost
JOIN sr ON uc.l_suppkey = sr.s_suppkey
JOIN pf ON uc.l_partkey = pf.p_partkey
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
        "product_profit": """
SELECT n_name, CAST(o_year AS BIGINT) AS o_year, CAST(sum(cents) AS DOUBLE) / 100 AS profit
FROM (
  SELECT n_name, year(o_orderdate) AS o_year,
         CAST(round((l_extendedprice * (1.0 - l_discount) - 0.6 * p_retailprice * l_quantity) * 100.0, 0) AS BIGINT) AS cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE p_name LIKE '%bolt%')
GROUP BY 1, 2 ORDER BY n_name, o_year DESC""",
        "supplier_part_variety": """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
        "dominant_part_suppliers": """
WITH f AS (
  SELECT l_partkey, l_suppkey, CAST(round(l_quantity * 100.0, 0) AS BIGINT) AS qc
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'),
pair AS (SELECT l_partkey, l_suppkey, sum(qc) AS supp_qc FROM f GROUP BY 1, 2),
tot AS (SELECT l_partkey, sum(supp_qc) AS total_qc FROM pair GROUP BY 1)
SELECT DISTINCT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, n_name
FROM pair JOIN tot USING (l_partkey)
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE 2 * supp_qc > total_qc
ORDER BY s_suppkey""",
        "revenue_rollup": """
WITH f AS (
  SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey)
SELECT n_name, o_year, CAST(sum(cents) AS DOUBLE) / 100 AS revenue
FROM f GROUP BY ROLLUP (n_name, o_year)""",
        "customer_value_rank": """
SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey, c_acctbal,
       CAST(dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS BIGINT) AS bal_rank
FROM customer""",
        "bloom_semi_join": """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY 1 ORDER BY 1""",
        "hourly_gap_fill": """
WITH agg AS (
  SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
grid AS (
  SELECT unnest(generate_series((SELECT min(window_start) FROM agg),
                                (SELECT max(window_start) FROM agg),
                                INTERVAL 1 HOUR)) AS window_start)
SELECT g.window_start, CAST(coalesce(a.n_events, 0) AS BIGINT) AS n_events
FROM grid g LEFT JOIN agg a USING (window_start) ORDER BY 1""",
        "window_distinct_users": """
SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1 ORDER BY 1""",
        "order_priority_counts": """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority""",
        "topk_orders_per_customer": """
WITH ranked AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS order_rank
  FROM orders)
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice, order_rank FROM ranked WHERE order_rank <= 2""",
        "top_unshipped_orders": """
SELECT l_orderkey, o_orderdate, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15' AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY sum(l_extendedprice * (1.0 - l_discount)) DESC, o_orderdate, l_orderkey LIMIT 10""",
        "filtered_part_stats": """
SELECT p_brand, count(*) AS n_parts, round(min(p_retailprice), 2) AS min_price, round(max(p_retailprice), 2) AS max_price
FROM part WHERE p_size >= 20 GROUP BY p_brand""",
        "customer_high_value_counts": """
WITH hv AS (SELECT o_custkey, count(*) AS n_high FROM orders WHERE o_totalprice > 400000.0 GROUP BY o_custkey)
SELECT c_custkey, c_name, COALESCE(hv.n_high, 0) AS n_high
FROM customer LEFT JOIN hv ON c_custkey = o_custkey""",
        "part_price_stats": """
SELECT p_type, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_price,
       round(stddev_samp(p_retailprice), 4) AS std_price
FROM part GROUP BY p_type""",
        "tumbling_window": """
SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2""",
        "sessionize": """
WITH lagd AS (
  SELECT user_id, ts, event_id, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events),
flags AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM lagd),
sess AS (
  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM flags)
SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
FROM sess GROUP BY user_id, session_id""",
        "session_campaign_overlap": f"""
WITH lagd AS (
  SELECT user_id, ts, event_id, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events),
flags AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM lagd),
sess AS (
  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM flags),
sw AS (
  SELECT user_id, session_id, epoch_us(min(ts)) AS s0, epoch_us(max(ts)) AS s1
  FROM sess GROUP BY 1, 2),
camp AS (
  SELECT * FROM (VALUES {", ".join(f"({c}, epoch_us(TIMESTAMP '{s}'), epoch_us(TIMESTAMP '{e}'))" for c, s, e in windows.CAMPAIGNS)})
  t(campaign_id, c0, c1)),
ov AS (
  SELECT campaign_id, least(s1, c1) - greatest(s0, c0) AS overlap_us
  FROM sw CROSS JOIN camp
  WHERE least(s1, c1) - greatest(s0, c0) > 0)
SELECT CAST(campaign_id AS BIGINT) AS campaign_id, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(overlap_us) AS BIGINT) AS total_overlap_us
FROM ov GROUP BY 1 ORDER BY 1""",
        "winsorize_stats": f"""
WITH b AS (SELECT quantile_disc(value, {stats.WINSOR_LO!r}) AS vlo,
                  quantile_disc(value, {stats.WINSOR_HI!r}) AS vhi FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN value < vlo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
       CAST(sum(CASE WHEN value > vhi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
       round(sum(least(greatest(value, vlo), vhi)), 4) AS sum_winsor
FROM events CROSS JOIN b GROUP BY event_type ORDER BY event_type""",
        "sliding_window": """
WITH grid AS (
  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000) AS w0, event_type, value FROM events),
u AS (
  SELECT w0 AS window_start, event_type, value FROM grid
  UNION ALL
  SELECT w0 - INTERVAL 30 MINUTE AS window_start, event_type, value FROM grid)
SELECT window_start, event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM u GROUP BY window_start, event_type""",
        "late_event_stats": """
WITH w AS (
  SELECT event_type, ts,
         max(ts) OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events)
SELECT event_type, count(*) AS n_events,
       CAST(sum(CASE WHEN wm IS NOT NULL AND ts < wm - INTERVAL 60 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM w GROUP BY event_type""",
        "asof_join": """
WITH p AS (SELECT user_id, event_id AS pid, ts AS pts FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, event_id AS cid, ts AS cts FROM events WHERE event_type = 'click'),
ranked AS (
  SELECT p.user_id, p.pid, c.cid, epoch_us(p.pts) - epoch_us(c.cts) AS gap_us,
         row_number() OVER (PARTITION BY p.pid ORDER BY c.cts DESC, c.cid DESC) AS rn
  FROM p JOIN c ON p.user_id = c.user_id AND c.cts <= p.pts)
SELECT user_id, pid AS purchase_event_id, cid AS prior_click_event_id, gap_us
FROM ranked WHERE rn = 1""",
        "range_join_campaigns": """
WITH camp(campaign_id, cstart, cend) AS (VALUES
  (1, TIMESTAMP '2024-01-03', TIMESTAMP '2024-01-06'),
  (2, TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-09'),
  (3, TIMESTAMP '2024-01-12', TIMESTAMP '2024-01-13'),
  (4, TIMESTAMP '2024-01-20', TIMESTAMP '2024-01-27'))
SELECT campaign_id, event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events JOIN camp ON ts >= cstart AND ts < cend
GROUP BY campaign_id, event_type""",
        "event_type_rates": """
SELECT event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value FROM events GROUP BY event_type""",
        "conversion_funnel": """
WITH v AS (
  SELECT user_id, ts, event_id FROM (
    SELECT user_id, ts, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type = 'view') WHERE rn = 1),
c AS (
  SELECT user_id, ts, event_id FROM (
    SELECT e.user_id, e.ts, e.event_id,
           row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
    FROM events e JOIN v ON e.user_id = v.user_id
     AND (e.ts > v.ts OR (e.ts = v.ts AND e.event_id > v.event_id))
    WHERE e.event_type = 'click') WHERE rn = 1),
p AS (
  SELECT user_id, ts, event_id FROM (
    SELECT e.user_id, e.ts, e.event_id,
           row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
    FROM events e JOIN c ON e.user_id = c.user_id
     AND (e.ts > c.ts OR (e.ts = c.ts AND e.event_id > c.event_id))
    WHERE e.event_type = 'purchase') WHERE rn = 1)
SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage, count(*) AS n_users FROM v
UNION ALL SELECT 2, 'click', count(*) FROM c
UNION ALL SELECT 3, 'purchase', count(*) FROM p""",
        "events_union": """
SELECT event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value FROM events
WHERE event_type IN ('click', 'view') GROUP BY event_type""",
        "distinct_users": """
SELECT COUNT(DISTINCT user_id) AS n_users FROM events""",
        "value_quantiles": """
SELECT CAST(0.5 AS DOUBLE) AS q, quantile_disc(value, 0.5) AS value FROM events
UNION ALL SELECT CAST(0.9 AS DOUBLE), quantile_disc(value, 0.9) FROM events
UNION ALL SELECT CAST(0.99 AS DOUBLE), quantile_disc(value, 0.99) FROM events""",
        # mirrors stats.hill_tail_index: exact top-(k+1) order stats,
        # ln-ratio pins at 1e-9
        "hill_tail_index": f"""
WITH v AS (SELECT value FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
t2 AS (SELECT value, row_number() OVER (ORDER BY value DESC) AS rn FROM v),
top AS (SELECT value, rn FROM t2 WHERE rn <= {stats.HILL_K} + 1),
xk AS (SELECT value AS x_k1 FROM top WHERE rn = {stats.HILL_K} + 1),
pins AS (SELECT CAST(floor(ln(top.value / xk.x_k1) * 1000000000.0 + 0.5) AS BIGINT) AS p,
                top.value
         FROM top, xk WHERE top.rn <= {stats.HILL_K}),
agg AS (SELECT CAST(sum(p) AS BIGINT) AS s, avg(value) AS mean_top FROM pins)
SELECT {stats.HILL_K} AS k,
       round(xk.x_k1, 6) AS x_k1,
       agg.s AS sum_ln_fp,
       round(CAST({stats.HILL_K} AS DOUBLE) / (CAST(agg.s AS DOUBLE) / 1000000000.0), 6) AS hill_alpha,
       round(agg.mean_top - xk.x_k1, 6) AS mean_excess
FROM agg, xk""",
        # mirrors stats.hist_quantile_eval: bin = floor((v-vmin)/width)
        # clipped, est = upper bin edge, rank audit on the UNROUNDED est
        "hist_quantile_eval": """
WITH v AS (SELECT value FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
s AS (SELECT CAST(count(*) AS BIGINT) AS n, min(value) AS vmin, max(value) AS vmax,
             (max(value) - min(value)) / 512.0 AS width FROM v),
qs AS (SELECT CAST(0.5 AS DOUBLE) AS q UNION ALL SELECT 0.9 UNION ALL SELECT 0.99),
h AS (SELECT greatest(least(CAST(floor((value - s.vmin) / s.width) AS BIGINT), 511), 0) AS bin,
             CAST(count(*) AS BIGINT) AS cnt
      FROM v, s GROUP BY 1),
c AS (SELECT bin, CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum FROM h),
tgt AS (SELECT q, greatest(1, CAST(ceil(q * s.n) AS BIGINT)) AS k FROM qs, s),
eb AS (SELECT t.q, min(c.bin) AS bin FROM tgt t JOIN c ON c.cum >= t.k GROUP BY 1),
est AS (SELECT eb.q, s.n, s.vmin + CAST(eb.bin + 1 AS DOUBLE) * s.width AS est_value FROM eb, s),
ex AS (SELECT CAST(0.5 AS DOUBLE) AS q, quantile_disc(value, 0.5) AS exact_value FROM v
       UNION ALL SELECT 0.9, quantile_disc(value, 0.9) FROM v
       UNION ALL SELECT 0.99, quantile_disc(value, 0.99) FROM v),
rk AS (SELECT e.q, CAST(count(*) AS BIGINT) AS n_le
       FROM est e JOIN v ON v.value <= e.est_value GROUP BY 1)
SELECT e.q, e.n AS n_values,
       round(e.est_value, 6) AS est_value,
       round(ex.exact_value, 6) AS exact_value,
       round(e.est_value - ex.exact_value, 6) AS value_err,
       round(CAST(rk.n_le AS DOUBLE) / CAST(e.n AS DOUBLE), 6) AS rank_frac,
       round(CAST(rk.n_le AS DOUBLE) / CAST(e.n AS DOUBLE) - e.q, 6) AS rank_err
FROM est e JOIN ex ON ex.q = e.q JOIN rk ON rk.q = e.q""",
        # mirrors relational.part_cooccurrence: distinct-part pairs per
        # order via the canonical self-join
        "part_cooccurrence": f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, CAST(count(*) AS BIGINT) AS support
FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND b.l_partkey > a.l_partkey
GROUP BY 1, 2 HAVING count(*) >= {relational.COOC_MIN_SUPPORT}""",
        # mirrors windows.daily_cusum: integer-scaled CUSUM over daily
        # counts, argmax |S| flagged (smallest day wins ties, as numpy
        # argmax does)
        "daily_cusum": """
WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS dd, CAST(sum(n_events) AS BIGINT) AS t FROM d),
c AS (SELECT day, n_events,
             CAST(sum(n_events * tot.dd - tot.t) OVER (ORDER BY day) AS BIGINT) AS cusum_scaled
      FROM d, tot),
pk AS (SELECT min(day) AS peak_day FROM c
       WHERE abs(cusum_scaled) = (SELECT max(abs(cusum_scaled)) FROM c))
SELECT c.day, c.n_events, c.cusum_scaled, c.day = pk.peak_day AS is_peak FROM c, pk""",
        "event_value_quantiles": """
SELECT event_type, CAST(0.5 AS DOUBLE) AS q, quantile_disc(value, 0.5) AS value FROM events GROUP BY event_type
UNION ALL SELECT event_type, CAST(0.9 AS DOUBLE), quantile_disc(value, 0.9) FROM events GROUP BY event_type
UNION ALL SELECT event_type, CAST(0.99 AS DOUBLE), quantile_disc(value, 0.99) FROM events GROUP BY event_type""",
        # mirrors stats.interpolated_quantiles: explicit rank selection
        # + the verbatim interpolation expression (NOT quantile_cont, so
        # the arithmetic is pinned on both sides)
        "interpolated_quantiles": f"""
WITH o AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
qs(q) AS (VALUES (0.25), (0.5), (0.75), (0.9)),
sel AS (
  SELECT DISTINCT o.event_type, qs.q, o.n,
         CAST(floor(qs.q * (o.n - 1)) AS BIGINT) AS lo,
         CAST(ceil(qs.q * (o.n - 1)) AS BIGINT) AS hi,
         qs.q * (o.n - 1) - floor(qs.q * (o.n - 1)) AS frac
  FROM (SELECT DISTINCT event_type, n FROM o) o CROSS JOIN qs),
v AS (
  SELECT s.event_type, s.q, s.n, a.value AS vlo, b.value AS vhi, s.frac
  FROM sel s
  JOIN o a ON a.event_type = s.event_type AND a.rk = s.lo
  JOIN o b ON b.event_type = s.event_type AND b.rk = s.hi)
SELECT event_type, q, CAST(n AS BIGINT) AS n, round(vlo + (vhi - vlo) * frac, 6) AS q_value
FROM v""",
        # mirrors stats.value_concentration: int64 cents per user, top
        # ceil(n/10) by (cents desc, user_id), one mirrored share
        "value_concentration": """
WITH u AS (
  SELECT event_type, user_id,
         CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cents DESC, user_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n_users
  FROM u),
k AS (SELECT *, CAST((n_users + 9) // 10 AS BIGINT) AS top_k FROM r)
SELECT event_type, CAST(n_users AS BIGINT) AS n_users, top_k,
       CAST(sum(CASE WHEN rk <= top_k THEN cents ELSE 0 END) AS BIGINT) AS top_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       round(CAST(sum(CASE WHEN rk <= top_k THEN cents ELSE 0 END) AS DOUBLE)
             / CAST(sum(cents) AS DOUBLE), 6) AS top_share
FROM k GROUP BY 1, 2, 3""",
        # mirrors stats.mad_robust_stats: explicit rank selection for the
        # median, a deviation pass on the UNROUNDED median, the same
        # selection for the MAD
        "mad_robust_stats": f"""
WITH o AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
sel AS (
  SELECT event_type, n,
         CAST(floor(0.5 * (n - 1)) AS BIGINT) AS lo,
         CAST(ceil(0.5 * (n - 1)) AS BIGINT) AS hi,
         0.5 * (n - 1) - floor(0.5 * (n - 1)) AS frac
  FROM (SELECT DISTINCT event_type, n FROM o)),
med AS (
  SELECT s.event_type, s.n, a.value + (b.value - a.value) * s.frac AS med
  FROM sel s
  JOIN o a ON a.event_type = s.event_type AND a.rk = s.lo
  JOIN o b ON b.event_type = s.event_type AND b.rk = s.hi),
d AS (
  SELECT e.event_type, abs(e.value - m.med) AS dev
  FROM events e JOIN med m ON m.event_type = e.event_type),
o2 AS (
  SELECT event_type, dev,
         row_number() OVER (PARTITION BY event_type ORDER BY dev) - 1 AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d),
sel2 AS (
  SELECT event_type, n,
         CAST(floor(0.5 * (n - 1)) AS BIGINT) AS lo,
         CAST(ceil(0.5 * (n - 1)) AS BIGINT) AS hi,
         0.5 * (n - 1) - floor(0.5 * (n - 1)) AS frac
  FROM (SELECT DISTINCT event_type, n FROM o2)),
mad AS (
  SELECT s.event_type, a.dev + (b.dev - a.dev) * s.frac AS mad
  FROM sel2 s
  JOIN o2 a ON a.event_type = s.event_type AND a.rk = s.lo
  JOIN o2 b ON b.event_type = s.event_type AND b.rk = s.hi)
SELECT m.event_type, CAST(m.n AS BIGINT) AS n, round(m.med, 6) AS median, round(x.mad, 6) AS mad
FROM med m JOIN mad x ON x.event_type = m.event_type""",
        # mirrors stats.hour_type_pivot: conditional aggregation spread
        # into 24 wide columns
        "hour_type_pivot": f"""
SELECT event_type,
       {", ".join(f"CAST(sum(CASE WHEN CAST(epoch_us(ts) // 3600000000 AS BIGINT) % 24 = {h} THEN 1 ELSE 0 END) AS BIGINT) AS h{h:02d}" for h in range(24))}
FROM events GROUP BY event_type""",
        "chi2_independence": """
WITH c AS (
  SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) % 24 AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
r AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS rn FROM c GROUP BY 1),
col AS (SELECT hour, CAST(sum(n) AS BIGINT) AS cn FROM c GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST(count(DISTINCT hour) AS BIGINT) AS n_hours
        FROM c),
x AS (
  SELECT coalesce(c.n, 0) AS n, r.rn, col.cn
  FROM r CROSS JOIN col
  LEFT JOIN c ON c.event_type = r.event_type AND c.hour = col.hour),
s AS (
  SELECT sum(
    (CAST(x.n AS DOUBLE) - CAST(x.rn AS DOUBLE) * CAST(x.cn AS DOUBLE) / CAST(tot.nt AS DOUBLE))
    * (CAST(x.n AS DOUBLE) - CAST(x.rn AS DOUBLE) * CAST(x.cn AS DOUBLE) / CAST(tot.nt AS DOUBLE))
    / (CAST(x.rn AS DOUBLE) * CAST(x.cn AS DOUBLE) / CAST(tot.nt AS DOUBLE))
  ) AS chi2
  FROM x CROSS JOIN tot)
SELECT tot.nt AS n_total, tot.n_types, tot.n_hours,
       (tot.n_types - 1) * (tot.n_hours - 1) AS dof,
       round(s.chi2, 6) AS chi2,
       round(sqrt(s.chi2 / (CAST(tot.nt AS DOUBLE) * CAST(least(tot.n_types - 1, tot.n_hours - 1) AS DOUBLE))), 6) AS cramers_v
FROM s CROSS JOIN tot""",
        "search_by_token": f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE list_contains(string_split(lower(text), ' '), '{SEARCH_TOKEN}')""",
        "anti_search": f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE NOT list_contains(string_split(lower(text), ' '), '{SEARCH_TOKEN}')""",
        "token_doc_frequency": """
WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
d AS (SELECT token, count(DISTINCT doc_id) AS n_docs FROM toks GROUP BY token)
SELECT token, n_docs FROM d WHERE n_docs >= 50""",
        # mirrors text.vocab_coverage_curve: (count desc, token) ranking,
        # cumulative coverage at the checkpoint Ks
        "bpe_merges": f"SELECT * FROM read_parquet('{golden.bpe_merges_path(SF001, bpe.BPE_N_MERGES)}')",
        "lz78_complexity": f"SELECT * FROM read_parquet('{golden.lz78_complexity_path(SF001)}')",
        "bpe_encode_stats": f"SELECT * FROM read_parquet('{golden.bpe_encode_stats_path(SF001, bpe.BPE_N_MERGES)}')",
        "vocab_coverage_curve": """
WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY token),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rk FROM c),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS vocab FROM c),
ks(k) AS (VALUES (16), (64), (256), (1024), (4096))
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(least(ks.k, tot.vocab) AS BIGINT) AS n_vocab_used,
       CAST(coalesce(sum(CASE WHEN r.rk <= ks.k THEN r.n END), 0) AS BIGINT) AS covered,
       tot.total,
       round(CAST(coalesce(sum(CASE WHEN r.rk <= ks.k THEN r.n END), 0) AS DOUBLE) / CAST(tot.total AS DOUBLE), 6) AS coverage
FROM ks CROSS JOIN tot LEFT JOIN r ON r.rk <= ks.k
GROUP BY ks.k, tot.total, tot.vocab""",
        "token_stats": """
SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, length(text) AS n_chars FROM documents""",
        "mtld_diversity": f"SELECT * FROM read_parquet('{golden.mtld_path(SF001)}')",
        # mirrors text.heaps_law: prefix deciles, first-appearance
        # vocabulary growth, zipf-style closed-form OLS
        "heaps_law": f"""
WITH md AS (SELECT CAST(count(*) AS BIGINT) AS max_doc FROM documents),
cut AS (SELECT k, (md.max_doc * k) // {text.HEAPS_POINTS} AS cutoff
        FROM (SELECT unnest(generate_series(1, {text.HEAPS_POINTS})) AS k), md),
w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
f AS (SELECT tok, CAST(min(doc_id) AS BIGINT) AS first_doc FROM w GROUP BY 1),
vv AS (SELECT c.k, CAST(count(*) AS BIGINT) AS v FROM cut c JOIN f ON f.first_doc <= c.cutoff GROUP BY 1),
dn AS (SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS ntok FROM documents),
nn AS (SELECT c.k, CAST(sum(dn.ntok) AS BIGINT) AS n FROM cut c JOIN dn ON dn.doc_id <= c.cutoff GROUP BY 1),
pts AS (SELECT vv.k, nn.n, vv.v, ln(CAST(nn.n AS DOUBLE)) AS x, ln(CAST(vv.v AS DOUBLE)) AS y
        FROM vv JOIN nn ON nn.k = vv.k),
fit AS (SELECT CAST(count(*) AS DOUBLE) AS nf, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy FROM pts)
SELECT round(CAST(c.cutoff AS DOUBLE) / CAST(md.max_doc AS DOUBLE), 6) AS prefix_frac,
       nn.n AS n_tokens_total, vv.v AS n_distinct,
       round((fit.nf * fit.sxy - fit.sx * fit.sy) / (fit.nf * fit.sxx - fit.sx * fit.sx), 6) AS heaps_beta,
       round((fit.sy - ((fit.nf * fit.sxy - fit.sx * fit.sy) / (fit.nf * fit.sxx - fit.sx * fit.sx)) * fit.sx)
             / fit.nf, 6) AS heaps_log_k
FROM cut c JOIN vv ON vv.k = c.k JOIN nn ON nn.k = c.k CROSS JOIN fit CROSS JOIN md""",
        # mirrors text.readability_scores: vowel-run syllables floored
        # at 1/word, [.!?] sentence marks floored at 1/doc
        "readability_scores": """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
ws AS (SELECT doc_id,
              greatest(1, len(regexp_extract_all(word, '[aeiouy]+'))) AS syl
       FROM w WHERE word <> ''),
per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(syl) AS BIGINT) AS n_syllables
        FROM ws GROUP BY 1),
sen AS (SELECT doc_id,
               CAST(greatest(1, len(regexp_extract_all(text, '[.!?]'))) AS BIGINT) AS n_sentences
        FROM documents)
SELECT d.doc_id,
       coalesce(per.n_words, 0) AS n_words,
       sen.n_sentences,
       coalesce(per.n_syllables, 0) AS n_syllables,
       round(206.835
             - 1.015 * (CAST(greatest(coalesce(per.n_words, 0), 1) AS DOUBLE)
                        / CAST(sen.n_sentences AS DOUBLE))
             - 84.6 * (CAST(coalesce(per.n_syllables, 0) AS DOUBLE)
                       / CAST(greatest(coalesce(per.n_words, 0), 1) AS DOUBLE)), 6) AS flesch_ease,
       round(0.39 * (CAST(greatest(coalesce(per.n_words, 0), 1) AS DOUBLE)
                     / CAST(sen.n_sentences AS DOUBLE))
             + 11.8 * (CAST(coalesce(per.n_syllables, 0) AS DOUBLE)
                       / CAST(greatest(coalesce(per.n_words, 0), 1) AS DOUBLE))
             - 15.59, 6) AS fk_grade
FROM documents d
LEFT JOIN per ON per.doc_id = d.doc_id
JOIN sen ON sen.doc_id = d.doc_id""",
        "sequence_packing": f"""
WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
c AS (SELECT doc_id, n_tok, SUM(n_tok) OVER (ORDER BY doc_id) AS cum FROM t)
SELECT doc_id, n_tok, CAST(cum - n_tok AS BIGINT) AS start_tok,
       CAST((cum - n_tok) // {text.PACK_CTX} AS BIGINT) AS first_seq,
       CAST((cum - 1) // {text.PACK_CTX} AS BIGINT) AS last_seq,
       CAST((cum - 1) // {text.PACK_CTX} - (cum - n_tok) // {text.PACK_CTX} + 1 AS BIGINT) AS n_seqs
FROM c ORDER BY doc_id""",
        "corpus_flagship": f"""
WITH f AS (
  SELECT doc_id, text, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         length(text) AS n_chars,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
         (contains(text, '{{') OR contains(lower(text), 'lorem ipsum')) AS spam
  FROM documents),
k AS (SELECT doc_id, text, n_tok FROM f
      WHERE n_tok >= {text.FUNNEL_MIN_TOK} AND n_tok <= {text.FUNNEL_MAX_TOK}
        AND n_alpha * 2 >= n_chars AND NOT spam),
d AS (SELECT md5(text) AS h, min(doc_id) AS doc_id, min(n_tok) AS n_tok FROM k GROUP BY 1),
c AS (SELECT doc_id, n_tok, SUM(n_tok) OVER (ORDER BY doc_id) AS cum FROM d)
SELECT doc_id, n_tok, CAST(cum - n_tok AS BIGINT) AS start_tok,
       CAST((cum - n_tok) // {text.PACK_CTX} AS BIGINT) AS first_seq,
       CAST((cum - 1) // {text.PACK_CTX} AS BIGINT) AS last_seq,
       CAST((cum - 1) // {text.PACK_CTX} - (cum - n_tok) // {text.PACK_CTX} + 1 AS BIGINT) AS n_seqs
FROM c ORDER BY doc_id""",
        "shuffled_packing": f"""
WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                  md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
c AS (SELECT doc_id, n_tok, SUM(n_tok) OVER (ORDER BY h, doc_id) AS cum FROM t)
SELECT doc_id, n_tok, CAST(cum - n_tok AS BIGINT) AS start_tok,
       CAST((cum - n_tok) // {text.PACK_CTX} AS BIGINT) AS first_seq,
       CAST((cum - 1) // {text.PACK_CTX} AS BIGINT) AS last_seq,
       CAST((cum - 1) // {text.PACK_CTX} - (cum - n_tok) // {text.PACK_CTX} + 1 AS BIGINT) AS n_seqs
FROM c ORDER BY doc_id""",
        "token_budget_sample": f"""
WITH t AS (SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                  md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
c AS (SELECT doc_id, source, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id) AS cum FROM t)
SELECT doc_id, source, n_tok, CAST(cum AS BIGINT) AS cum_tokens
FROM c WHERE cum <= {text.TOKEN_BUDGET}""",
        "packing_stats": f"""
WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
c AS (SELECT doc_id, n_tok, SUM(n_tok) OVER (ORDER BY doc_id) AS cum FROM t)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST((sum(n_tok) + {text.PACK_CTX} - 1) // {text.PACK_CTX} AS BIGINT) AS n_seqs,
       CAST(sum(CASE WHEN (cum - 1) // {text.PACK_CTX} > (cum - n_tok) // {text.PACK_CTX} THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
       CAST(((sum(n_tok) + {text.PACK_CTX} - 1) // {text.PACK_CTX}) * {text.PACK_CTX} - sum(n_tok) AS BIGINT) AS tail_pad
FROM c""",
        "filter_funnel": f"""
WITH f AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         length(text) AS n_chars,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
         regexp_matches(text, '[.!?]$') AS endp,
         (contains(text, '{{') OR contains(lower(text), 'lorem ipsum')) AS spam
  FROM documents),
g AS (SELECT n_tok < {text.FUNNEL_MIN_TOK} AS r1,
             n_tok > {text.FUNNEL_MAX_TOK} AS r2,
             n_alpha * 2 < n_chars AS r3,
             NOT endp AS r4, spam AS r5 FROM f),
a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             CAST(sum(CASE WHEN NOT r1 AND r2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
             CAST(sum(CASE WHEN NOT r1 AND NOT r2 AND r3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
             CAST(sum(CASE WHEN NOT r1 AND NOT r2 AND NOT r3 AND r4 THEN 1 ELSE 0 END) AS BIGINT) AS d4,
             CAST(sum(CASE WHEN NOT r1 AND NOT r2 AND NOT r3 AND NOT r4 AND r5 THEN 1 ELSE 0 END) AS BIGINT) AS d5
      FROM g)
SELECT CAST(1 AS BIGINT) AS rule_idx, 'too_short' AS rule, n AS n_in, d1 AS n_dropped, n - d1 AS n_out FROM a
UNION ALL SELECT 2, 'too_long', n - d1, d2, n - d1 - d2 FROM a
UNION ALL SELECT 3, 'low_alpha', n - d1 - d2, d3, n - d1 - d2 - d3 FROM a
UNION ALL SELECT 4, 'no_terminal_punct', n - d1 - d2 - d3, d4, n - d1 - d2 - d3 - d4 FROM a
UNION ALL SELECT 5, 'spam_markers', n - d1 - d2 - d3 - d4, d5, n - d1 - d2 - d3 - d4 - d5 FROM a
ORDER BY rule_idx""",
        "length_bucket_padding": f"""
WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
b AS (SELECT n_tok, ((n_tok + {text.PAD_MULTIPLE} - 1) // {text.PAD_MULTIPLE}) * {text.PAD_MULTIPLE} AS bucket_len FROM t)
SELECT bucket_len, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
       CAST(bucket_len * count(*) - sum(n_tok) AS BIGINT) AS pad_tokens
FROM b GROUP BY bucket_len ORDER BY bucket_len""",
        "word_burstiness": """
WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
pd AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS k FROM t GROUP BY 1, 2),
s AS (SELECT token, CAST(sum(k) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS df
      FROM pd GROUP BY 1),
d AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT s.token, s.n, s.df,
       round(CAST(d.n_docs AS DOUBLE) * (1.0 - exp(-CAST(s.n AS DOUBLE) / CAST(d.n_docs AS DOUBLE))), 6) AS df_expected,
       round(CAST(d.n_docs AS DOUBLE) * (1.0 - exp(-CAST(s.n AS DOUBLE) / CAST(d.n_docs AS DOUBLE)))
             / CAST(s.df AS DOUBLE), 6) AS burstiness
FROM s CROSS JOIN d WHERE s.n >= 20""",
        "stratified_kfold": """
WITH r AS (SELECT source, lang,
                  (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1) % 5 AS fold
           FROM documents),
l AS (SELECT source, fold, lang, CAST(count(*) AS BIGINT) AS n FROM r GROUP BY 1, 2, 3)
SELECT source, CAST(fold AS BIGINT) AS fold, CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_langs
FROM l GROUP BY 1, 2""",
        "good_turing_unseen": """
WITH t AS (SELECT source, unnest(string_split(lower(text), ' ')) AS word FROM documents),
c AS (SELECT source, word, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1, 2),
s AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens, CAST(count(*) AS BIGINT) AS vocab,
             CAST(count(*) FILTER (WHERE n = 1) AS BIGINT) AS f1,
             CAST(count(*) FILTER (WHERE n = 2) AS BIGINT) AS f2
      FROM c GROUP BY 1)
SELECT source, n_tokens, vocab, f1, f2,
       round(CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS unseen_mass,
       round(CAST(vocab AS DOUBLE) + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0)
             / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)), 6) AS chao1
FROM s""",
        "naive_bayes_domain": """
WITH t AS (SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS word FROM documents),
cls AS (SELECT source AS c, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
cnt AS (SELECT source AS c, word, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1, 2),
totc AS (SELECT c, CAST(sum(n) AS BIGINT) AS tc FROM cnt GROUP BY 1),
vocab AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM t),
w AS (SELECT cnt.c, cnt.word,
             CAST(floor(ln(CAST(cnt.n + 1 AS DOUBLE) / CAST(totc.tc + vocab.v AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT) AS w_fp
      FROM cnt JOIN totc USING (c) CROSS JOIN vocab),
defw AS (SELECT totc.c, CAST(floor(ln(1.0 / CAST(totc.tc + vocab.v AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT) AS def_fp
         FROM totc CROSS JOIN vocab),
prior AS (SELECT cls.c, CAST(floor(ln(CAST(cls.n_docs AS DOUBLE) / CAST(tot.n AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT) AS p_fp
          FROM cls CROSS JOIN tot),
sc AS (SELECT tt.doc_id, tt.source AS true_source, cw.c, p.p_fp + sum(coalesce(w.w_fp, cw.def_fp)) AS score
       FROM t tt CROSS JOIN defw cw
       LEFT JOIN w ON w.c = cw.c AND w.word = tt.word
       JOIN prior p ON p.c = cw.c
       GROUP BY tt.doc_id, tt.source, cw.c, p.p_fp),
r AS (SELECT doc_id, true_source, c, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, c) AS rk FROM sc)
SELECT true_source, c AS pred_source, CAST(count(*) AS BIGINT) AS n_docs
FROM r WHERE rk = 1 GROUP BY 1, 2""",
        "gopher_rules": r"""
WITH d AS (SELECT row_number() OVER () AS rid, lower(text) AS low FROM documents),
t AS (SELECT rid, unnest(string_split(low, ' ')) AS word FROM d),
a AS (SELECT rid, CAST(count(*) AS BIGINT) AS n_words,
             CAST(count(*) FILTER (WHERE regexp_matches(word, '[a-z]')) AS BIGINT) AS n_alpha
      FROM t GROUP BY rid),
f AS (SELECT d.rid, a.n_words,
             CAST(length(d.low) AS BIGINT) - (a.n_words - 1) AS sum_wl,
             CAST(length(d.low) - length(replace(d.low, '#', '')) AS BIGINT) AS n_hash,
             CAST((length(d.low) - length(replace(d.low, '...', ''))) // 3 AS BIGINT) AS n_ell,
             a.n_alpha,
             (CASE WHEN regexp_matches(d.low, '\bthe\b') THEN 1 ELSE 0 END
              + CASE WHEN regexp_matches(d.low, '\bbe\b') THEN 1 ELSE 0 END
              + CASE WHEN regexp_matches(d.low, '\bto\b') THEN 1 ELSE 0 END
              + CASE WHEN regexp_matches(d.low, '\bof\b') THEN 1 ELSE 0 END
              + CASE WHEN regexp_matches(d.low, '\band\b') THEN 1 ELSE 0 END
              + CASE WHEN regexp_matches(d.low, '\bthat\b') THEN 1 ELSE 0 END
              + CASE WHEN regexp_matches(d.low, '\bhave\b') THEN 1 ELSE 0 END
              + CASE WHEN regexp_matches(d.low, '\bwith\b') THEN 1 ELSE 0 END) AS n_stop
      FROM d JOIN a ON d.rid = a.rid),
g AS (SELECT rid,
             CASE WHEN n_words < 50 OR n_words > 100000 THEN 1 ELSE 0 END AS f_wc,
             CASE WHEN 3 * n_words > sum_wl OR sum_wl > 10 * n_words THEN 1 ELSE 0 END AS f_mwl,
             CASE WHEN 10 * n_hash > n_words THEN 1 ELSE 0 END AS f_hash,
             CASE WHEN 10 * n_ell > 3 * n_words THEN 1 ELSE 0 END AS f_ell,
             CASE WHEN 10 * n_alpha < 8 * n_words THEN 1 ELSE 0 END AS f_alpha,
             CASE WHEN n_stop < 2 THEN 1 ELSE 0 END AS f_stop
      FROM f),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(f_wc) AS BIGINT) AS f_word_count,
             CAST(sum(f_mwl) AS BIGINT) AS f_mean_word_len,
             CAST(sum(f_hash) AS BIGINT) AS f_hash_ratio,
             CAST(sum(f_ell) AS BIGINT) AS f_ellipsis_ratio,
             CAST(sum(f_alpha) AS BIGINT) AS f_alpha_words,
             CAST(sum(f_stop) AS BIGINT) AS f_stopwords,
             CAST(sum(CASE WHEN f_wc + f_mwl + f_hash + f_ell + f_alpha + f_stop = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
      FROM g)
SELECT rule, n_docs, n_fail, round(CAST(n_fail AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS fail_rate
FROM (
  SELECT 'word_count' AS rule, n_docs, f_word_count AS n_fail FROM s
  UNION ALL SELECT 'mean_word_len', n_docs, f_mean_word_len FROM s
  UNION ALL SELECT 'hash_ratio', n_docs, f_hash_ratio FROM s
  UNION ALL SELECT 'ellipsis_ratio', n_docs, f_ellipsis_ratio FROM s
  UNION ALL SELECT 'alpha_words', n_docs, f_alpha_words FROM s
  UNION ALL SELECT 'stopwords', n_docs, f_stopwords FROM s
  UNION ALL SELECT 'pass_all', n_docs, n_docs - n_pass FROM s
)""",
        "redact_pii": f"""
WITH c1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{text.EMAIL_RE}')) AS BIGINT) AS n_emails,
         regexp_replace(text, '{text.EMAIL_RE}', '<EMAIL>', 'g') AS t1
  FROM documents),
c2 AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(t1, '{text.PHONE_RE}')) AS BIGINT) AS n_phones,
         regexp_replace(t1, '{text.PHONE_RE}', '<PHONE>', 'g') AS t2
  FROM c1)
SELECT doc_id, n_emails, n_phones, CAST(length(t2) AS BIGINT) AS clean_len FROM c2""",
        "lang_histogram": """
SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars FROM documents GROUP BY lang""",
        "domain_mixture_weights": """
WITH c AS (SELECT lang, count(*) AS n_docs, sum(len(string_split(text, ' '))) AS n_tokens
           FROM documents GROUP BY lang)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(n_tokens / CAST(sum(n_tokens) OVER () AS DOUBLE), 6) AS token_share,
       round(sqrt(n_tokens) / sum(sqrt(n_tokens)) OVER (), 6) AS weight,
       round((sqrt(n_tokens) / sum(sqrt(n_tokens)) OVER ())
             / (n_tokens / CAST(sum(n_tokens) OVER () AS DOUBLE)), 6) AS upsample
FROM c""",
        "domain_kl_matrix": """
WITH toks AS (SELECT lang, unnest(string_split(lower(text), ' ')) AS token FROM documents),
c AS (SELECT lang, token, count(*) AS cnt FROM toks GROUP BY 1, 2),
t AS (SELECT lang, CAST(sum(cnt) AS DOUBLE) AS tot FROM c GROUP BY 1),
p AS (SELECT lang, token, cnt / tot AS pr FROM c JOIN t USING (lang))
SELECT a.lang AS lang_a, b.lang AS lang_b, CAST(count(*) AS BIGINT) AS n_common_tokens,
       round(0.5 * (sum(a.pr * ln(2*a.pr/(a.pr+b.pr)) + b.pr * ln(2*b.pr/(a.pr+b.pr)))
                    + ln(2) * ((1 - sum(a.pr)) + (1 - sum(b.pr)))), 6) AS js_divergence
FROM p a JOIN p b ON a.token = b.token AND a.lang < b.lang
GROUP BY 1, 2""",
        "balanced_shards": f"""
SELECT doc_id, lang, n_chars,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rn,
       CAST((row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) - 1)
            % {text.BALANCED_SHARDS_N} AS BIGINT) AS shard
FROM documents""",
        "dup_span_fraction": f"""
WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS BIGINT), {text.DUP_SPAN_W}) AS g
  FROM documents CROSS JOIN UNNEST(range(1, greatest(len(text) - {text.DUP_SPAN_W - 1}, 1) + 1,
                                         {text.DUP_SPAN_STRIDE})) AS t(i)
),
c AS (SELECT g, count(*) AS nd FROM sh GROUP BY g)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(*) FILTER (nd >= 2) AS BIGINT) AS n_dup,
       round(count(*) FILTER (nd >= 2) / CAST(count(*) AS DOUBLE), 6) AS dup_frac
FROM sh JOIN c USING (g) GROUP BY doc_id""",
        # gaps-and-islands over duplicated shingle positions: i is
        # 1-based and i ≡ 1 (mod stride), so i // stride increments by
        # exactly 1 per consecutive shingle — (i//stride − row_number)
        # is constant per island
        "dup_spans": f"""
WITH sh AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i, substr(text, CAST(i AS BIGINT), {text.DUP_SPAN_W}) AS g,
         len(text) AS L
  FROM documents CROSS JOIN UNNEST(range(1, greatest(len(text) - {text.DUP_SPAN_W - 1}, 1) + 1,
                                         {text.DUP_SPAN_STRIDE})) AS t(i)
),
c AS (SELECT g, count(DISTINCT doc_id) AS nd FROM sh GROUP BY g),
f AS (SELECT doc_id, i, L FROM sh JOIN c USING (g) WHERE nd >= 2),
isl AS (SELECT doc_id, i, L,
               i // {text.DUP_SPAN_STRIDE} - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
        FROM f)
SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
       CAST(least(max(i) + {text.DUP_SPAN_W - 1}, any_value(L)) AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_shingles
FROM isl GROUP BY doc_id, grp""",
        "repetition_ratio": """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
grams AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
          FROM toks CROSS JOIN UNNEST(range(1, len(ts)-1)) AS t(i))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
       round(1.0 - count(DISTINCT g) / CAST(count(*) AS DOUBLE), 6) AS rep_ratio
FROM grams GROUP BY doc_id""",
        "subword_stats": f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '{text.SUBWORD_ALPHA}')) AS BIGINT) AS n_alpha,
       CAST(len(regexp_extract_all(lower(text), '{text.SUBWORD_DIGIT}')) AS BIGINT) AS n_digit,
       CAST(len(regexp_extract_all(lower(text), '{text.SUBWORD_PUNCT}')) AS BIGINT) AS n_punct,
       CAST(len(regexp_extract_all(lower(text), '{text.SUBWORD_ALPHA}'))
          + len(regexp_extract_all(lower(text), '{text.SUBWORD_DIGIT}'))
          + len(regexp_extract_all(lower(text), '{text.SUBWORD_PUNCT}')) AS BIGINT) AS n_subwords
FROM documents""",
        "bigram_pmi": """
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
bi AS (SELECT ts[i] AS w1, ts[i+1] AS w2 FROM toks CROSS JOIN UNNEST(range(1, len(ts))) AS t(i)),
bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy FROM bi GROUP BY 1, 2),
uni AS (SELECT unnest(ts) AS w FROM toks),
uc AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
tot AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM uni) AS n_uni,
               (SELECT CAST(count(*) AS DOUBLE) FROM bi) AS n_bi)
SELECT w1, w2, c_xy,
       round(ln(c_xy * n_uni * n_uni / (n_bi * u1.c * u2.c)), 6) AS pmi
FROM bc JOIN uc u1 ON w1 = u1.w JOIN uc u2 ON w2 = u2.w CROSS JOIN tot
WHERE c_xy >= 30
ORDER BY pmi DESC, w1, w2 LIMIT 50""",
        "unigram_logprob": """
WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
cnt AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM toks)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, round(avg(ln(c / t)), 6) AS lm_score
FROM toks JOIN cnt USING (token) CROSS JOIN tot GROUP BY doc_id""",
        "bigram_lm_score": f"""
WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
toks AS (SELECT doc_id, unnest(w) AS token FROM d),
cu AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM toks),
bi AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM d CROSS JOIN UNNEST(range(1, len(w))) AS r(i)),
cb AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2),
lp AS (SELECT bi.doc_id,
              ln({text.BIGRAM_LAMBDA!r} * (CAST(cb.c AS DOUBLE) / u1.c)
                 + {1.0 - text.BIGRAM_LAMBDA!r} * (u2.c / tot.t)) AS v
       FROM bi JOIN cb USING (w1, w2) JOIN cu u1 ON u1.token = bi.w1
               JOIN cu u2 ON u2.token = bi.w2 CROSS JOIN tot)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, round(avg(v), 6) AS lm_score
FROM lp GROUP BY doc_id""",
        "common_ngram_fraction": """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
grams AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
          FROM toks CROSS JOIN UNNEST(range(1, len(ts)-1)) AS t(i)),
gc AS (SELECT g, count(*) AS nd FROM grams GROUP BY g)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(count(*) FILTER (nd >= 2) AS BIGINT) AS n_common,
       round(count(*) FILTER (nd >= 2) / CAST(count(*) AS DOUBLE), 6) AS common_frac
FROM grams JOIN gc USING (g) GROUP BY doc_id""",
        "exact_dedup": """
SELECT doc_id % 400 AS dup_key, min(doc_id) AS first_doc_id, count(*) AS n_dups FROM documents GROUP BY 1""",
        "text_md5_dedup": """
SELECT md5(text) AS text_md5, min(doc_id) AS first_doc_id, count(*) AS n_copies FROM documents GROUP BY 1""",
        "cdc_chunk_dedup": f"SELECT * FROM read_parquet('{golden.cdc_chunk_dedup_path(SF001)}')",
        "cdc_savings": f"SELECT * FROM read_parquet('{golden.cdc_savings_path(SF001)}')",
        # the incremental manifest-merge must equal the batch recompute
        "incremental_md5_dedup": """
SELECT md5(text) AS text_md5, min(doc_id) AS first_doc_id, count(*) AS n_copies FROM documents GROUP BY 1""",
        # mirrors dedup.dedup_survivorship: longest copy survives,
        # ties to the smallest doc_id
        "dedup_survivorship": """
WITH d AS (SELECT doc_id, md5(text) AS text_md5, n_chars FROM documents),
r AS (
  SELECT *, row_number() OVER (PARTITION BY text_md5 ORDER BY n_chars DESC, doc_id) AS rk,
         count(*) OVER (PARTITION BY text_md5) AS n_copies
  FROM d)
SELECT text_md5, CAST(n_copies AS BIGINT) AS n_copies, doc_id AS survivor_doc_id,
       n_chars AS survivor_n_chars
FROM r WHERE rk = 1""",
        # mirrors images.phash_bit_stats: signed->unsigned bit probe via
        # the arithmetic identity ((phash >> b) & 1) on two's complement
        "phash_bit_stats": f"""
WITH b AS (SELECT g.g AS bit FROM generate_series(0, 63) AS g(g)),
s AS (
  SELECT b.bit,
         CAST(sum(CASE WHEN bit < 63 THEN (phash >> bit) & 1
                       ELSE CASE WHEN phash < 0 THEN 1 ELSE 0 END END) AS BIGINT) AS n_set,
         CAST(count(*) AS BIGINT) AS n_images
  FROM b CROSS JOIN {img_pq} GROUP BY b.bit)
SELECT bit, n_set, n_images,
       round(CAST(n_set AS DOUBLE) / CAST(n_images AS DOUBLE), 6) AS set_frac
FROM s""",
        # mirrors images.image_quality_survivor: per-phash survivor by
        # the exact integer fixed-point per-pixel Laplacian energy
        "image_quality_survivor": f"""
WITH s AS (
  SELECT g.image_id, i.phash,
         (g.lap_sq_sum * 1048576) // greatest(g.n_interior, 1) AS score
  FROM read_parquet('{golden.image_blur_scores_path(images.images_path_for(SF001))}') g
  JOIN {img_pq} i ON g.image_id = i.image_id),
r AS (
  SELECT *, row_number() OVER (PARTITION BY phash ORDER BY score DESC, image_id) AS rk,
         count(*) OVER (PARTITION BY phash) AS n_copies
  FROM s)
SELECT phash, CAST(n_copies AS BIGINT) AS n_copies, image_id AS survivor_id,
       CAST(score AS BIGINT) AS survivor_score
FROM r WHERE rk = 1""",
        "zone_embedding_centroid": f"""
WITH ev AS (SELECT vec_id, {oracle.sql_derive_lon('vec_id')} AS lon,
                   {oracle.sql_derive_lat('vec_id')} AS lat FROM embeddings),
z AS (SELECT e.vec_id, CAST(coalesce(min(b.rel_id), -1) AS BIGINT) AS rel_id
      FROM ev e LEFT JOIN {rects}
        ON e.lon >= b.lon_min AND e.lon < b.lon_max AND e.lat >= b.lat_min AND e.lat < b.lat_max
      GROUP BY e.vec_id),
u AS (SELECT vec_id, unnest(embedding) AS val, generate_subscripts(embedding, 1) AS dim
      FROM embeddings),
f AS (SELECT z.rel_id, CAST(u.dim - 1 AS BIGINT) AS dim,
             CAST(floor(CAST(u.val AS DOUBLE) * {ann.CENTROID_FP} + 0.5) AS BIGINT) AS fpv
      FROM u JOIN z USING (vec_id))
SELECT rel_id, dim, count(*) AS n_vecs,
       round(CAST(sum(fpv) AS DOUBLE) / {ann.CENTROID_FP} / count(*), 6) AS mean
FROM f GROUP BY rel_id, dim""",
        # same zone/fixed-point CTEs; variance = (n*Σq² − (Σq)²)/(n²·fp²)
        # in ONE float64 expression with the engine's exact association
        "zone_embedding_dispersion": f"""
WITH ev AS (SELECT vec_id, {oracle.sql_derive_lon('vec_id')} AS lon,
                   {oracle.sql_derive_lat('vec_id')} AS lat FROM embeddings),
z AS (SELECT e.vec_id, CAST(coalesce(min(b.rel_id), -1) AS BIGINT) AS rel_id
      FROM ev e LEFT JOIN {rects}
        ON e.lon >= b.lon_min AND e.lon < b.lon_max AND e.lat >= b.lat_min AND e.lat < b.lat_max
      GROUP BY e.vec_id),
u AS (SELECT vec_id, unnest(embedding) AS val, generate_subscripts(embedding, 1) AS dim
      FROM embeddings),
f AS (SELECT z.rel_id, CAST(u.dim - 1 AS BIGINT) AS dim,
             CAST(floor(CAST(u.val AS DOUBLE) * {ann.CENTROID_FP} + 0.5) AS BIGINT) AS q
      FROM u JOIN z USING (vec_id)),
mo AS (SELECT rel_id, dim, count(*) AS n_vecs,
              CAST(sum(q) AS BIGINT) AS s, CAST(sum(q * q) AS BIGINT) AS sq
       FROM f GROUP BY rel_id, dim)
SELECT rel_id, dim, n_vecs,
       round((CAST(n_vecs AS DOUBLE) * CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             / (CAST(n_vecs AS DOUBLE) * CAST(n_vecs AS DOUBLE) * {float(ann.CENTROID_FP) * float(ann.CENTROID_FP)!r}), 6) AS var
FROM mo""",
        "knn_classify": f"""
WITH pairs AS (
  SELECT a.vec_id AS qid, CAST(a.label AS BIGINT) AS tlabel,
         CAST(b.label AS BIGINT) AS nlabel, b.vec_id AS nid,
         round(list_cosine_similarity(a.embedding, b.embedding), 6) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
r AS (SELECT qid, tlabel, nlabel,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk FROM pairs),
votes AS (SELECT qid, tlabel, nlabel, count(*) AS c FROM r WHERE rk <= 5 GROUP BY 1, 2, 3),
pred AS (SELECT qid, tlabel, nlabel AS plabel,
                row_number() OVER (PARTITION BY qid ORDER BY c DESC, nlabel) AS vr FROM votes)
SELECT tlabel AS label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN plabel = tlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       round(sum(CASE WHEN plabel = tlabel THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS accuracy
FROM pred WHERE vr = 1 GROUP BY 1 ORDER BY 1""",
        # mirrors ann.knn_pr_curve: same neighbor discipline as
        # knn_classify, one-vs-rest votes, integer tp/fp/fn per
        # threshold, mirrored precision/recall expressions
        "knn_pr_curve": f"""
WITH pairs AS (
  SELECT a.vec_id AS qid, CAST(a.label AS BIGINT) AS tlabel,
         CAST(b.label AS BIGINT) AS nlabel, b.vec_id AS nid,
         round(list_cosine_similarity(a.embedding, b.embedding), 6) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
r AS (SELECT qid, tlabel, nlabel,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk FROM pairs),
v AS (SELECT qid, nlabel AS label, count(*) AS votes FROM r WHERE rk <= 5 GROUP BY 1, 2),
base AS (SELECT vec_id AS qid, CAST(label AS BIGINT) AS tlabel FROM embeddings),
labs AS (SELECT DISTINCT CAST(label AS BIGINT) AS label FROM embeddings),
lv AS (
  SELECT b.qid, l.label, coalesce(v.votes, 0) AS votes,
         CASE WHEN b.tlabel = l.label THEN 1 ELSE 0 END AS is_true
  FROM base b CROSS JOIN labs l
  LEFT JOIN v ON v.qid = b.qid AND v.label = l.label),
c AS (
  SELECT label, t.t AS threshold,
         CAST(sum(CASE WHEN votes >= t.t AND is_true = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN votes >= t.t AND is_true = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN votes < t.t AND is_true = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM lv CROSS JOIN generate_series(1, 5) AS t(t) GROUP BY 1, 2)
SELECT label, threshold, tp, fp, fn,
       CASE WHEN tp + fp > 0 THEN round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) ELSE 0.0 END AS "precision",
       CASE WHEN tp + fn > 0 THEN round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) ELSE 0.0 END AS recall
FROM c""",
        "embedding_label_outliers": f"""
WITH u AS (SELECT vec_id, CAST(label AS BIGINT) AS label, unnest(embedding) AS val,
                  generate_subscripts(embedding, 1) AS dim FROM embeddings),
q AS (SELECT vec_id, label, dim,
             CAST(floor(CAST(val AS DOUBLE) * {ann.CENTROID_FP} + 0.5) AS BIGINT) AS q FROM u),
cen AS (SELECT label, dim, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS s
        FROM q GROUP BY 1, 2),
d AS (SELECT q.vec_id, q.label,
             CAST(sum((cen.n * q.q - cen.s) * (cen.n * q.q - cen.s)) AS BIGINT) AS d2_fp
      FROM q JOIN cen USING (label, dim) GROUP BY 1, 2),
r AS (SELECT label, vec_id, d2_fp,
             CAST(row_number() OVER (PARTITION BY label ORDER BY d2_fp DESC, vec_id) AS BIGINT) AS outlier_rank
      FROM d)
SELECT label, vec_id, d2_fp, outlier_rank FROM r WHERE outlier_rank <= {ann.OUTLIER_K}""",
        "zone_label_purity": f"""
WITH ev AS (SELECT vec_id, CAST(label AS BIGINT) AS label, {oracle.sql_derive_lon('vec_id')} AS lon,
                   {oracle.sql_derive_lat('vec_id')} AS lat FROM embeddings),
z AS (SELECT e.vec_id, e.label, CAST(coalesce(min(b.rel_id), -1) AS BIGINT) AS rel_id
      FROM ev e LEFT JOIN {rects}
        ON e.lon >= b.lon_min AND e.lon < b.lon_max AND e.lat >= b.lat_min AND e.lat < b.lat_max
      GROUP BY 1, 2),
zl AS (SELECT rel_id, label, CAST(count(*) AS BIGINT) AS n FROM z GROUP BY 1, 2),
tot AS (SELECT rel_id, CAST(sum(n) AS BIGINT) AS n_vecs FROM zl GROUP BY 1),
r AS (SELECT rel_id, label, n,
             row_number() OVER (PARTITION BY rel_id ORDER BY n DESC, label) AS rk FROM zl)
SELECT r.rel_id, tot.n_vecs, r.label AS top_label, r.n AS top_n,
       round(CAST(r.n AS DOUBLE) / tot.n_vecs, 6) AS purity
FROM r JOIN tot USING (rel_id) WHERE rk = 1""",
        "ann_topk": f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {ANN_QUERY_ID}),
scored AS (SELECT e.vec_id, list_cosine_similarity(e.embedding, q.qv) AS sim FROM embeddings e, q
           WHERE e.vec_id != {ANN_QUERY_ID})
SELECT CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS sim_rank, vec_id
FROM scored ORDER BY sim DESC, vec_id LIMIT {ANN_K}""",
        # mirrors ann.ann_filtered_topk: label pre-filter, then the
        # ann_topk ranking discipline
        "ann_filtered_topk": f"""
WITH q AS (SELECT embedding AS qv, label AS ql FROM embeddings WHERE vec_id = {ANN_QUERY_ID}),
scored AS (
  SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
         list_cosine_similarity(e.embedding, q.qv) AS sim
  FROM embeddings e, q WHERE e.vec_id != {ANN_QUERY_ID} AND e.label = q.ql)
SELECT CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS sim_rank, vec_id, label
FROM scored ORDER BY sim DESC, vec_id LIMIT {ANN_K}""",
        "knn_graph_reciprocity": f"""
WITH s AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, a.label,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
r AS (SELECT src, dst, label,
             row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst) AS rk
      FROM s),
e AS (SELECT src, dst, label FROM r WHERE rk <= {ann.KNN_GRAPH_K}),
rec AS (SELECT e.src, e.label,
               CASE WHEN e2.src IS NOT NULL THEN 1 ELSE 0 END AS recip
        FROM e LEFT JOIN e e2 ON e2.src = e.dst AND e2.dst = e.src)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(recip) AS BIGINT) AS n_reciprocal,
       round(CAST(sum(recip) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS reciprocity
FROM rec GROUP BY 1""",
        "mutual_nn_pairs": """
WITH s AS (
  SELECT a.vec_id AS qa, b.vec_id AS qb,
         floor(list_cosine_similarity(a.embedding, b.embedding) * 1e12 + 0.5) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
nn AS (SELECT qa, qb FROM (
  SELECT qa, qb, row_number() OVER (PARTITION BY qa ORDER BY sim DESC, qb) AS rk FROM s) WHERE rk = 1)
SELECT n1.qa AS vec_a, n1.qb AS vec_b
FROM nn n1 JOIN nn n2 ON n1.qb = n2.qa AND n2.qb = n1.qa
WHERE n1.qa < n1.qb""",
        "embedding_top_pairs": f"""
WITH scored AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT CAST(row_number() OVER (ORDER BY sim DESC, vec_a, vec_b) AS BIGINT) AS pair_rank, vec_a, vec_b
FROM scored ORDER BY sim DESC, vec_a, vec_b LIMIT {EMB_TOP_PAIRS}""",
        "ast_containing_areas": f"""
SELECT rel_id, name, admin_level FROM {rects}
WHERE {AST_PT[0]!r} >= lon_min AND {AST_PT[0]!r} < lon_max AND {AST_PT[1]!r} >= lat_min AND {AST_PT[1]!r} < lat_max""",
        "ast_city_of_point": f"""
SELECT rel_id, name, admin_level FROM {rects}
WHERE admin_level = 6
  AND {AST_PT[0]!r} >= lon_min AND {AST_PT[0]!r} < lon_max AND {AST_PT[1]!r} >= lat_min AND {AST_PT[1]!r} < lat_max""",
        "ast_district_of_point": f"""
SELECT rel_id, name, admin_level FROM {rects}
WHERE admin_level = 8
  AND {AST_PT[0]!r} >= lon_min AND {AST_PT[0]!r} < lon_max AND {AST_PT[1]!r} >= lat_min AND {AST_PT[1]!r} < lat_max""",
        "ast_nearest_pois": f"""
SELECT CAST(row_number() OVER (ORDER BY {oracle.sql_sqdist_deg(repr(AST_PT[0]), repr(AST_PT[1]), 'p.lon', 'p.lat')}, p.poi_id) AS INTEGER) AS knn_rank,
       p.poi_id
FROM {pois} ORDER BY 1 LIMIT {AST_K}""",
        "ast_features_in_tile": f"""
WITH {_pts_cte()}
SELECT doc_id, lon, lat FROM pts
WHERE {oracle.sql_tile_x('lon', AST_TILE[0])} = {AST_TILE[1]} AND {oracle.sql_tile_y('lat', AST_TILE[0])} = {AST_TILE[2]}""",
        # mirrors queryast.explain for the canonical nested AST: the plan
        # is a SPEC, pinned as an inline VALUES table
        "ast_explain": """
SELECT * FROM (VALUES
  (1, 'scan_boundaries', 'admin_level=any'),
  (2, 'filter', 'name == ''Essenheim'''),
  (3, 'scan_boundaries', 'admin_level=8'),
  (4, 'containment_join', 'child within parent (exact, fuzzy>=0.9 fallback)'),
  (5, 'scan_pois', 'category=cafe (tag pushdown)'),
  (6, 'pip_join', 'pois within parent area')
) AS t(step, op, detail)""",
        "ast_districts_of_area": f"""
SELECT c.rel_id, c.name, c.admin_level FROM {rects} , {rects.replace(') AS b(', ') AS c(')}
WHERE b.name = 'Essenheim' AND c.admin_level > b.admin_level
  AND c.lon_min >= b.lon_min AND c.lon_max <= b.lon_max AND c.lat_min >= b.lat_min AND c.lat_max <= b.lat_max""",
        "ast_pois_near_point": f"""
SELECT p.poi_id, p.lon, p.lat, p.key, p.value, p.name FROM {pois}
WHERE p.value = 'cafe'
  AND {oracle.sql_sqdist_deg(repr(AST_PT[0]), repr(AST_PT[1]), 'p.lon', 'p.lat')} <= {0.2 * 0.2!r}""",
        "ast_pois_in_area": f"""
SELECT p.poi_id, p.lon, p.lat, p.key, p.value, p.name, b.rel_id FROM {pois} JOIN {rects}
ON p.lon >= b.lon_min AND p.lon < b.lon_max AND p.lat >= b.lat_min AND p.lat < b.lat_max
WHERE b.name = 'Duisheim' AND p.value = 'restaurant'""",
        "caption_location_histogram": f"""
SELECT regexp_extract(caption, ' in (.+)$', 1) AS place, count(*) AS n_images
FROM {img_pq} GROUP BY 1""",
        "cell_modality_mix": f"""
WITH {_pts_cte()},
{oracle.sql_morton_ctes('pts', 'doc_id', 11, 'cell_low', prefix='md')},
iid AS (SELECT CAST(substr(image_id, 5, 12) AS BIGINT) AS img_id FROM {img_pq}),
ipts AS (SELECT img_id, {oracle.sql_derive_lon('img_id')} AS lon, {oracle.sql_derive_lat('img_id')} AS lat FROM iid),
{oracle.sql_morton_ctes('ipts', 'img_id', 11, 'cell_low', prefix='mi')},
u AS (SELECT cell_low, 1 AS n_docs, 0 AS n_images FROM md_out
      UNION ALL SELECT cell_low, 0, 1 FROM mi_out)
SELECT cell_low, CAST(sum(n_docs) AS BIGINT) AS n_docs, CAST(sum(n_images) AS BIGINT) AS n_images
FROM u GROUP BY cell_low""",
        "zone_image_stats": f"""
WITH iid AS (
  SELECT CAST(substr(image_id, 5, 12) AS BIGINT) AS img_id,
         CAST(octet_length(bytes) AS BIGINT) AS payload_bytes FROM {img_pq}),
ipts AS (
  SELECT payload_bytes, {oracle.sql_derive_lon('img_id')} AS lon,
         {oracle.sql_derive_lat('img_id')} AS lat FROM iid)
SELECT b.rel_id, b.admin_level, count(*) AS n_images,
       CAST(sum(p.payload_bytes) AS BIGINT) AS total_bytes
FROM ipts p JOIN {rects}
ON p.lon >= b.lon_min AND p.lon < b.lon_max AND p.lat >= b.lat_min AND p.lat < b.lat_max
GROUP BY 1, 2""",
        "zone_top_terms": f"""
WITH iid AS (
  SELECT CAST(substr(image_id, 5, 12) AS BIGINT) AS img_id, caption FROM {img_pq}),
ipts AS (
  SELECT caption, {oracle.sql_derive_lon('img_id')} AS lon,
         {oracle.sql_derive_lat('img_id')} AS lat FROM iid),
j AS (
  SELECT b.rel_id, p.caption FROM ipts p JOIN {rects}
  ON p.lon >= b.lon_min AND p.lon < b.lon_max AND p.lat >= b.lat_min AND p.lat < b.lat_max),
toks AS (SELECT rel_id, unnest(string_split(lower(caption), ' ')) AS token FROM j),
cnt AS (SELECT rel_id, token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2),
rk AS (SELECT rel_id, token, n,
       row_number() OVER (PARTITION BY rel_id ORDER BY n DESC, token ASC) AS rank FROM cnt)
SELECT rel_id, token, n, CAST(rank AS BIGINT) AS rank FROM rk WHERE rank <= 5""",
        "best_image_per_tile": f"""
WITH iid AS (
  SELECT image_id, CAST(substr(image_id, 5, 12) AS BIGINT) AS img_id,
         CAST(octet_length(bytes) AS BIGINT) AS payload_bytes FROM {img_pq}),
ipts AS (
  SELECT image_id, payload_bytes, {oracle.sql_derive_lon('img_id')} AS lon,
         {oracle.sql_derive_lat('img_id')} AS lat FROM iid),
tl AS (
  SELECT image_id, payload_bytes, {oracle.sql_tile_x('lon', images.MOSAIC_Z)} AS x,
         {oracle.sql_tile_y('lat', images.MOSAIC_Z)} AS y FROM ipts),
r AS (
  SELECT *, row_number() OVER (PARTITION BY x, y ORDER BY payload_bytes DESC, image_id) AS rn FROM tl)
SELECT {images.MOSAIC_Z} AS z, x, y, image_id, payload_bytes FROM r WHERE rn = 1""",
        "shard_manifest": f"""
WITH im AS (SELECT image_id, CAST(octet_length(bytes) AS BIGINT) AS nbytes,
                   CAST(substr(image_id, 5, 12) AS BIGINT) AS img_id FROM {img_pq}),
ip AS (SELECT image_id, nbytes, {oracle.sql_derive_lon('img_id')} AS lon,
              {oracle.sql_derive_lat('img_id')} AS lat FROM im),
t AS (SELECT image_id, nbytes, {oracle.sql_tile_x('lon', images.SHARD_Z)} AS x,
             {oracle.sql_tile_y('lat', images.SHARD_Z)} AS y FROM ip),
c AS (SELECT *, CAST(coalesce(sum(nbytes) OVER (PARTITION BY x, y ORDER BY image_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o FROM t)
SELECT x, y, image_id, (o // {images.SHARD_BYTES}) AS shard_seq,
       o AS byte_offset, nbytes FROM c""",
        "image_meta_stats": f"""
SELECT fmt, w, h, count(*) AS n_images, CAST(sum(octet_length(bytes)) AS BIGINT) AS total_bytes FROM {img_pq} GROUP BY fmt, w, h""",
        "aspect_buckets": f"""
SELECT CASE WHEN 3 * w >= 4 * h THEN 'wide'
            WHEN 3 * h >= 4 * w THEN 'tall'
            ELSE 'squarish' END AS bucket,
       fmt, count(*) AS n_images,
       CAST(sum(CAST(w AS BIGINT) * h) AS BIGINT) AS total_px
FROM {img_pq} GROUP BY 1, 2 ORDER BY 1, 2""",
        "compression_stats": f"""
SELECT fmt, CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(octet_length(bytes)) AS BIGINT) AS payload_bytes,
       CAST(sum(3 * CAST(w AS BIGINT) * h) AS BIGINT) AS raw_bytes,
       round(CAST(sum(octet_length(bytes)) AS DOUBLE)
             / CAST(sum(3 * CAST(w AS BIGINT) * h) AS DOUBLE), 6) AS ratio
FROM {img_pq} GROUP BY 1 ORDER BY 1""",
        "phash_dedup": f"""
SELECT phash, min(image_id) AS first_image_id, count(*) AS n_images FROM {img_pq} GROUP BY phash HAVING count(*) > 1""",
        "split_leakage_phash": f"""
WITH s AS (SELECT DISTINCT phash,
                  CASE WHEN substr(md5(image_id), 1, 1) IN ('c', 'd') THEN 'val'
                       WHEN substr(md5(image_id), 1, 1) IN ('e', 'f') THEN 'test'
                       ELSE 'train' END AS split
           FROM {img_pq}),
p AS (SELECT a.split AS split_a, b.split AS split_b
      FROM s a JOIN s b ON a.phash = b.phash AND a.split < b.split)
SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_shared_phashes
FROM p GROUP BY 1, 2 ORDER BY 1, 2""",
        "geo_inconsistent_dups": f"""
WITH iid AS (SELECT CAST(substr(image_id, 5, 12) AS BIGINT) AS img_id, phash FROM {img_pq}),
ip AS (SELECT img_id, phash, {oracle.sql_derive_lon('img_id')} AS lon,
              {oracle.sql_derive_lat('img_id')} AS lat FROM iid),
pr AS (
  SELECT a.img_id AS img_a, b.img_id AS img_b, a.phash AS phash,
         {_fp_sql('(a.lon - b.lon)', '(a.lat - b.lat)')} AS dist_fp
  FROM ip a JOIN ip b ON a.phash = b.phash AND a.img_id < b.img_id)
SELECT img_a, img_b, phash, dist_fp FROM pr WHERE dist_fp >= {images.GEO_DUP_THRESH_FP}""",
        "caption_spam": f"""
SELECT caption, count(*) AS n_images, count(DISTINCT phash) AS n_phashes
FROM {img_pq} GROUP BY caption HAVING count(DISTINCT phash) >= {images.CAPTION_SPAM_MIN_PHASHES}""",
        "dissolve_zones": f"""
WITH RECURSIVE rects AS (SELECT * FROM {rects}),
e AS (
  SELECT a.rel_id AS src, b.rel_id AS dst FROM rects a JOIN rects b
  ON a.admin_level = b.admin_level AND a.rel_id <> b.rel_id
  AND a.lon_min <= b.lon_max AND b.lon_min <= a.lon_max
  AND a.lat_min <= b.lat_max AND b.lat_min <= a.lat_max),
walk(node, lab) AS (
  SELECT rel_id, rel_id FROM rects
  UNION
  SELECT e.src, w.lab FROM walk w JOIN e ON e.dst = w.node),
lbl AS (SELECT node, min(lab) AS region_id FROM walk GROUP BY node)
SELECT l.region_id, r.admin_level, count(*) AS n_zones,
       min(r.lon_min) AS lon_min, min(r.lat_min) AS lat_min,
       max(r.lon_max) AS lon_max, max(r.lat_max) AS lat_max,
       CAST(sum(CAST(floor((CAST(r.lon_max AS DOUBLE) - CAST(r.lon_min AS DOUBLE)) * (CAST(r.lat_max AS DOUBLE) - CAST(r.lat_min AS DOUBLE)) * {cluster.DISSOLVE_AREA_FP!r} + 0.5) AS BIGINT)) AS BIGINT) AS area_fp
FROM rects r JOIN lbl l ON l.node = r.rel_id
GROUP BY 1, 2""",
        # --- golden-table oracles (local non-Ray recompute; see plasmap_ray.golden) ---
        "s2_cell_index": f"SELECT * FROM read_parquet('{golden.s2_cells_path(SF001)}')",
        "s2_cell_histogram": f"""
SELECT s2_cell_coarse, count(*) AS n_points
FROM read_parquet('{golden.s2_cells_path(SF001)}') GROUP BY s2_cell_coarse""",
        "kmeans_clusters": f"SELECT * FROM read_parquet('{golden.kmeans_clusters_path(SF001)}')",
        "simplified_silhouette": f"SELECT * FROM read_parquet('{golden.simplified_silhouette_path(SF001)}')",
        "sq8_quantization_error": f"SELECT * FROM read_parquet('{golden.sq8_quantization_error_path(SF001)}')",
        "pca_project": f"SELECT * FROM read_parquet('{golden.pca_project_path(SF001, ann.PCA_K, ann.PCA_FP)}')",
        "pca_explained_variance": f"SELECT * FROM read_parquet('{golden.pca_explained_variance_path(SF001, ann.PCA_K, ann.PCA_FP)}')",
        "semantic_dedup": f"SELECT * FROM read_parquet('{golden.semantic_dedup_path(SF001, threshold=EMB_NEARDUP_T)}')",
        "cluster_label_confusion": f"""
SELECT g.cluster, CAST(e.label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_vecs
FROM read_parquet('{golden.kmeans_clusters_path(SF001)}') g
JOIN embeddings e USING (vec_id)
GROUP BY 1, 2 ORDER BY 1, 2""",
        "kmeans_cluster_sizes": f"""
SELECT cluster, count(*) AS n_vecs
FROM read_parquet('{golden.kmeans_clusters_path(SF001)}') GROUP BY cluster""",
        "hex_bin_index": f"SELECT * FROM read_parquet('{golden.hex_cells_path(SF001)}')",
        # ring-1 mass: scatter each hex count to self + 6 axial
        # neighbors in SQL (same packing arithmetic as hexgrid.py)
        "hex_hot_cells": f"""
WITH counts AS (
  SELECT hex_cell, count(*) AS n FROM read_parquet('{golden.hex_cells_path(SF001)}') GROUP BY hex_cell),
qr AS (
  SELECT hex_cell, (hex_cell >> 32) - 1073741824 AS q,
         (hex_cell & 4294967295) - 1073741824 AS r, n FROM counts),
offs(dq, dr) AS (VALUES (0,0),(1,0),(1,-1),(0,-1),(-1,0),(-1,1),(0,1)),
scat AS (
  SELECT ((q + dq + 1073741824) << 32) | (r + dr + 1073741824) AS cell, n FROM qr, offs),
ring AS (SELECT cell, CAST(sum(n) AS BIGINT) AS n_ring1 FROM scat GROUP BY cell)
SELECT c.hex_cell, c.n AS n_points, ring.n_ring1
FROM counts c JOIN ring ON ring.cell = c.hex_cell""",
        "phash_pixel_verify": f"SELECT * FROM read_parquet('{golden.phash_pixel_verify_path(SF001)}')",
        "phash_quadrant_pairs": f"SELECT * FROM read_parquet('{golden.phash_quadrant_pairs_path(SF001)}')",
        "tile_montage": f"SELECT * FROM read_parquet('{golden.tile_montage_path(SF001)}')",
        "zone_color_signature": f"SELECT * FROM read_parquet('{golden.zone_color_signature_path(SF001)}')",
        "image_format_migration": f"SELECT * FROM read_parquet('{golden.image_format_migration_path(SF001)}')",
        # invariant mirror: dctq's quantization table proves PSNR >= 40
        # on EVERY input (codecs._DCTQ_STEPS), so n_psnr40 == n_images
        "image_lossy_migration": f"""
SELECT fmt, CAST(count(*) AS BIGINT) AS n_images, CAST(count(*) AS BIGINT) AS n_psnr40
FROM {img_pq} GROUP BY fmt ORDER BY fmt""",
        "audio_lossy_migration": (
            "SELECT fmt, CAST(count(*) AS BIGINT) AS n_clips, CAST(count(*) AS BIGINT) AS n_psnr40 "
            f"FROM read_parquet('{multimodal.audio_path_for(SF001)}') GROUP BY fmt ORDER BY fmt"
        ),
        "image_ssim_audit": f"SELECT * FROM read_parquet('{golden.ssim_audit_path(SF001)}')",
        "image_augment": f"SELECT * FROM read_parquet('{golden.image_augment_path(images.images_path_for(SF001))}')",
        "image_blur_scores": f"SELECT * FROM read_parquet('{golden.image_blur_scores_path(images.images_path_for(SF001))}')",
        "image_entropy": f"SELECT * FROM read_parquet('{golden.image_entropy_path(images.images_path_for(SF001))}')",
        "image_otsu": f"SELECT * FROM read_parquet('{golden.image_otsu_path(images.images_path_for(SF001))}')",
        "image_quadtree": f"SELECT * FROM read_parquet('{golden.image_quadtree_path(images.images_path_for(SF001))}')",
        "image_harris_corners": f"SELECT * FROM read_parquet('{golden.image_harris_corners_path(images.images_path_for(SF001))}')",
        "image_border_detect": f"SELECT * FROM read_parquet('{golden.image_border_detect_path(images.images_path_for(SF001))}')",
        "image_hough_lines": f"SELECT * FROM read_parquet('{golden.image_hough_lines_path(images.images_path_for(SF001))}')",
        "image_glcm": f"SELECT * FROM read_parquet('{golden.image_glcm_path(images.images_path_for(SF001))}')",
        "caption_complexity_corr": f"SELECT * FROM read_parquet('{golden.caption_complexity_corr_path(images.images_path_for(SF001))}')",
        "image_channel_correlation": f"SELECT * FROM read_parquet('{golden.image_channel_corr_path(images.images_path_for(SF001))}')",
        "image_blob_count": f"SELECT * FROM read_parquet('{golden.image_blob_count_path(images.images_path_for(SF001))}')",
        "image_orientation_histogram": f"SELECT * FROM read_parquet('{golden.image_orientation_path(images.images_path_for(SF001))}')",
        "image_haar_energy": f"SELECT * FROM read_parquet('{golden.image_haar_energy_path(images.images_path_for(SF001))}')",
        "image_dynamic_range": f"SELECT * FROM read_parquet('{golden.image_dynamic_range_path(images.images_path_for(SF001))}')",
        "image_blockiness": f"SELECT * FROM read_parquet('{golden.image_blockiness_path(images.images_path_for(SF001))}')",
        "image_saliency_centroid": f"SELECT * FROM read_parquet('{golden.image_saliency_centroid_path(images.images_path_for(SF001))}')",
        "phash_scale_stability": f"SELECT * FROM read_parquet('{golden.phash_scale_stability_path(images.images_path_for(SF001), images.PHASH_THUMB_SIDE)}')",
        "dct_energy_profile": f"SELECT * FROM read_parquet('{golden.dct_energy_profile_path(images.images_path_for(SF001))}')",
        "image_palette": f"SELECT * FROM read_parquet('{golden.image_palette_path(images.images_path_for(SF001))}')",
        "phash_dedup_eval": f"SELECT * FROM read_parquet('{golden.phash_dedup_eval_path(SF001, 3)}')",
        "image_edge_density": f"SELECT * FROM read_parquet('{golden.image_edge_density_path(images.images_path_for(SF001))}')",
        "caption_conflict_dups": f"""
SELECT caption, CAST(count(*) AS BIGINT) AS n_images,
       CAST(count(DISTINCT phash) AS BIGINT) AS n_phashes
FROM {img_pq} GROUP BY caption
HAVING count(*) > 1 AND count(DISTINCT phash) > 1""",
        # mirrors images.image_crop_manifest: the same integer modular
        # offsets, side = 2/3 short side, no decode
        "image_crop_manifest": f"""
WITH img AS (
  SELECT image_id, CAST(substr(image_id, 5, 12) AS BIGINT) AS img_id,
         CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h
  FROM {img_pq}),
c AS (SELECT *, (least(w, h) * {images.CROP_FRAC_NUM}) // {images.CROP_FRAC_DEN} AS side FROM img)
SELECT image_id, j.j AS crop_rank,
       (img_id * {images.NEG_MULT} + j.j * 7919) % greatest(w - side + 1, 1) AS x0,
       (img_id * {images.NEG_STEP} + j.j * 104729) % greatest(h - side + 1, 1) AS y0,
       side
FROM c CROSS JOIN generate_series(1, {images.CROP_K}) AS j(j)""",
        # mirrors images.contrastive_negatives: same modular negative
        # derivation, self-collision step, place-equality flag
        "contrastive_negatives": f"""
WITH img AS (
  SELECT CAST(substr(image_id, 5, 12) AS BIGINT) AS img_id,
         regexp_extract(caption, ' in (.+)$', 1) AS place
  FROM {img_pq}),
neg AS (
  SELECT i.img_id, j.j AS neg_rank,
         CASE WHEN 1 + (i.img_id * {images.NEG_MULT} + j.j * {images.NEG_STEP}) % {images.images_count_for(SF001)} = i.img_id
              THEN 1 + ((1 + (i.img_id * {images.NEG_MULT} + j.j * {images.NEG_STEP}) % {images.images_count_for(SF001)}) % {images.images_count_for(SF001)})
              ELSE 1 + (i.img_id * {images.NEG_MULT} + j.j * {images.NEG_STEP}) % {images.images_count_for(SF001)} END AS neg_id,
         i.place AS anchor_place
  FROM img i CROSS JOIN generate_series(1, {images.NEG_K}) AS j(j))
SELECT printf('img-%012d', n.img_id) AS image_id, n.neg_rank,
       printf('img-%012d', n.neg_id) AS neg_image_id,
       n.anchor_place = b.place AS same_district
FROM neg n JOIN img b ON b.img_id = n.neg_id""",
        # mirrors images.caption_geo_alignment: trailing "in <place>"
        # clause vs the containing level-8 district (countryside when
        # uncontained)
        "caption_geo_alignment": f"""
WITH img AS (
  SELECT CAST(substr(image_id, 5, 12) AS BIGINT) AS img_id,
         regexp_extract(caption, ' in (.+)$', 1) AS place
  FROM {img_pq}),
pts AS (
  SELECT place, {oracle.sql_derive_lon('img_id')} AS lon, {oracle.sql_derive_lat('img_id')} AS lat
  FROM img),
j AS (
  SELECT p.place, b.name
  FROM pts p LEFT JOIN {oracle.sql_admin_rects_values(admin_level=8)}
  ON p.lon >= b.lon_min AND p.lon < b.lon_max AND p.lat >= b.lat_min AND p.lat < b.lat_max)
SELECT place, CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(CASE WHEN (name IS NOT NULL AND place = name)
                      OR (name IS NULL AND place = 'the countryside') THEN 1 ELSE 0 END) AS BIGINT) AS n_aligned,
       round(CAST(sum(CASE WHEN (name IS NOT NULL AND place = name)
                            OR (name IS NULL AND place = 'the countryside') THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS align_rate
FROM j GROUP BY 1""",
        # survivorship: highest-resolution copy per phash cluster, ties
        # to the smallest image_id (mirrors images.image_dedup_survivor)
        "image_dedup_survivor": f"""
WITH i AS (SELECT image_id, w, h, phash, CAST(w AS BIGINT) * CAST(h AS BIGINT) AS pixels FROM {img_pq}),
r AS (
  SELECT *, row_number() OVER (PARTITION BY phash ORDER BY pixels DESC, image_id) AS rk,
         count(*) OVER (PARTITION BY phash) AS n_copies
  FROM i)
SELECT phash, CAST(n_copies AS BIGINT) AS n_copies, image_id AS survivor_id,
       w AS survivor_w, h AS survivor_h
FROM r WHERE rk = 1""",
        "corpus_summary": f"""
SELECT (SELECT CAST(count(*) AS BIGINT) FROM {img_pq}) AS n_images,
       (SELECT CAST(sum(octet_length(bytes)) AS BIGINT) FROM {img_pq}) AS image_bytes,
       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_events,
       (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_embeddings,
       (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders,
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_lineitems""",
        "frechet_conformance": f"SELECT * FROM read_parquet('{golden.frechet_conformance_path(SF001)}')",
        "pq_encode": f"SELECT * FROM read_parquet('{golden.pq_encode_path(SF001)}')",
        "pagerank": f"SELECT * FROM read_parquet('{golden.pagerank_path()}')",
        "dtw_profiles": f"SELECT * FROM read_parquet('{golden.dtw_profiles_path(SF001)}')",
        "pacf_durbin": f"SELECT * FROM read_parquet('{golden.pacf_durbin_path(SF001)}')",
        "granger_causality": f"SELECT * FROM read_parquet('{golden.granger_causality_path(SF001)}')",
        "hurst_exponent": f"SELECT * FROM read_parquet('{golden.hurst_exponent_path(SF001)}')",
        "kalman_smooth": f"SELECT * FROM read_parquet('{golden.kalman_smooth_path(SF001)}')",
        "ams_f2_eval": f"SELECT * FROM read_parquet('{golden.ams_f2_eval_path(SF001)}')",
        "kleinberg_bursts": f"SELECT * FROM read_parquet('{golden.kleinberg_bursts_path(SF001)}')",
        "sax_motifs": f"SELECT * FROM read_parquet('{golden.sax_motifs_path(SF001)}')",
        "theil_u_eval": f"SELECT * FROM read_parquet('{golden.theil_u_eval_path(SF001)}')",
        "first_passage_time": f"SELECT * FROM read_parquet('{golden.first_passage_time_path(SF001)}')",
        "spectral_partition": f"SELECT * FROM read_parquet('{golden.spectral_partition_path(SF001)}')",
        "quantile_regression": f"SELECT * FROM read_parquet('{golden.quantile_regression_path(SF001)}')",
        "trajectory_simplify": f"SELECT * FROM read_parquet('{golden.trajectory_simplify_path(SF001)}')",
        "isotonic_calibration": f"SELECT * FROM read_parquet('{golden.isotonic_calibration_path(SF001)}')",
        "gmm_em": f"SELECT * FROM read_parquet('{golden.gmm_em_path(SF001)}')",
        "lof_outliers": f"SELECT * FROM read_parquet('{golden.lof_outliers_path(SF001)}')",
        "scan_statistic": f"SELECT * FROM read_parquet('{golden.scan_statistic_path(SF001)}')",
        "cca_analysis": f"SELECT * FROM read_parquet('{golden.cca_analysis_path(SF001)}')",
        "perceptron_averaging": f"SELECT * FROM read_parquet('{golden.perceptron_averaging_path(SF001)}')",
        "als_factorization": f"SELECT * FROM read_parquet('{golden.als_factorization_path(SF001)}')",
        "logistic_newton": f"SELECT * FROM read_parquet('{golden.logistic_newton_path(SF001)}')",
        "mst_boruvka": f"SELECT * FROM read_parquet('{golden.mst_boruvka_path()}')",
        "tsp_tours": f"SELECT * FROM read_parquet('{golden.tsp_tours_path()}')",
        "traffic_assignment": f"SELECT * FROM read_parquet('{golden.traffic_assignment_path(SF001)}')",
        "huffman_code_lengths": f"SELECT * FROM read_parquet('{golden.huffman_code_lengths_path(SF001)}')",
        "betweenness_sampled": f"SELECT * FROM read_parquet('{golden.betweenness_path(routing.BTW_SOURCES)}')",
        "harmonic_centrality": f"SELECT * FROM read_parquet('{golden.harmonic_path(routing.BTW_SOURCES)}')",
        "percolation_curve": f"SELECT * FROM read_parquet('{golden.percolation_path(routing.PERC_CUTS)}')",
        "alt_heuristic_eval": f"SELECT * FROM read_parquet('{golden.alt_eval_path(routing.ALT_PAIRS)}')",
        "bridge_edges": f"SELECT * FROM read_parquet('{golden.bridge_edges_path(routing.CHEAP_W_CUT)}')",
        "detour_ratio": f"SELECT * FROM read_parquet('{golden.detour_ratio_path(routing.ALT_PAIRS)}')",
        "graph_eccentricity": f"SELECT * FROM read_parquet('{golden.eccentricity_path(routing.BTW_SOURCES)}')",
        "road_components": f"SELECT * FROM read_parquet('{golden.road_components_path(routing.CHEAP_W_CUT)}')",
        "hmm_map_match": f"SELECT * FROM read_parquet('{golden.hmm_map_match_path(SF001)}')",
        "ann_recall_eval": f"SELECT * FROM read_parquet('{golden.ann_recall_path(SF001, ANN_K, MULTI_VEC_IDS)}')",
        "binary_hamming_topk": f"SELECT * FROM read_parquet('{golden.binary_hamming_topk_path(SF001, ANN_K, MULTI_VEC_IDS)}')",
        "binary_embedding_eval": f"SELECT * FROM read_parquet('{golden.binary_recall_path(SF001, ANN_K, MULTI_VEC_IDS)}')",
        "mmd_two_sample": f"SELECT * FROM read_parquet('{golden.mmd_two_sample_path(SF001, ann.MMD_FP)}')",
        "knn_calibration": f"SELECT * FROM read_parquet('{golden.knn_calibration_path(SF001, 5)}')",
        "intrinsic_dimension": f"SELECT * FROM read_parquet('{golden.intrinsic_dimension_path(SF001)}')",
        "kcenter_coreset": f"SELECT * FROM read_parquet('{golden.kcenter_coreset_path(SF001, ann.KCENTER_K)}')",
        "minhash_accuracy_eval": f"SELECT * FROM read_parquet('{golden.minhash_accuracy_path(SF001, 0.8)}')",
        "edit_distance_verify": f"SELECT * FROM read_parquet('{golden.edit_distance_verify_path(SF001)}')",
        "lsh_blocking_eval": f"SELECT * FROM read_parquet('{golden.lsh_blocking_eval_path(SF001, 0.8, dedup.resolve_blocking_mod(SF001))}')",
        "dedup_manifest": f"SELECT * FROM read_parquet('{golden.dedup_manifest_path(SF001, 0.8)}')",
        "way_assembly": f"SELECT * FROM read_parquet('{golden.way_assembly_path()}')",
        "way_lengths": f"SELECT * FROM read_parquet('{golden.way_lengths_path()}')",
        "zone_way_length": f"SELECT * FROM read_parquet('{golden.zone_way_length_path()}')",
        "way_junctions": f"SELECT * FROM read_parquet('{golden.way_junctions_path()}')",
        "boundary_assembly": f"SELECT * FROM read_parquet('{golden.boundary_assembly_path()}')",
        "boundary_stats": f"""
WITH v AS (SELECT * FROM read_parquet('{golden.boundary_vertices_path()}')),
e AS (SELECT rel_id, ring_idx, lon AS x1, lat AS y1,
        coalesce(lead(lon) OVER w, first_value(lon) OVER w2) AS x2,
        coalesce(lead(lat) OVER w, first_value(lat) OVER w2) AS y2
      FROM v WINDOW w AS (PARTITION BY rel_id, ring_idx ORDER BY vtx_idx),
        w2 AS (PARTITION BY rel_id, ring_idx ORDER BY vtx_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
t2 AS (SELECT e.rel_id, e.ring_idx,
        CAST(floor((e.x1 * e.y2 - e.x2 * e.y1) * {denormalize.SHOELACE_FP!r} + 0.5) AS BIGINT) AS a_fp,
        CAST(floor(((e.x1 + e.x2) * (e.x1 * e.y2 - e.x2 * e.y1)) * {denormalize.SHOELACE_FP!r} + 0.5) AS BIGINT) AS cx_fp,
        CAST(floor(((e.y1 + e.y2) * (e.x1 * e.y2 - e.x2 * e.y1)) * {denormalize.SHOELACE_FP!r} + 0.5) AS BIGINT) AS cy_fp
      FROM e),
s AS (SELECT rel_id, ring_idx, count(*) AS n_vertices,
        CAST(sum(a_fp) AS BIGINT) AS area_fp,
        CAST(sum(cx_fp) AS BIGINT) AS cx_fp,
        CAST(sum(cy_fp) AS BIGINT) AS cy_fp
      FROM t2 GROUP BY rel_id, ring_idx)
SELECT rel_id, ring_idx, n_vertices, area_fp, cx_fp, cy_fp,
  CAST(area_fp AS DOUBLE) / {2.0 * denormalize.SHOELACE_FP!r} AS area_deg2,
  CAST(cx_fp AS DOUBLE) / (3.0 * CAST(area_fp AS DOUBLE)) AS centroid_lon,
  CAST(cy_fp AS DOUBLE) / (3.0 * CAST(area_fp AS DOUBLE)) AS centroid_lat
FROM s""",
        "boundary_geodesic_area": f"SELECT * FROM read_parquet('{golden.boundary_geodesic_area_path()}')",
        "doc_fingerprint": f"SELECT * FROM read_parquet('{golden.doc_fingerprint_path(SF001)}')",
        "simhash": f"SELECT * FROM read_parquet('{golden.simhash_path(SF001)}')",
        "text_quality": f"SELECT * FROM read_parquet('{golden.text_quality_path(SF001)}')",
        "langid_confusion": f"""
SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM read_parquet('{golden.text_quality_path(SF001)}')
GROUP BY 1, 2 ORDER BY 1, 2""",
        "minhash_near_dup": f"SELECT * FROM read_parquet('{golden.minhash_near_dup_path(SF001)}')",
        "near_dup_clusters": f"SELECT * FROM read_parquet('{golden.near_dup_clusters_path(SF001)}')",
        "dbscan_clusters": f"SELECT * FROM read_parquet('{golden.dbscan_path(SF001, cluster.DBSCAN_EPS, cluster.DBSCAN_MIN_PTS)}')",
        "st_dbscan": f"SELECT * FROM read_parquet('{golden.st_dbscan_path(SF001, cluster.ST_EPS, cluster.ST_EPS_T_US, cluster.ST_MIN_PTS)}')",
        "convex_hull_per_area": f"SELECT * FROM read_parquet('{golden.convex_hull_path(SF001)}')",
        "sssp_dists": f"SELECT * FROM read_parquet('{golden.sssp_dists_path()}')",
        "isochrone_bands": f"""
SELECT dist // {routing.ISO_BAND} AS band, count(*) AS n_nodes
FROM read_parquet('{golden.sssp_dists_path()}')
WHERE dist <= {routing.ISO_BUDGET} GROUP BY band""",
        "bloom_dedup": (
            "SELECT * FROM read_parquet('"
            + golden.bloom_dedup_path(SF001, BLOOM_N, BLOOM_FP, BLOOM_PARTS)
            + "')"
        ),
        "ngram_jaccard_near_dup": f"SELECT * FROM read_parquet('{golden.ngram_jaccard_path(SF001)}')",
        "set_similarity_join": f"""
WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS shingle
       FROM d WHERE len(w) >= {dedup.SETSIM_WORDS}),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
j AS (SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jac
      FROM inter JOIN sizes sa ON sa.doc_id = inter.doc_a JOIN sizes sb ON sb.doc_id = inter.doc_b)
SELECT doc_a, doc_b, round(jac, 6) AS jaccard FROM j WHERE jac >= {dedup.SETSIM_THRESHOLD!r}""",
        "fuzzy_name_match": f"""
SELECT a.p_brand, a.p_partkey AS part_a, b.p_partkey AS part_b,
       round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS sim
FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= {dedup.JW_THRESHOLD!r}""",
        "ann_lsh_topk": f"SELECT * FROM read_parquet('{golden.ann_lsh_topk_path(SF001, k=ANN_K, vec_id=ANN_QUERY_ID)}')",
        "ann_ivf_topk": f"SELECT * FROM read_parquet('{golden.ann_ivf_topk_path(SF001, k=ANN_K, vec_id=ANN_QUERY_ID)}')",
        "ann_ivfpq_topk": f"SELECT * FROM read_parquet('{golden.ivfpq_topk_path(SF001, k=ANN_K, vec_id=ANN_QUERY_ID)}')",
        "embedding_near_dup_lsh": (
            "SELECT * FROM read_parquet('"
            + golden.embedding_near_dup_lsh_path(
                SF001, threshold=EMB_NEARDUP_T, bands=ann.LSH_BANDS, planes=ann.LSH_PLANES, seed=1117
            )
            + "')"
        ),
        "image_features": (
            "SELECT * FROM read_parquet('" + golden.image_features_path(images.images_path_for(SF001)) + "')"
        ),
        "image_thumbnails": (
            "SELECT * FROM read_parquet('" + golden.image_thumbnails_path(images.images_path_for(SF001)) + "')"
        ),
        "audio_features": (
            "SELECT * FROM read_parquet('" + golden.audio_features_path(multimodal.audio_path_for(SF001)) + "')"
        ),
        "video_frame_stats": (
            "SELECT * FROM read_parquet('" + golden.video_frame_stats_path(multimodal.video_path_for(SF001)) + "')"
        ),
        "audio_clipping": (
            "SELECT * FROM read_parquet('" + golden.audio_clipping_path(multimodal.audio_path_for(SF001)) + "')"
        ),
        "video_temporal_smoothness": (
            "SELECT * FROM read_parquet('" + golden.video_smoothness_path(multimodal.video_path_for(SF001)) + "')"
        ),
        "video_motion_vectors": (
            "SELECT * FROM read_parquet('" + golden.video_motion_vectors_path(multimodal.video_path_for(SF001)) + "')"
        ),
        "audio_harmonicity": (
            "SELECT * FROM read_parquet('" + golden.audio_harmonicity_path(multimodal.audio_path_for(SF001)) + "')"
        ),
        "audio_silence_trim": (
            "SELECT * FROM read_parquet('" + golden.audio_silence_trim_path(multimodal.audio_path_for(SF001)) + "')"
        ),
        "audio_band_energy": (
            "SELECT * FROM read_parquet('"
            + golden.audio_band_energy_path(
                multimodal.audio_path_for(SF001), multimodal.AUDIO_BANDS, multimodal.BAND_FP
            )
            + "')"
        ),
        "audio_fingerprint": (
            "SELECT * FROM read_parquet('"
            + golden.audio_fingerprint_path(multimodal.audio_path_for(SF001), multimodal.FP_MIN_SHARED)
            + "')"
        ),
        "video_shot_segmentation": (
            "SELECT * FROM read_parquet('"
            + golden.video_shots_path(multimodal.video_path_for(SF001))
            + "')"
        ),
        "audio_dedup_manifest": (
            "SELECT * FROM read_parquet('"
            + golden.audio_dedup_manifest_path(multimodal.audio_path_for(SF001), multimodal.FP_MIN_SHARED)
            + "')"
        ),
        "video_keyframes": (
            "SELECT * FROM read_parquet('" + golden.video_keyframes_path(multimodal.video_path_for(SF001)) + "')"
        ),
        "audio_pitch_histogram": (
            "SELECT * FROM read_parquet('"
            + golden.audio_pitch_histogram_path(multimodal.audio_path_for(SF001), multimodal.PITCH_BAND_HZ)
            + "')"
        ),
        # --- SQL-expressible oracles for the formerly-unchecked queries ---
        "sampled_event_stats": f"""
SELECT event_type, count(*) AS n_sampled FROM events
WHERE (event_id * {windows.SAMPLE_MULT}) % {windows.SAMPLE_MOD} < {int(0.2 * windows.SAMPLE_MOD)}
GROUP BY event_type""",
        "count_min_eval": f"""
WITH cms AS (
  {" UNION ALL ".join(f'''SELECT {r} AS r, (({a} * user_id + {b}) % {sketch.CMS_M31}) % {sketch.CMS_W} AS c, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 2''' for r, (a, b) in enumerate(zip(sketch.CMS_A, sketch.CMS_B)))}),
tops AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact FROM events
  GROUP BY 1 ORDER BY n_exact DESC, user_id LIMIT {windows.CMS_TOP_K}),
rk AS (
  SELECT user_id, n_exact,
         CAST(row_number() OVER (ORDER BY n_exact DESC, user_id) AS BIGINT) AS rank
  FROM tops),
est AS (
  SELECT rk.rank, rk.user_id, rk.n_exact, CAST(min(cms.n) AS BIGINT) AS n_est
  FROM rk JOIN cms
    ON cms.c = (((CASE cms.r {" ".join(f"WHEN {r} THEN {a}" for r, a in enumerate(sketch.CMS_A))} END) * rk.user_id
               + (CASE cms.r {" ".join(f"WHEN {r} THEN {b}" for r, b in enumerate(sketch.CMS_B))} END)) % {sketch.CMS_M31}) % {sketch.CMS_W}
  GROUP BY 1, 2, 3)
SELECT rank, user_id, n_exact, n_est, n_est - n_exact AS overestimate FROM est""",
        "distinct_users_approx": """
SELECT round(CAST(COUNT(DISTINCT user_id) AS DOUBLE), 1) AS n_users_approx FROM events""",
        "distinct_users_hll": f"SELECT * FROM read_parquet('{golden.hll_distinct_path(SF001)}')",
        "curriculum_buckets": f"""
WITH d AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS w FROM documents),
toks AS (SELECT doc_id, unnest(w) AS token FROM d),
cu AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM toks),
bi AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM d CROSS JOIN UNNEST(range(1, len(w))) AS r(i)),
cb AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2),
lp AS (SELECT bi.doc_id,
              ln({text.BIGRAM_LAMBDA!r} * (CAST(cb.c AS DOUBLE) / u1.c)
                 + {1.0 - text.BIGRAM_LAMBDA!r} * (u2.c / tot.t)) AS v
       FROM bi JOIN cb USING (w1, w2) JOIN cu u1 ON u1.token = bi.w1
               JOIN cu u2 ON u2.token = bi.w2 CROSS JOIN tot),
sc AS (SELECT doc_id, round(avg(v), 6) AS lm_score FROM lp GROUP BY doc_id),
r AS (SELECT sc.doc_id, d.lang, ntile({text.CURRICULUM_TIERS}) OVER (ORDER BY lm_score, sc.doc_id) AS tier
      FROM sc JOIN d ON d.doc_id = sc.doc_id)
SELECT tier, lang, count(*) AS n_docs FROM r GROUP BY tier, lang""",
        "zipf_fit": """
WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents),
cnt AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
rk AS (SELECT CAST(row_number() OVER (ORDER BY n DESC, token) AS DOUBLE) AS r,
              CAST(n AS DOUBLE) AS f FROM cnt),
s AS (SELECT count(*) AS n, sum(ln(r)) AS sx, sum(ln(f)) AS sy,
             sum(ln(r) * ln(r)) AS sxx, sum(ln(f) * ln(f)) AS syy, sum(ln(r) * ln(f)) AS sxy
      FROM rk)
SELECT CAST(n AS BIGINT) AS n_tokens,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s""",
        "did_uplift": f"""
WITH epts AS (SELECT event_type, ts, {oracle.sql_derive_lon('event_id')} AS lon,
                     {oracle.sql_derive_lat('event_id')} AS lat FROM events),
cls AS (SELECT event_type,
          lon >= {_r0['lon_min']!r} AND lon < {_r0['lon_max']!r}
          AND lat >= {_r0['lat_min']!r} AND lat < {_r0['lat_max']!r} AS inside,
          ts >= TIMESTAMP '{windows.DID_CUT}' AS aft
        FROM epts),
agg AS (SELECT event_type,
          CAST(sum(CASE WHEN inside AND NOT aft THEN 1 ELSE 0 END) AS BIGINT) AS t_before,
          CAST(sum(CASE WHEN inside AND aft THEN 1 ELSE 0 END) AS BIGINT) AS t_after,
          CAST(sum(CASE WHEN NOT inside AND NOT aft THEN 1 ELSE 0 END) AS BIGINT) AS c_before,
          CAST(sum(CASE WHEN NOT inside AND aft THEN 1 ELSE 0 END) AS BIGINT) AS c_after
        FROM cls GROUP BY event_type)
SELECT event_type, t_before, t_after, c_before, c_after,
       (t_after - t_before) - (c_after - c_before) AS did,
       round((CAST(t_after AS DOUBLE) / CAST(t_before AS DOUBLE))
             / (CAST(c_after AS DOUBLE) / CAST(c_before AS DOUBLE)), 6) AS lift
FROM agg""",
        "kaplan_meier": """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type FROM events
           WHERE event_type IN ('signup', 'purchase')),
tend AS (SELECT max(epoch_us(ts)) AS te FROM events),
s AS (SELECT user_id, CAST(min(tus) AS BIGINT) AS signup_tus FROM e
      WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT e.user_id, CAST(min(e.tus) AS BIGINT) AS purchase_tus
      FROM e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.tus >= s.signup_tus GROUP BY e.user_id),
u AS (SELECT s.user_id,
        CASE WHEN p.user_id IS NULL THEN (te - s.signup_tus) // 3600000000
             ELSE (p.purchase_tus - s.signup_tus) // 3600000000 END AS t,
        CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS ev
      FROM s LEFT JOIN p ON s.user_id = p.user_id CROSS JOIN tend),
d AS (SELECT t, CAST(count(*) AS BIGINT) AS n_users, CAST(sum(ev) AS BIGINT) AS n_events
      FROM u GROUP BY t),
r AS (SELECT t, n_events,
        CAST(sum(n_users) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
      FROM d)
SELECT t AS t_hours, n_risk, n_events,
       CASE WHEN max(CASE WHEN n_events >= n_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
            THEN 0.0
            ELSE round(exp(sum(CASE WHEN n_events >= n_risk THEN 0.0
                                    ELSE ln(1.0 - CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE)) END)
                           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) END AS survival
FROM r WHERE n_events > 0 ORDER BY t""",
        "blame_suppliers": f"""
WITH f AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + {relational.BLAME_LATE_DAYS} * 86400000000 THEN 1 ELSE 0 END) AS supp_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY l.l_orderkey, l.l_suppkey),
oc AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp, CAST(sum(supp_late) AS BIGINT) AS n_late
       FROM f GROUP BY l_orderkey),
cr AS (SELECT f.l_suppkey AS s_suppkey, CAST(count(*) AS BIGINT) AS numwait
       FROM f JOIN oc ON f.l_orderkey = oc.l_orderkey
       WHERE oc.n_supp >= 2 AND oc.n_late = 1 AND f.supp_late = 1
       GROUP BY f.l_suppkey)
SELECT cr.s_suppkey, s.s_name, cr.numwait
FROM cr JOIN supplier s ON cr.s_suppkey = s.s_suppkey
ORDER BY cr.numwait DESC, cr.s_suppkey LIMIT {relational.BLAME_K}""",
        "value_percent_rank": """
WITH e AS (SELECT event_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events)
SELECT event_id, cents, round(percent_rank() OVER (ORDER BY cents), 6) AS pct_rank FROM e""",
        "time_to_convert": """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type FROM events
           WHERE event_type IN ('signup', 'purchase')),
s AS (SELECT user_id, CAST(min(tus) AS BIGINT) AS signup_tus FROM e
      WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT e.user_id, CAST(min(e.tus) AS BIGINT) AS purchase_tus
      FROM e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.tus >= s.signup_tus GROUP BY e.user_id)
SELECT s.user_id, s.signup_tus, p.purchase_tus,
       (p.purchase_tus - s.signup_tus) // 1000000 AS delta_s
FROM s JOIN p ON s.user_id = p.user_id""",
        "event_transition_lift": """
WITH w AS (SELECT event_type, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
m AS (SELECT prev AS prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
      FROM w WHERE prev IS NOT NULL GROUP BY 1, 2),
r AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS rn FROM m GROUP BY 1),
c AS (SELECT next_type, CAST(sum(n) AS BIGINT) AS cn FROM m GROUP BY 1),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM m)
SELECT m.prev_type, m.next_type, m.n,
       round(CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / tot, 6) AS expected,
       round(CAST(m.n AS DOUBLE) / (CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / tot), 6) AS lift
FROM m JOIN r USING (prev_type) JOIN c USING (next_type) CROSS JOIN t""",
        "seasonal_decompose": """
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day_idx,
                  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM events),
daily AS (SELECT day_idx, CAST(sum(c) AS BIGINT) AS x FROM e GROUP BY day_idx),
tr AS (SELECT day_idx, x,
         avg(CAST(x AS DOUBLE)) OVER w AS trend, count(*) OVER w AS nw
       FROM daily WINDOW w AS (ORDER BY day_idx ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
dt AS (SELECT day_idx, x, trend, x - trend AS detr, day_idx % 7 AS wd FROM tr WHERE nw = 7),
se AS (SELECT *, avg(detr) OVER (PARTITION BY wd) AS seasonal FROM dt)
SELECT day_idx, x, round(trend, 6) AS trend, round(seasonal, 6) AS seasonal,
       round(detr - seasonal, 6) AS resid
FROM se""",
        "embedding_near_dup": f"""
WITH scored AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT vec_a, vec_b, round(sim, 6) AS sim FROM scored WHERE sim >= {EMB_NEARDUP_T!r}""",
        "heavy_hitters": f"""
WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents),
c AS (SELECT token, count(*) AS n FROM toks GROUP BY token)
SELECT CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS hh_rank, token, n,
       CAST(0 AS BIGINT) AS max_err
FROM c ORDER BY n DESC, token LIMIT {HH_K}""",
        "ann_multi_topk": f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
           WHERE vec_id IN ({", ".join(str(v) for v in MULTI_VEC_IDS)})),
scored AS (SELECT q.qid AS query_vec_id, e.vec_id,
                  list_cosine_similarity(e.embedding, q.qv) AS sim
           FROM embeddings e JOIN q ON e.vec_id != q.qid),
ranked AS (SELECT query_vec_id, vec_id,
                  CAST(row_number() OVER (PARTITION BY query_vec_id ORDER BY sim DESC, vec_id) AS BIGINT) AS sim_rank
           FROM scored)
SELECT query_vec_id, sim_rank, vec_id FROM ranked WHERE sim_rank <= {ANN_K}""",
        "search_ranked": f"""
WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
       WHERE token IN ({", ".join(f"'{t}'" for t in SEARCH_TOKENS)}) GROUP BY doc_id, token),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT count(*) AS n FROM documents),
sc AS (SELECT tf.doc_id, round(sum(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df)), 6) AS score
       FROM tf JOIN df ON tf.token = df.token CROSS JOIN n GROUP BY tf.doc_id)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS search_rank, doc_id, score
FROM sc ORDER BY score DESC, doc_id LIMIT {SEARCH_K}""",
        # BM25: every float expression associated exactly as the engine
        # computes it (literals written as the same sums, no pre-folding)
        "search_bm25": f"""
WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM documents) AS n, (SELECT count(*) FROM toks) AS total),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
       WHERE token IN ({", ".join(f"'{t}'" for t in SEARCH_TOKENS)}) GROUP BY doc_id, token),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
sc AS (SELECT tf.doc_id,
       round(sum(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0) * tf.tf * (1.2 + 1.0)
             / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl.dl / (CAST(stats.total AS DOUBLE) / stats.n))))), 6) AS score
       FROM tf JOIN df ON tf.token = df.token JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
       GROUP BY tf.doc_id)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS bm25_rank, doc_id, score
FROM sc ORDER BY score DESC, doc_id LIMIT {SEARCH_K}""",
        "rrf_fusion": f"""
WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM documents) AS n, (SELECT count(*) FROM toks) AS total),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
       WHERE token IN ({", ".join(f"'{t}'" for t in SEARCH_TOKENS)}) GROUP BY doc_id, token),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
sc1 AS (SELECT tf.doc_id, round(sum(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df)), 6) AS score
        FROM tf JOIN df ON tf.token = df.token CROSS JOIN (SELECT n FROM stats) n GROUP BY tf.doc_id),
r1 AS (SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r, doc_id
       FROM sc1 ORDER BY score DESC, doc_id LIMIT {SEARCH_K}),
sc2 AS (SELECT tf.doc_id,
        round(sum(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0) * tf.tf * (1.2 + 1.0)
              / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl.dl / (CAST(stats.total AS DOUBLE) / stats.n))))), 6) AS score
        FROM tf JOIN df ON tf.token = df.token JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
        GROUP BY tf.doc_id),
r2 AS (SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r, doc_id
       FROM sc2 ORDER BY score DESC, doc_id LIMIT {SEARCH_K}),
u AS (SELECT doc_id FROM r1 UNION SELECT doc_id FROM r2),
f AS (SELECT u.doc_id,
        round(coalesce(1.0 / ({index.RRF_K} + r1.r), 0.0) + coalesce(1.0 / ({index.RRF_K} + r2.r), 0.0), 6) AS rrf,
        coalesce(r1.r, 0) AS r_tfidf, coalesce(r2.r, 0) AS r_bm25
      FROM u LEFT JOIN r1 USING (doc_id) LEFT JOIN r2 USING (doc_id))
SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS fusion_rank,
       doc_id, rrf AS rrf_score, CAST(r_tfidf AS BIGINT) AS r_tfidf, CAST(r_bm25 AS BIGINT) AS r_bm25
FROM f ORDER BY rrf DESC, doc_id""",
        "image_fidelity": f"""
SELECT fmt, count(*) AS n_images, count(*) AS n_ok FROM {img_pq} GROUP BY fmt""",
        "phash_near_dup_pairs": f"""
SELECT a.image_id AS image_id_a, b.image_id AS image_id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM {img_pq} a JOIN {img_pq} b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3""",
        # --- trajectory / movement (planar-degree fixed-point: + * sqrt
        # are correctly rounded IEEE ops, int64 sums are order-free) ---
        "trajectory_stats": f"""
WITH {_epts},
w AS (SELECT user_id, lon, lat,
        lag(lon) OVER uw AS plon, lag(lat) OVER uw AS plat,
        first_value(lon) OVER uwf AS flon, first_value(lat) OVER uwf AS flat,
        last_value(lon) OVER uwf AS llon, last_value(lat) OVER uwf AS llat
      FROM epts
      WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id),
             uwf AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
SELECT user_id, count(*) AS n_events,
  CAST(sum(CASE WHEN plon IS NULL THEN 0
       ELSE {_fp_sql('(lon - plon)', '(lat - plat)')} END) AS BIGINT) AS path_fp,
  max({_fp_sql('(llon - flon)', '(llat - flat)')}) AS disp_fp
FROM w GROUP BY user_id""",
        "trip_stats": f"""
WITH {_epts},
w AS (SELECT user_id, event_id, ts, lon, lat,
        lag(ts) OVER uw AS pts, lag(lon) OVER uw AS plon, lag(lat) OVER uw AS plat
      FROM epts WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)),
m AS (SELECT *, CASE WHEN pts IS NULL
        OR epoch_us(ts) - epoch_us(pts) > {trajectory.TRIP_GAP_MIN * 60_000_000}
        THEN 1 ELSE 0 END AS new_t FROM w),
s AS (SELECT *, CAST(SUM(new_t) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS trip_seq FROM m),
seg AS (SELECT user_id, trip_seq, ts,
          CASE WHEN new_t = 1 THEN 0
               ELSE {_fp_sql('(lon - plon)', '(lat - plat)')} END AS fp
        FROM s)
SELECT user_id, trip_seq, count(*) AS n_events,
       CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS dur_us,
       CAST(sum(fp) AS BIGINT) AS path_fp
FROM seg GROUP BY user_id, trip_seq""",
        "od_matrix": _od_body,
        "od_gravity": f"""
WITH od AS ({_od_body}),
m AS (SELECT o_cell, d_cell, n_users,
        SUM(n_users) OVER (PARTITION BY o_cell) AS mo,
        SUM(n_users) OVER (PARTITION BY d_cell) AS md,
        SUM(n_users) OVER () AS tot FROM od),
e AS (SELECT o_cell, d_cell, n_users,
        CAST(mo AS BIGINT) AS n_o, CAST(md AS BIGINT) AS n_d,
        CAST(mo AS DOUBLE) * CAST(md AS DOUBLE) / CAST(tot AS DOUBLE) AS expected FROM m)
SELECT o_cell, d_cell, n_users, n_o, n_d, expected,
  CAST(n_users AS DOUBLE) - expected AS resid,
  (CAST(n_users AS DOUBLE) - expected) * (CAST(n_users AS DOUBLE) - expected) / expected AS chi2
FROM e""",
        "gravity_decay_fit": f"""
WITH {_epts},
sc AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
         CAST(floor((lon - {fixtures.LON_MIN!r}) / {trajectory.TRANS_PITCH!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {trajectory.TRANS_PITCH!r}) AS BIGINT) AS cy
       FROM epts),
st AS (SELECT cx, cy,
         lag(cx) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS px,
         lag(cy) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS py
       FROM sc),
tr AS (SELECT px AS fx, py AS fy, cx AS tx, cy AS ty, CAST(count(*) AS BIGINT) AS n
       FROM st WHERE px IS NOT NULL GROUP BY px, py, cx, cy),
ll AS (SELECT ln(sqrt(CAST((fx - tx) * (fx - tx) + (fy - ty) * (fy - ty) AS DOUBLE))) AS lx,
              ln(CAST(n AS DOUBLE)) AS ly
       FROM tr WHERE (fx - tx) * (fx - tx) + (fy - ty) * (fy - ty) > 0),
t AS (SELECT CAST(count(*) AS BIGINT) AS m,
        CAST(sum(CAST(floor(lx * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
        CAST(sum(CAST(floor(ly * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
        CAST(sum(CAST(floor(lx * lx * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sxx,
        CAST(sum(CAST(floor(lx * ly * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
        CAST(sum(CAST(floor(ly * ly * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS syy
      FROM ll),
f AS (SELECT CAST(m AS DOUBLE) AS fm,
        CAST(sx AS DOUBLE) / 1000000000000.0 AS fsx, CAST(sy AS DOUBLE) / 1000000000000.0 AS fsy,
        CAST(sxx AS DOUBLE) / 1000000000000.0 AS fsxx, CAST(sxy AS DOUBLE) / 1000000000000.0 AS fsxy,
        CAST(syy AS DOUBLE) / 1000000000000.0 AS fsyy, m FROM t)
SELECT m AS n_pairs,
       round((fm * fsxy - fsx * fsy) / (fm * fsxx - fsx * fsx), 6) AS beta,
       round((fsy - ((fm * fsxy - fsx * fsy) / (fm * fsxx - fsx * fsx)) * fsx) / fm, 6) AS intercept,
       round(pow(fm * fsxy - fsx * fsy, 2) / ((fm * fsxx - fsx * fsx) * (fm * fsyy - fsy * fsy)), 6) AS r2
FROM f""",
        "transition_stationary": f"SELECT * FROM read_parquet('{golden.transition_stationary_path(SF001, trajectory.TRANS_PITCH, trajectory.STAT_ITERS)}')",
        "predictability_bound": f"SELECT * FROM read_parquet('{golden.predictability_bound_path(SF001, trajectory.TRANS_PITCH)}')",
        "transition_entropy": f"""
WITH {_epts},
sc AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
         CAST(floor((lon - {fixtures.LON_MIN!r}) / {trajectory.TRANS_PITCH!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {trajectory.TRANS_PITCH!r}) AS BIGINT) AS cy
       FROM epts),
st AS (SELECT cx, cy,
         lag(cx) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS px,
         lag(cy) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS py
       FROM sc),
tr AS (SELECT px AS fx, py AS fy, CAST(count(*) AS BIGINT) AS ni
       FROM st WHERE px IS NOT NULL GROUP BY px, py, cx, cy),
fpt AS (SELECT fx, fy, ni,
          CAST(floor(ni * ln(CAST(ni AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT) AS f
        FROM tr),
agg AS (SELECT fx, fy, CAST(sum(ni) AS BIGINT) AS n_steps,
               CAST(count(*) AS BIGINT) AS n_dests, CAST(sum(f) AS BIGINT) AS sfp
        FROM fpt GROUP BY fx, fy)
SELECT fx, fy, n_steps, n_dests,
       round(ln(CAST(n_steps AS DOUBLE)) - (CAST(sfp AS DOUBLE) / 1000000000.0) / CAST(n_steps AS DOUBLE), 6) AS entropy
FROM agg""",
        "user_mobility_entropy": f"""
WITH {_epts},
sc AS (SELECT user_id,
         CAST(floor((lon - {fixtures.LON_MIN!r}) / {trajectory.TRANS_PITCH!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {trajectory.TRANS_PITCH!r}) AS BIGINT) AS cy
       FROM epts),
ct AS (SELECT user_id, cx, cy, CAST(count(*) AS BIGINT) AS ni FROM sc GROUP BY 1, 2, 3),
fpt AS (SELECT user_id, ni,
          CAST(floor(ni * ln(CAST(ni AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT) AS f
        FROM ct),
agg AS (SELECT user_id, CAST(sum(ni) AS BIGINT) AS n_events,
               CAST(count(*) AS BIGINT) AS n_cells, CAST(sum(f) AS BIGINT) AS sfp
        FROM fpt GROUP BY user_id)
SELECT user_id, n_events, n_cells,
       round(ln(CAST(n_events AS DOUBLE)) - (CAST(sfp AS DOUBLE) / 1000000000.0) / CAST(n_events AS DOUBLE), 6) AS entropy
FROM agg""",
        "displacement_histogram": f"""
WITH {_epts},
w AS (SELECT user_id, lon, lat,
        lag(lon) OVER uw AS plon, lag(lat) OVER uw AS plat
      FROM epts WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT CAST(floor(sqrt((lon - plon) * (lon - plon) + (lat - plat) * (lat - plat)) * 1000000000.0 + 0.5) AS BIGINT) AS dist_fp
      FROM w WHERE plon IS NOT NULL),
m AS (SELECT CASE WHEN dist_fp = 0 THEN 0 ELSE length(CAST(dist_fp AS VARCHAR)) END AS mag FROM s),
c AS (SELECT CAST(mag AS BIGINT) AS mag, CAST(count(*) AS BIGINT) AS n_steps FROM m GROUP BY mag),
t AS (SELECT CAST(sum(n_steps) AS DOUBLE) AS tot FROM c)
SELECT mag, n_steps, round(CAST(n_steps AS DOUBLE) / tot, 6) AS frac FROM c CROSS JOIN t""",
        "speed_audit": f"""
WITH {_epts},
w AS (SELECT user_id, lon, lat,
        lag(lon) OVER uw AS plon, lag(lat) OVER uw AS plat,
        epoch_us(ts) - lag(epoch_us(ts)) OVER uw AS dt_us
      FROM epts WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT user_id, {_fp_sql('(lon - plon)', '(lat - plat)')} AS dist_fp, dt_us
      FROM w WHERE plon IS NOT NULL)
SELECT user_id, count(*) AS n_steps,
  CAST(sum(CASE WHEN dist_fp * {trajectory.US_PER_S} > {trajectory.SPEED_VMAX_FP} * dt_us THEN 1 ELSE 0 END) AS BIGINT) AS n_teleports,
  CAST(max(CASE WHEN dist_fp * {trajectory.US_PER_S} > {trajectory.SPEED_VMAX_FP} * dt_us THEN dist_fp ELSE 0 END) AS BIGINT) AS max_jump_fp
FROM s GROUP BY user_id""",
        "hits_scores": f"SELECT * FROM read_parquet('{golden.hits_scores_path(SF001)}')",
        "markov_attribution": f"SELECT * FROM read_parquet('{golden.markov_attribution_path(SF001)}')",
        "place_ppr": f"SELECT * FROM read_parquet('{golden.place_ppr_path(SF001)}')",
        "ndcg_eval": f"SELECT * FROM read_parquet('{golden.ndcg_eval_path(SF001, ('spark', 'data'), 20)}')",
        "bootstrap_ci": f"SELECT * FROM read_parquet('{golden.bootstrap_ci_path(SF001)}')",
        "ipf_od_balancing": f"SELECT * FROM read_parquet('{golden.ipf_od_balancing_path(SF001)}')",
        "winnowing_overlap": f"SELECT * FROM read_parquet('{golden.winnowing_overlap_path(SF001, text.WIN_MIN_SHARED)}')",
        "jl_projection_audit": f"SELECT * FROM read_parquet('{golden.jl_projection_audit_path(SF001)}')",
        "moran_correlogram": f"SELECT * FROM read_parquet('{golden.moran_correlogram_path(SF001)}')",
        "binseg_changepoints": f"SELECT * FROM read_parquet('{golden.binseg_changepoints_path(SF001)}')",
        "label_propagation_communities": f"SELECT * FROM read_parquet('{golden.lpa_communities_path(SF001)}')",
        "flow_divergence": f"""
WITH {_epts},
sc AS (SELECT user_id, event_id, ts,
         CAST(floor((lon - {fixtures.LON_MIN!r}) / {trajectory.TRANS_PITCH!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {trajectory.TRANS_PITCH!r}) AS BIGINT) AS cy
       FROM epts),
w AS (SELECT cx, cy,
        lag(cx) OVER uw AS pcx, lag(cy) OVER uw AS pcy
      FROM sc WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT pcx AS fx, pcy AS fy, cx AS tx, cy AS ty FROM w
      WHERE pcx IS NOT NULL AND (pcx <> cx OR pcy <> cy)),
u AS (SELECT fx AS cx, fy AS cy, 1 AS outn, 0 AS inn FROM s
      UNION ALL
      SELECT tx AS cx, ty AS cy, 0 AS outn, 1 AS inn FROM s),
a AS (SELECT cx, cy, CAST(sum(outn) AS BIGINT) AS outflow, CAST(sum(inn) AS BIGINT) AS inflow
      FROM u GROUP BY cx, cy)
SELECT cx, cy, outflow, inflow, outflow - inflow AS divergence,
       round(CAST(outflow - inflow AS DOUBLE) / greatest(outflow + inflow, 1), 6) AS imbalance
FROM a""",
        "mode_segmentation": f"""
WITH {_epts},
w AS (SELECT user_id, lon, lat,
        lag(lon) OVER uw AS plon, lag(lat) OVER uw AS plat,
        epoch_us(ts) - lag(epoch_us(ts)) OVER uw AS dt_us
      FROM epts WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT user_id, {_fp_sql('(lon - plon)', '(lat - plat)')} AS dist_fp, dt_us
      FROM w WHERE plon IS NOT NULL),
m AS (SELECT user_id,
        CASE WHEN dist_fp * {trajectory.US_PER_S} <= {trajectory.MODE_WALK_FP} * dt_us THEN 0
             WHEN dist_fp * {trajectory.US_PER_S} <= {trajectory.MODE_BIKE_FP} * dt_us THEN 1
             ELSE 2 END AS mode
      FROM s),
a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_steps,
        CAST(sum(CASE WHEN mode = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_walk,
        CAST(sum(CASE WHEN mode = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bike,
        CAST(sum(CASE WHEN mode = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_drive
      FROM m GROUP BY user_id)
SELECT user_id, n_steps, n_walk, n_bike, n_drive,
       CASE WHEN n_walk >= n_bike AND n_walk >= n_drive THEN 'walk'
            WHEN n_bike >= n_drive THEN 'bike' ELSE 'drive' END AS dominant,
       round(CAST(n_walk AS DOUBLE) / CAST(n_steps AS DOUBLE), 6) AS walk_frac
FROM a""",
        "spatial_self_join": f"""
WITH {_epts}
SELECT a.event_id AS id_a, b.event_id AS id_b,
  {_fp_sql('(b.lon - a.lon)', '(b.lat - a.lat)')} AS dist_fp
FROM epts a JOIN epts b
ON a.event_id < b.event_id
AND b.lon >= a.lon - {2 * trajectory.EPS_DEG!r} AND b.lon <= a.lon + {2 * trajectory.EPS_DEG!r}
WHERE (b.lon - a.lon) * (b.lon - a.lon) + (b.lat - a.lat) * (b.lat - a.lat)
      <= {trajectory.EPS_DEG * trajectory.EPS_DEG!r}""",
        "colocation_join": f"""
WITH {_epts},
pairs AS (
  SELECT a.user_id AS ua, b.user_id AS ub
  FROM epts a JOIN epts b
  ON a.event_id < b.event_id AND a.user_id <> b.user_id
  AND b.lon >= a.lon - {2 * trajectory.COLOC_EPS!r} AND b.lon <= a.lon + {2 * trajectory.COLOC_EPS!r}
  WHERE (b.lon - a.lon) * (b.lon - a.lon) + (b.lat - a.lat) * (b.lat - a.lat)
        <= {trajectory.COLOC_EPS * trajectory.COLOC_EPS!r}
    AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {trajectory.COLOC_TAU_US}
)
SELECT least(ua, ub) AS user_a, greatest(ua, ub) AS user_b, count(*) AS n_contacts
FROM pairs GROUP BY 1, 2""",
        "stay_points": f"""
WITH {_epts},
sc AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus,
         CAST(floor((lon - {fixtures.LON_MIN!r}) / {trajectory.STAY_PITCH!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {trajectory.STAY_PITCH!r}) AS BIGINT) AS cy
  FROM epts),
runs AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY tus, event_id)
          - row_number() OVER (PARTITION BY user_id, cx, cy ORDER BY tus, event_id) AS grp
  FROM sc)
SELECT user_id, cx, cy, min(tus) AS enter_us, max(tus) AS exit_us, count(*) AS n_fixes
FROM runs GROUP BY user_id, cx, cy, grp HAVING count(*) >= {trajectory.STAY_MIN_FIXES}""",
        "heading_histogram": f"""
WITH {_epts},
seq AS (
  SELECT user_id, lon, lat,
         lag(lon) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS plon,
         lag(lat) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS plat
  FROM epts),
seg AS (
  SELECT user_id, lon - plon AS dx, lat - plat AS dy FROM seq
  WHERE plon IS NOT NULL AND NOT (lon = plon AND lat = plat))
SELECT user_id,
       CASE
         WHEN dx >= 0 AND dy >= 0 AND abs(dx) >= abs(dy) THEN 0
         WHEN dx >= 0 AND dy >= 0 THEN 1
         WHEN dx < 0 AND dy >= 0 AND abs(dy) > abs(dx) THEN 2
         WHEN dx < 0 AND dy >= 0 THEN 3
         WHEN dx < 0 AND dy < 0 AND abs(dx) >= abs(dy) THEN 4
         WHEN dx < 0 AND dy < 0 THEN 5
         WHEN dx >= 0 AND dy < 0 AND abs(dy) > abs(dx) THEN 6
         ELSE 7
       END AS octant,
       count(*) AS n_segments
FROM seg GROUP BY 1, 2""",
        # mirrors trajectory.rayleigh_test: unit-vector components pinned
        # once to int64 fixed-point per segment, z = n * r_bar^2
        "rayleigh_test": f"""
WITH {_epts},
seq AS (
  SELECT user_id, lon, lat,
         lag(lon) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS plon,
         lag(lat) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS plat
  FROM epts),
seg AS (
  SELECT user_id, lon - plon AS dx, lat - plat AS dy,
         sqrt((lon - plon) * (lon - plon) + (lat - plat) * (lat - plat)) AS nrm
  FROM seq
  WHERE plon IS NOT NULL AND NOT (lon = plon AND lat = plat)),
pins AS (
  SELECT user_id,
         CAST(floor(dx / nrm * {trajectory.FP_SCALE!r} + 0.5) AS BIGINT) AS cfp,
         CAST(floor(dy / nrm * {trajectory.FP_SCALE!r} + 0.5) AS BIGINT) AS sfp
  FROM seg WHERE nrm > 0.0),
agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_segments,
         CAST(sum(cfp) AS BIGINT) AS sum_cos_fp, CAST(sum(sfp) AS BIGINT) AS sum_sin_fp
  FROM pins GROUP BY 1),
f AS (
  SELECT *, CAST(sum_cos_fp AS DOUBLE) / {trajectory.FP_SCALE!r} AS c,
            CAST(sum_sin_fp AS DOUBLE) / {trajectory.FP_SCALE!r} AS s,
            CAST(n_segments AS DOUBLE) AS nf
  FROM agg WHERE n_segments >= 2)
SELECT user_id, n_segments, sum_cos_fp, sum_sin_fp,
       round(sqrt(c * c + s * s) / greatest(nf, 1.0), 6) AS mean_resultant,
       round(nf * ((sqrt(c * c + s * s) / greatest(nf, 1.0))
                   * (sqrt(c * c + s * s) / greatest(nf, 1.0))), 6) AS rayleigh_z
FROM f""",
        "zone_dispersion": f"""
WITH {_epts},
fq AS (
  SELECT lon, lat,
         CAST(floor((lon - {fixtures.LON_MIN!r}) * {hotspot.DISP_FP!r} + 0.5) AS BIGINT) AS fx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) * {hotspot.DISP_FP!r} + 0.5) AS BIGINT) AS fy
  FROM epts),
jn AS (
  SELECT b.rel_id, b.admin_level, f.fx, f.fy FROM fq f JOIN {rects}
  ON f.lon >= b.lon_min AND f.lon < b.lon_max AND f.lat >= b.lat_min AND f.lat < b.lat_max),
agg AS (
  SELECT rel_id, admin_level, count(*) AS n,
         CAST(sum(fx) AS BIGINT) AS sx, CAST(sum(fy) AS BIGINT) AS sy,
         CAST(sum(fx * fx) AS BIGINT) AS sxx, CAST(sum(fy * fy) AS BIGINT) AS syy,
         CAST(sum(fx * fy) AS BIGINT) AS sxy
  FROM jn GROUP BY 1, 2)
SELECT rel_id, admin_level, n AS n_events,
       round({fixtures.LON_MIN!r} + CAST(sx AS DOUBLE) / {hotspot.DISP_FP!r} / n, 6) AS mean_lon,
       round({fixtures.LAT_MIN!r} + CAST(sy AS DOUBLE) / {hotspot.DISP_FP!r} / n, 6) AS mean_lat,
       round(sqrt((CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) / ({hotspot.DISP_FP!r} * {hotspot.DISP_FP!r})
                + (CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) / ({hotspot.DISP_FP!r} * {hotspot.DISP_FP!r})), 6) AS std_dist,
       round((CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) / ({hotspot.DISP_FP!r} * {hotspot.DISP_FP!r}), 6) AS cov_xy
FROM agg""",
        "std_ellipse": f"""
WITH {_epts},
fq AS (
  SELECT lon, lat,
         CAST(floor((lon - {fixtures.LON_MIN!r}) * {hotspot.DISP_FP!r} + 0.5) AS BIGINT) AS fx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) * {hotspot.DISP_FP!r} + 0.5) AS BIGINT) AS fy
  FROM epts),
jn AS (
  SELECT b.rel_id, b.admin_level, f.fx, f.fy FROM fq f JOIN {rects}
  ON f.lon >= b.lon_min AND f.lon < b.lon_max AND f.lat >= b.lat_min AND f.lat < b.lat_max),
agg AS (
  SELECT rel_id, admin_level, count(*) AS n,
         CAST(sum(fx) AS BIGINT) AS sx, CAST(sum(fy) AS BIGINT) AS sy,
         CAST(sum(fx * fx) AS BIGINT) AS sxx, CAST(sum(fy * fy) AS BIGINT) AS syy,
         CAST(sum(fx * fy) AS BIGINT) AS sxy
  FROM jn GROUP BY 1, 2),
v AS (
  SELECT rel_id, admin_level, n,
         (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) / ({hotspot.DISP_FP!r} * {hotspot.DISP_FP!r}) AS vx,
         (CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) / ({hotspot.DISP_FP!r} * {hotspot.DISP_FP!r}) AS vy,
         (CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) / ({hotspot.DISP_FP!r} * {hotspot.DISP_FP!r}) AS cv
  FROM agg),
e AS (
  SELECT rel_id, admin_level, n, vx, vy, cv,
         sqrt(((vx - vy) / 2.0) * ((vx - vy) / 2.0) + cv * cv) AS disc
  FROM v),
l AS (
  SELECT rel_id, admin_level, n, vx, vy, cv,
         (vx + vy) / 2.0 + disc AS lam1,
         (vx + vy) / 2.0 - disc AS lam2
  FROM e)
SELECT rel_id, admin_level, n AS n_events,
       round(0.5 * atan2(2.0 * cv, vx - vy), 6) AS theta_rad,
       round(sqrt(greatest(lam1, 0.0)), 6) AS semi_major,
       round(sqrt(greatest(lam2, 0.0)), 6) AS semi_minor,
       round(CASE WHEN lam1 > 0.0 THEN sqrt(greatest(1.0 - lam2 / lam1, 0.0)) ELSE 0.0 END, 6) AS eccentricity
FROM l""",
        "spatial_thinning": f"""
WITH {_epts},
hk AS (
  SELECT event_id,
         CAST(floor((lon - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy,
         (event_id * {hotspot.THIN_MULT} + {hotspot.THIN_ADD}) % {hotspot.M31} AS h
  FROM epts),
rk AS (
  SELECT cx, cy, event_id,
         row_number() OVER (PARTITION BY cx, cy ORDER BY h, event_id) AS thin_rank
  FROM hk)
SELECT cx, cy, event_id, thin_rank FROM rk WHERE thin_rank <= {hotspot.THIN_K}""",
        "change_detection": f"""
WITH {_epts},
sc AS (
  SELECT CAST(floor((lon - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy,
         CASE WHEN epoch_us(ts) < {hotspot.CHANGE_SPLIT_US} THEN 1 ELSE 0 END AS before
  FROM epts)
SELECT cx, cy,
       CAST(sum(before) AS BIGINT) AS n_before,
       CAST(sum(1 - before) AS BIGINT) AS n_after,
       CAST(sum(1 - before) - sum(before) AS BIGINT) AS delta
FROM sc GROUP BY cx, cy""",
        "ripley_k": f"""
WITH {_epts},
pr AS (
  SELECT (b.lon - a.lon) * (b.lon - a.lon) + (b.lat - a.lat) * (b.lat - a.lat) AS d2
  FROM epts a JOIN epts b
  ON a.event_id < b.event_id
  AND b.lon >= a.lon - {max(hotspot.RIPLEY_RADII)!r} AND b.lon <= a.lon + {max(hotspot.RIPLEY_RADII)!r}
  AND b.lat >= a.lat - {max(hotspot.RIPLEY_RADII)!r} AND b.lat <= a.lat + {max(hotspot.RIPLEY_RADII)!r})
{' UNION ALL '.join(f"SELECT CAST({r!r} AS DOUBLE) AS r, count(*) AS n_pairs FROM pr WHERE d2 <= {r * r!r}" for r in hotspot.RIPLEY_RADII)}""",
        "cell_entropy": f"""
WITH etc AS (
  SELECT event_type,
         CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy
  FROM events),
ct AS (SELECT cx, cy, event_type, count(*) AS ni FROM etc GROUP BY 1, 2, 3),
fpt AS (
  SELECT cx, cy, ni,
         CAST(floor(ni * ln(CAST(ni AS DOUBLE)) * {hotspot.ENTROPY_FP!r} + 0.5) AS BIGINT) AS f
  FROM ct),
agg AS (
  SELECT cx, cy, CAST(sum(ni) AS BIGINT) AS n_events, CAST(sum(f) AS BIGINT) AS sum_nlogn_fp
  FROM fpt GROUP BY cx, cy)
SELECT cx, cy, n_events, sum_nlogn_fp,
       round(ln(CAST(n_events AS DOUBLE))
             - (CAST(sum_nlogn_fp AS DOUBLE) / {hotspot.ENTROPY_FP!r}) / CAST(n_events AS DOUBLE), 6) AS entropy
FROM agg""",
        "space_time_cube": f"""
WITH {_epts}
SELECT CAST(floor((lon - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
       CAST(floor((lat - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy,
       epoch_us(ts) // {hotspot.DAY_US} AS day,
       count(*) AS n_events
FROM epts GROUP BY 1, 2, 3""",
        "idw_loocv": f"""
WITH e AS (
  SELECT event_id, value, {oracle.sql_derive_lon('event_id')} AS lon, {oracle.sql_derive_lat('event_id')} AS lat
  FROM events),
pw AS (
  SELECT a.event_id, a.value,
         1.0 / ((b.lon - a.lon) * (b.lon - a.lon) + (b.lat - a.lat) * (b.lat - a.lat) + {hotspot.IDW_SOFT!r}) AS w,
         b.value AS vb
  FROM e a JOIN e b
  ON b.lon >= a.lon - {hotspot.LOOCV_RADIUS!r} AND b.lon <= a.lon + {hotspot.LOOCV_RADIUS!r}
  WHERE a.event_id <> b.event_id
    AND (b.lon - a.lon) * (b.lon - a.lon) + (b.lat - a.lat) * (b.lat - a.lat)
        <= {hotspot.LOOCV_RADIUS * hotspot.LOOCV_RADIUS!r}),
s AS (
  SELECT event_id, value, CAST(count(*) AS BIGINT) AS n_neigh,
         CAST(sum(CAST(floor(w * {hotspot.IDW_FP!r} + 0.5) AS BIGINT)) AS BIGINT) AS sum_w_fp,
         CAST(sum(CAST(floor(w * vb * {hotspot.IDW_FP!r} + 0.5) AS BIGINT)) AS BIGINT) AS sum_wv_fp
  FROM pw GROUP BY 1, 2)
SELECT event_id, n_neigh, sum_w_fp, sum_wv_fp,
       CAST(floor((value - CAST(sum_wv_fp AS DOUBLE) / sum_w_fp) * 1e6 + 0.5) AS BIGINT) AS resid_fp
FROM s""",
        "idw_interpolation": f"""
WITH evv AS (
  SELECT value, {oracle.sql_derive_lon('event_id')} AS lon, {oracle.sql_derive_lat('event_id')} AS lat
  FROM events),
sites AS (
  SELECT i.i AS cx, j.j AS cy,
         {fixtures.LON_MIN!r} + (i.i + 0.5) * {hotspot.GI_EPS!r} AS sx,
         {fixtures.LAT_MIN!r} + (j.j + 0.5) * {hotspot.GI_EPS!r} AS sy
  FROM generate_series(0, {hotspot.GI_GX - 1}) AS i(i)
  CROSS JOIN generate_series(0, {hotspot.GI_GY - 1}) AS j(j)),
pw AS (
  SELECT s.cx, s.cy, e.value,
         1.0 / ((e.lon - s.sx) * (e.lon - s.sx) + (e.lat - s.sy) * (e.lat - s.sy) + {hotspot.IDW_SOFT!r}) AS w
  FROM evv e JOIN sites s
  ON e.lon >= s.sx - {hotspot.IDW_RADIUS!r} AND e.lon <= s.sx + {hotspot.IDW_RADIUS!r}
  WHERE (e.lon - s.sx) * (e.lon - s.sx) + (e.lat - s.sy) * (e.lat - s.sy)
        <= {hotspot.IDW_RADIUS * hotspot.IDW_RADIUS!r})
SELECT cx, cy, count(*) AS n_events,
       CAST(sum(CAST(floor(w * {hotspot.IDW_FP!r} + 0.5) AS BIGINT)) AS BIGINT) AS sum_w_fp,
       CAST(sum(CAST(floor(w * value * {hotspot.IDW_FP!r} + 0.5) AS BIGINT)) AS BIGINT) AS sum_wv_fp
FROM pw GROUP BY cx, cy""",
        "segment_cell_lengths": f"""
WITH {_epts},
seq AS (
  SELECT user_id, lon, lat,
         lag(lon) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS plon,
         lag(lat) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS plat
  FROM epts),
seg AS (
  SELECT plon AS x0, plat AS y0, lon - plon AS dx, lat - plat AS dy,
         sqrt((lon - plon) * (lon - plon) + (lat - plat) * (lat - plat)) AS seglen
  FROM seq WHERE plon IS NOT NULL AND NOT (lon = plon AND lat = plat)),
cellgrid AS (
  SELECT i.i AS cx, j.j AS cy,
         {fixtures.LON_MIN!r} + i.i * {raster.COVERAGE_EPS!r} AS c0x,
         {fixtures.LON_MIN!r} + (i.i + 1) * {raster.COVERAGE_EPS!r} AS c1x,
         {fixtures.LAT_MIN!r} + j.j * {raster.COVERAGE_EPS!r} AS c0y,
         {fixtures.LAT_MIN!r} + (j.j + 1) * {raster.COVERAGE_EPS!r} AS c1y
  FROM generate_series(0, {hotspot.GI_GX - 1}) AS i(i)
  CROSS JOIN generate_series(0, {hotspot.GI_GY - 1}) AS j(j)),
tint AS (
  SELECT cx, cy, seglen,
         greatest(0.0, greatest(
           CASE WHEN dx > 0 THEN (c0x - x0) / dx WHEN dx < 0 THEN (c1x - x0) / dx
                WHEN x0 >= c0x AND x0 < c1x THEN 0.0 ELSE 1.0 END,
           CASE WHEN dy > 0 THEN (c0y - y0) / dy WHEN dy < 0 THEN (c1y - y0) / dy
                WHEN y0 >= c0y AND y0 < c1y THEN 0.0 ELSE 1.0 END)) AS tlo,
         least(1.0, least(
           CASE WHEN dx > 0 THEN (c1x - x0) / dx WHEN dx < 0 THEN (c0x - x0) / dx
                WHEN x0 >= c0x AND x0 < c1x THEN 1.0 ELSE 0.0 END,
           CASE WHEN dy > 0 THEN (c1y - y0) / dy WHEN dy < 0 THEN (c0y - y0) / dy
                WHEN y0 >= c0y AND y0 < c1y THEN 1.0 ELSE 0.0 END)) AS thi
  FROM seg CROSS JOIN cellgrid),
fpl AS (
  SELECT cx, cy, tlo, thi,
         CAST(floor((thi - tlo) * seglen * {raster.SEGLEN_FP!r} + 0.5) AS BIGINT) AS f
  FROM tint)
SELECT cx, cy, count(*) AS n_segments, CAST(sum(f) AS BIGINT) AS len_fp
FROM fpl WHERE thi > tlo AND f > 0 GROUP BY cx, cy""",
        "areal_interpolation": f"""
WITH cellgrid AS (
  SELECT i.i AS cx, j.j AS cy,
         {fixtures.LON_MIN!r} + i.i * {raster.COVERAGE_EPS!r} AS clon0,
         {fixtures.LON_MIN!r} + (i.i + 1) * {raster.COVERAGE_EPS!r} AS clon1,
         {fixtures.LAT_MIN!r} + j.j * {raster.COVERAGE_EPS!r} AS clat0,
         {fixtures.LAT_MIN!r} + (j.j + 1) * {raster.COVERAGE_EPS!r} AS clat1
  FROM generate_series(0, {hotspot.GI_GX - 1}) AS i(i)
  CROSS JOIN generate_series(0, {hotspot.GI_GY - 1}) AS j(j)),
fp AS (
  SELECT b.rel_id, b.name, b.admin_level, g.cx, g.cy,
         CAST(floor(greatest(0.0, least(b.lon_max, g.clon1) - greatest(b.lon_min, g.clon0))
                    * greatest(0.0, least(b.lat_max, g.clat1) - greatest(b.lat_min, g.clat0)) * 1e9 + 0.5) AS BIGINT) AS area_fp
  FROM {oracle.sql_admin_rects_values()} CROSS JOIN cellgrid g),
ec AS (
  SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {raster.COVERAGE_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {raster.COVERAGE_EPS!r}) AS BIGINT) AS cy
  FROM events),
cc AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n FROM ec GROUP BY 1, 2)
SELECT fp.rel_id, fp.name, fp.admin_level,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(cc.n * fp.area_fp) AS BIGINT) AS est_num_fp,
       round(CAST(sum(cc.n * fp.area_fp) AS DOUBLE) / floor({raster.COVERAGE_EPS * raster.COVERAGE_EPS!r} * 1e9 + 0.5), 6) AS est
FROM fp JOIN cc USING (cx, cy)
WHERE fp.area_fp > 0
GROUP BY 1, 2, 3""",
        "cell_coverage_weights": f"""
WITH cellgrid AS (
  SELECT i.i AS cx, j.j AS cy,
         {fixtures.LON_MIN!r} + i.i * {raster.COVERAGE_EPS!r} AS clon0,
         {fixtures.LON_MIN!r} + (i.i + 1) * {raster.COVERAGE_EPS!r} AS clon1,
         {fixtures.LAT_MIN!r} + j.j * {raster.COVERAGE_EPS!r} AS clat0,
         {fixtures.LAT_MIN!r} + (j.j + 1) * {raster.COVERAGE_EPS!r} AS clat1
  FROM generate_series(0, {hotspot.GI_GX - 1}) AS i(i)
  CROSS JOIN generate_series(0, {hotspot.GI_GY - 1}) AS j(j)),
ia AS (
  SELECT b.rel_id, b.name, b.admin_level, g.cx, g.cy,
         greatest(0.0, least(b.lon_max, g.clon1) - greatest(b.lon_min, g.clon0))
         * greatest(0.0, least(b.lat_max, g.clat1) - greatest(b.lat_min, g.clat0)) AS area
  FROM {rects} CROSS JOIN cellgrid g),
fp AS (
  SELECT rel_id, name, admin_level, cx, cy,
         CAST(floor(area * 1e9 + 0.5) AS BIGINT) AS area_fp FROM ia)
SELECT * FROM fp WHERE area_fp > 0""",
        "home_cells": f"""
WITH uc AS (
  SELECT user_id,
         CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {trajectory.COTRAVEL_PITCH!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {trajectory.COTRAVEL_PITCH!r}) AS BIGINT) AS cy
  FROM events),
c AS (SELECT user_id, cx, cy, CAST(count(*) AS BIGINT) AS n FROM uc GROUP BY 1, 2, 3),
t AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS n_total FROM c GROUP BY 1),
r AS (SELECT user_id, cx, cy, n,
             row_number() OVER (PARTITION BY user_id ORDER BY n DESC, cx, cy) AS rk FROM c)
SELECT r.user_id, r.cx, r.cy, r.n AS n_pings, t.n_total,
       round(CAST(r.n AS DOUBLE) / t.n_total, 6) AS share
FROM r JOIN t USING (user_id) WHERE rk = 1""",
        "cotravel_pairs": f"""
WITH slots AS (
  SELECT DISTINCT user_id,
         CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {trajectory.COTRAVEL_PITCH!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {trajectory.COTRAVEL_PITCH!r}) AS BIGINT) AS cy,
         CAST(floor(epoch_us(ts) / {trajectory.DAY_US if hasattr(trajectory, 'DAY_US') else 86_400_000_000}) AS BIGINT) AS day
  FROM events)
SELECT a.user_id AS user_a, b.user_id AS user_b, CAST(count(*) AS BIGINT) AS n_shared
FROM slots a JOIN slots b USING (cx, cy, day)
WHERE a.user_id < b.user_id
GROUP BY 1, 2 HAVING count(*) >= {trajectory.COTRAVEL_MIN_SHARED}
ORDER BY 1, 2""",
        "path_crossings": f"""
WITH {_epts},
seg AS (
  SELECT user_id, event_id AS seg_id, lon AS x1, lat AS y1,
         lead(lon) OVER w AS x2, lead(lat) OVER w AS y2
  FROM epts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT * FROM seg
      WHERE x2 IS NOT NULL
        AND sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) < {trajectory.CROSS_MAX_SEG!r}),
x AS (SELECT a.user_id AS ua, b.user_id AS ub
      FROM s a JOIN s b ON a.seg_id < b.seg_id AND a.user_id <> b.user_id
      WHERE ((b.x1 - a.x1) * (a.y2 - a.y1) - (b.y1 - a.y1) * (a.x2 - a.x1))
            * ((b.x2 - a.x1) * (a.y2 - a.y1) - (b.y2 - a.y1) * (a.x2 - a.x1)) < 0
        AND ((a.x1 - b.x1) * (b.y2 - b.y1) - (a.y1 - b.y1) * (b.x2 - b.x1))
            * ((a.x2 - b.x1) * (b.y2 - b.y1) - (a.y2 - b.y1) * (b.x2 - b.x1)) < 0)
SELECT least(ua, ub) AS user_a, greatest(ua, ub) AS user_b, count(*) AS n_crossings
FROM x GROUP BY 1, 2""",
        "zone_modularity": f"""
WITH {_epts},
sc AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id,
         CAST(floor((lon - {fixtures.LON_MIN!r}) / {trajectory.MODULARITY_PITCH!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {trajectory.MODULARITY_PITCH!r}) AS BIGINT) AS cy
  FROM epts),
st AS (
  SELECT cx, cy,
         lag(cx) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS px,
         lag(cy) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS py
  FROM sc),
tr AS (SELECT px AS fx, py AS fy, cx AS tx, cy AS ty, CAST(count(*) AS BIGINT) AS n
       FROM st WHERE px IS NOT NULL GROUP BY 1, 2, 3, 4),
cells AS (SELECT fx AS cx, fy AS cy FROM tr UNION SELECT tx, ty FROM tr),
zc AS (
  SELECT c.cx, c.cy, coalesce(max(b.rel_id), -1) AS zid
  FROM cells c LEFT JOIN {oracle.sql_admin_rects_values(admin_level=8)}
    ON {fixtures.LON_MIN!r} + (c.cx + 0.5) * {trajectory.MODULARITY_PITCH!r} >= b.lon_min
   AND {fixtures.LON_MIN!r} + (c.cx + 0.5) * {trajectory.MODULARITY_PITCH!r} < b.lon_max
   AND {fixtures.LAT_MIN!r} + (c.cy + 0.5) * {trajectory.MODULARITY_PITCH!r} >= b.lat_min
   AND {fixtures.LAT_MIN!r} + (c.cy + 0.5) * {trajectory.MODULARITY_PITCH!r} < b.lat_max
  GROUP BY 1, 2),
e AS (SELECT a.zid AS zf, bb.zid AS zt, tr.n
      FROM tr JOIN zc a ON a.cx = tr.fx AND a.cy = tr.fy
              JOIN zc bb ON bb.cx = tr.tx AND bb.cy = tr.ty),
m AS (SELECT CAST(sum(n) AS DOUBLE) AS mt FROM e),
z AS (SELECT zid FROM zc GROUP BY 1),
per AS (
  SELECT z.zid,
         CAST(coalesce(sum(CASE WHEN e.zf = z.zid AND e.zt = z.zid THEN e.n END), 0) AS BIGINT) AS n_within,
         CAST(coalesce(sum(CASE WHEN e.zf = z.zid THEN e.n END), 0) AS BIGINT) AS w_out,
         CAST(coalesce(sum(CASE WHEN e.zt = z.zid THEN e.n END), 0) AS BIGINT) AS w_in
  FROM z CROSS JOIN e GROUP BY 1)
SELECT zid AS rel_id, n_within, w_out, w_in,
       round(CAST(n_within AS DOUBLE) / m.mt
             - (CAST(w_out AS DOUBLE) / m.mt) * (CAST(w_in AS DOUBLE) / m.mt), 6) AS q_term
FROM per CROSS JOIN m""",
        "degree_assortativity": f"""
WITH {_epts},
sc0 AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id,
         CAST(floor((lon - {fixtures.LON_MIN!r}) / {trajectory.LP_PITCH!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {trajectory.LP_PITCH!r}) AS BIGINT) AS cy
  FROM epts),
st AS (
  SELECT cx, cy,
         lag(cx) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS px,
         lag(cy) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS py
  FROM sc0),
e0 AS (
  SELECT DISTINCT least(px * 2097152 + py, cx * 2097152 + cy) AS a,
                  greatest(px * 2097152 + py, cx * 2097152 + cy) AS b
  FROM st WHERE px IS NOT NULL AND (px != cx OR py != cy)),
sym AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b AS u, a AS v FROM e0),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY u),
j AS (SELECT du.deg AS x, dv.deg AS y FROM sym
      JOIN deg du ON du.u = sym.u JOIN deg dv ON dv.u = sym.v),
s AS (SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy
      FROM j)
SELECT CAST(m // 2 AS BIGINT) AS n_edges,
       round(CAST(m*sxy - sx*sy AS DOUBLE)
             / (sqrt(CAST(m*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(m*syy - sy*sy AS DOUBLE))), 6) AS r
FROM s""",
        "link_prediction": f"""
WITH {_epts},
sc0 AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id,
         CAST(floor((lon - {fixtures.LON_MIN!r}) / {trajectory.LP_PITCH!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {trajectory.LP_PITCH!r}) AS BIGINT) AS cy
  FROM epts),
st AS (
  SELECT cx, cy,
         lag(cx) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS px,
         lag(cy) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS py
  FROM sc0),
e0 AS (
  SELECT DISTINCT least(px * 2097152 + py, cx * 2097152 + cy) AS a,
                  greatest(px * 2097152 + py, cx * 2097152 + cy) AS b
  FROM st WHERE px IS NOT NULL AND (px != cx OR py != cy)),
sym AS (SELECT a AS z, b AS nb FROM e0 UNION ALL SELECT b AS z, a AS nb FROM e0),
deg AS (SELECT z, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY z),
w AS (SELECT z, CAST(floor({trajectory.LP_FP!r} / ln(CAST(deg AS DOUBLE)) + 0.5) AS BIGINT) AS w_fp
      FROM deg WHERE deg >= 2),
wdg AS (SELECT l.nb AS na, r.nb AS nb2, l.z AS z FROM sym l JOIN sym r ON l.z = r.z WHERE l.nb < r.nb),
opn AS (SELECT w2.na, w2.nb2, w2.z FROM wdg w2
        LEFT JOIN e0 e ON e.a = w2.na AND e.b = w2.nb2 WHERE e.a IS NULL),
scr AS (SELECT na, nb2, CAST(count(*) AS BIGINT) AS cn, CAST(sum(w_fp) AS BIGINT) AS aa_fp
        FROM opn JOIN w USING (z) GROUP BY 1, 2),
u AS (SELECT na // 2097152 AS ax, na % 2097152 AS ay, nb2 // 2097152 AS bx, nb2 % 2097152 AS by,
             cn, aa_fp FROM scr),
r AS (SELECT *, row_number() OVER (ORDER BY aa_fp DESC, ax, ay, bx, by) AS lp_rank FROM u)
SELECT lp_rank, ax, ay, bx, by, cn, aa_fp FROM r WHERE lp_rank <= {trajectory.LP_TOPK!r}""",
        "cell_transition_matrix": f"""
WITH {_epts},
sc AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id,
         CAST(floor((lon - {fixtures.LON_MIN!r}) / {trajectory.TRANS_PITCH!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {trajectory.TRANS_PITCH!r}) AS BIGINT) AS cy
  FROM epts),
st AS (
  SELECT cx, cy,
         lag(cx) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS px,
         lag(cy) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS py
  FROM sc)
SELECT px AS fx, py AS fy, cx AS tx, cy AS ty, count(*) AS n_steps
FROM st WHERE px IS NOT NULL GROUP BY 1, 2, 3, 4""",
        "radius_of_gyration": f"""
WITH {_epts},
fx AS (
  SELECT user_id, lon, lat,
         CAST(floor((lon - {fixtures.LON_MIN!r}) * {trajectory.ROG_FP!r} + 0.5) AS BIGINT) AS fxl,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) * {trajectory.ROG_FP!r} + 0.5) AS BIGINT) AS fyl
  FROM epts),
cent AS (
  SELECT user_id, count(*) AS n, CAST(sum(fxl) AS BIGINT) AS sx, CAST(sum(fyl) AS BIGINT) AS sy
  FROM fx GROUP BY user_id),
j AS (
  SELECT f.user_id, f.lon, f.lat,
         {fixtures.LON_MIN!r} + CAST(c.sx AS DOUBLE) / {trajectory.ROG_FP!r} / c.n AS mlon,
         {fixtures.LAT_MIN!r} + CAST(c.sy AS DOUBLE) / {trajectory.ROG_FP!r} / c.n AS mlat
  FROM fx f JOIN cent c USING (user_id)),
d AS (
  SELECT user_id,
         CAST(floor(((lon - mlon) * (lon - mlon) + (lat - mlat) * (lat - mlat)) * {trajectory.ROG_FP!r} + 0.5) AS BIGINT) AS d2fp
  FROM j)
SELECT user_id, count(*) AS n_events, CAST(sum(d2fp) AS BIGINT) AS sum_d2_fp,
       round(sqrt(CAST(sum(d2fp) AS DOUBLE) / {trajectory.ROG_FP!r} / count(*)), 6) AS rog
FROM d GROUP BY user_id""",
        "route_conformance": f"""
WITH {_epts},
rpath(vx, vy) AS (VALUES {', '.join(f'({x!r}, {y!r})' for x, y in trajectory.ROUTE_PATH)}),
md AS (
  SELECT event_id, user_id,
         min((lon - vx) * (lon - vx) + (lat - vy) * (lat - vy)) AS d2
  FROM epts CROSS JOIN rpath GROUP BY event_id, user_id),
fp AS (SELECT user_id, CAST(floor(sqrt(d2) * {trajectory.FP_SCALE!r} + 0.5) AS BIGINT) AS dev FROM md)
SELECT user_id, count(*) AS n_events, max(dev) AS max_dev_fp, CAST(sum(dev) AS BIGINT) AS sum_dev_fp
FROM fp GROUP BY user_id""",
        "getis_ord_hotspots": f"""
WITH {_epts},
gcells AS (
  SELECT CAST(floor((lon - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy
  FROM epts),
counts AS (SELECT cx, cy, count(*) AS n FROM gcells GROUP BY cx, cy),
gmom AS (SELECT CAST(sum(n) AS DOUBLE) AS tot, CAST(sum(n * n) AS DOUBLE) AS ssq FROM counts),
offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
scat AS (
  SELECT cx + dx AS cx, cy + dy AS cy, n FROM counts, offs
  WHERE cx + dx BETWEEN 0 AND {hotspot.GI_GX - 1} AND cy + dy BETWEEN 0 AND {hotspot.GI_GY - 1}),
nbr AS (SELECT cx, cy, CAST(sum(n) AS BIGINT) AS nbr_sum FROM scat GROUP BY cx, cy),
wct AS (
  SELECT cx, cy, nbr_sum,
         (least(cx + 1, {hotspot.GI_GX - 1}) - greatest(cx - 1, 0) + 1)
         * (least(cy + 1, {hotspot.GI_GY - 1}) - greatest(cy - 1, 0) + 1) AS w
  FROM nbr)
SELECT cx, cy, nbr_sum, w,
       round((CAST(nbr_sum AS DOUBLE) - (tot / {float(hotspot.GI_NCELLS)!r}) * CAST(w AS DOUBLE))
             / (sqrt(ssq / {float(hotspot.GI_NCELLS)!r}
                     - (tot / {float(hotspot.GI_NCELLS)!r}) * (tot / {float(hotspot.GI_NCELLS)!r}))
                * sqrt(({float(hotspot.GI_NCELLS)!r} * CAST(w AS DOUBLE) - CAST(w AS DOUBLE) * CAST(w AS DOUBLE))
                       / {float(hotspot.GI_NCELLS - 1)!r})), 6) AS gi_z
FROM wct, gmom""",
        "local_moran": f"""
WITH {_epts},
gcells AS (
  SELECT CAST(floor((lon - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy
  FROM epts),
counts AS (SELECT cx, cy, count(*) AS n FROM gcells GROUP BY cx, cy),
gmom AS (SELECT CAST(sum(n) AS DOUBLE) AS tot, CAST(sum(n * n) AS DOUBLE) AS ssq FROM counts),
offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
scat AS (
  SELECT cx + dx AS cx, cy + dy AS cy,
         CASE WHEN dx = 0 AND dy = 0 THEN n ELSE 0 END AS n_own,
         CASE WHEN dx = 0 AND dy = 0 THEN 0 ELSE n END AS n_nbr
  FROM counts, offs
  WHERE cx + dx BETWEEN 0 AND {hotspot.GI_GX - 1} AND cy + dy BETWEEN 0 AND {hotspot.GI_GY - 1}),
mrg AS (SELECT cx, cy, CAST(sum(n_own) AS BIGINT) AS n_own, CAST(sum(n_nbr) AS BIGINT) AS nbr_sum
        FROM scat GROUP BY cx, cy),
expr AS (
  SELECT cx, cy, n_own, nbr_sum,
         (least(cx + 1, {hotspot.GI_GX - 1}) - greatest(cx - 1, 0) + 1)
         * (least(cy + 1, {hotspot.GI_GY - 1}) - greatest(cy - 1, 0) + 1) - 1 AS w,
         CAST(n_own AS DOUBLE) - (tot / {float(hotspot.GI_NCELLS)!r}) AS z,
         ssq / {float(hotspot.GI_NCELLS)!r}
           - (tot / {float(hotspot.GI_NCELLS)!r}) * (tot / {float(hotspot.GI_NCELLS)!r}) AS m2
  FROM mrg, gmom),
lagd AS (
  SELECT cx, cy, n_own, nbr_sum, w, z, m2,
         CAST(nbr_sum AS DOUBLE) - (tot / {float(hotspot.GI_NCELLS)!r}) * CAST(w AS DOUBLE) AS lag
  FROM expr, gmom)
SELECT cx, cy, n_own, nbr_sum, w,
       round(z * lag / m2, 6) AS moran_i,
       CASE WHEN z >= 0 AND lag >= 0 THEN 'HH'
            WHEN z >= 0 THEN 'HL'
            WHEN lag >= 0 THEN 'LH'
            ELSE 'LL' END AS quad
FROM lagd""",
        "occupancy_kcore": f"SELECT * FROM read_parquet('{golden.occupancy_kcore_path(SF001)}')",
        # mirrors hotspot.quadrat_chi2: integer moments over occupied
        # cells, closed-form N, two mirrored float expressions
        "quadrat_chi2": f"""
WITH {_epts},
gcells AS (
  SELECT CAST(floor((lon - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy
  FROM epts),
counts AS (SELECT cx, cy, count(*) AS n FROM gcells GROUP BY cx, cy),
mom AS (SELECT CAST(sum(n) AS BIGINT) AS tot, CAST(sum(n * n) AS BIGINT) AS ssq FROM counts),
m AS (SELECT tot, ssq, CAST(tot AS DOUBLE) / {float(hotspot.GI_NCELLS)!r} AS mean FROM mom)
SELECT {hotspot.GI_NCELLS} AS n_quadrats, tot AS n_events, ssq,
       round((CAST(ssq AS DOUBLE) - CAST(tot AS DOUBLE) * mean) / mean, 6) AS chi2,
       round((CAST(ssq AS DOUBLE) / {float(hotspot.GI_NCELLS)!r} - mean * mean) / mean, 6) AS vmr
FROM m""",
        # mirrors hotspot.global_moran: integer partials (occupied cells
        # only), closed-form lattice constants N / W, ONE float expression
        # in the engine's exact association
        "global_moran": f"""
WITH {_epts},
gcells AS (
  SELECT CAST(floor((lon - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy
  FROM epts),
counts AS (SELECT cx, cy, count(*) AS n FROM gcells GROUP BY cx, cy),
offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
scat AS (
  SELECT cx + dx AS cx, cy + dy AS cy,
         CASE WHEN dx = 0 AND dy = 0 THEN n ELSE 0 END AS n_own,
         CASE WHEN dx = 0 AND dy = 0 THEN 0 ELSE n END AS n_nbr
  FROM counts, offs
  WHERE cx + dx BETWEEN 0 AND {hotspot.GI_GX - 1} AND cy + dy BETWEEN 0 AND {hotspot.GI_GY - 1}),
mrg AS (SELECT cx, cy, CAST(sum(n_own) AS BIGINT) AS n_own, CAST(sum(n_nbr) AS BIGINT) AS nbr_sum
        FROM scat GROUP BY cx, cy),
part AS (
  SELECT CAST(sum(CASE WHEN n_own > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_occupied,
         CAST(sum(n_own) AS BIGINT) AS s1,
         CAST(sum(n_own * n_own) AS BIGINT) AS s2,
         CAST(sum(n_own * nbr_sum) AS BIGINT) AS s_cross,
         CAST(sum(((least(cx + 1, {hotspot.GI_GX - 1}) - greatest(cx - 1, 0) + 1)
                   * (least(cy + 1, {hotspot.GI_GY - 1}) - greatest(cy - 1, 0) + 1) - 1) * n_own) AS BIGINT) AS s_wrow
  FROM mrg),
m AS (SELECT *, CAST(s1 AS DOUBLE) / {float(hotspot.GI_NCELLS)!r} AS mean FROM part)
SELECT n_occupied, s1, s2, s_cross, s_wrow,
       round(({float(hotspot.GI_NCELLS)!r} / {float(hotspot.MORAN_W)!r})
             * (CAST(s_cross AS DOUBLE) - 2.0 * mean * CAST(s_wrow AS DOUBLE)
                + mean * mean * {float(hotspot.MORAN_W)!r})
             / (CAST(s2 AS DOUBLE) - {float(hotspot.GI_NCELLS)!r} * mean * mean), 6) AS moran_i
FROM m""",
        # mirrors hotspot.radiation_model: strict-< intervening mass,
        # endpoints excluded, T_i = m_i
        "radiation_model": f"""
WITH {_epts},
gcells AS (
  SELECT CAST(floor((lon - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy
  FROM epts),
counts AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n FROM gcells GROUP BY 1, 2),
org AS (SELECT cx AS ocx, cy AS ocy, n AS m_o FROM counts
        ORDER BY n DESC, cx, cy LIMIT {hotspot.RADIATION_TOP_K}),
pr AS (
  SELECT o.ocx, o.ocy, d.cx AS dcx, d.cy AS dcy, o.m_o, d.n AS m_d,
         (d.cx - o.ocx) * (d.cx - o.ocx) + (d.cy - o.ocy) * (d.cy - o.ocy) AS d2
  FROM org o JOIN counts d ON NOT (d.cx = o.ocx AND d.cy = o.ocy)),
sij AS (
  SELECT p.*, (SELECT coalesce(sum(c.n), 0) FROM counts c
               WHERE (c.cx - p.ocx) * (c.cx - p.ocx) + (c.cy - p.ocy) * (c.cy - p.ocy) < p.d2)
              - p.m_o AS s_ij
  FROM pr p)
SELECT ocx, ocy, dcx, dcy, m_o, m_d, CAST(s_ij AS BIGINT) AS s_ij,
       round((CAST(m_o AS DOUBLE) * (CAST(m_o AS DOUBLE) * CAST(m_d AS DOUBLE)))
             / ((CAST(m_o AS DOUBLE) + CAST(s_ij AS DOUBLE))
                * (CAST(m_o AS DOUBLE) + CAST(m_d AS DOUBLE) + CAST(s_ij AS DOUBLE))), 6) AS flux
FROM sij""",
        # mirrors hotspot.occupancy_closing: dilate votes, erode by
        # full-window vote counts
        "occupancy_closing": f"""
WITH {_epts},
occ AS (
  SELECT DISTINCT CAST(floor((lon - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
                  CAST(floor((lat - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy
  FROM epts),
offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
dil AS (
  SELECT DISTINCT cx + dx AS cx, cy + dy AS cy FROM occ, offs
  WHERE cx + dx BETWEEN 0 AND {hotspot.GI_GX - 1} AND cy + dy BETWEEN 0 AND {hotspot.GI_GY - 1}),
votes AS (
  SELECT cx + dx AS cx, cy + dy AS cy, CAST(count(*) AS BIGINT) AS n FROM dil, offs
  WHERE cx + dx BETWEEN 0 AND {hotspot.GI_GX - 1} AND cy + dy BETWEEN 0 AND {hotspot.GI_GY - 1}
  GROUP BY 1, 2),
cl AS (
  SELECT CAST(count(*) AS BIGINT) AS n_closed FROM votes
  WHERE n = (least(cx + 1, {hotspot.GI_GX - 1}) - greatest(cx - 1, 0) + 1)
            * (least(cy + 1, {hotspot.GI_GY - 1}) - greatest(cy - 1, 0) + 1))
SELECT (SELECT CAST(count(*) AS BIGINT) FROM occ) AS n_occupied,
       (SELECT CAST(count(*) AS BIGINT) FROM dil) AS n_dilated,
       cl.n_closed,
       cl.n_closed - (SELECT CAST(count(*) AS BIGINT) FROM occ) AS n_filled
FROM cl""",
        # mirrors hotspot.geary_c: same scatter, squared-difference form
        # via 2(Sw2 - Sc)
        "geary_c": f"""
WITH {_epts},
gcells AS (
  SELECT CAST(floor((lon - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy
  FROM epts),
counts AS (SELECT cx, cy, count(*) AS n FROM gcells GROUP BY cx, cy),
offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
scat AS (
  SELECT cx + dx AS cx, cy + dy AS cy,
         CASE WHEN dx = 0 AND dy = 0 THEN n ELSE 0 END AS n_own,
         CASE WHEN dx = 0 AND dy = 0 THEN 0 ELSE n END AS n_nbr
  FROM counts, offs
  WHERE cx + dx BETWEEN 0 AND {hotspot.GI_GX - 1} AND cy + dy BETWEEN 0 AND {hotspot.GI_GY - 1}),
mrg AS (SELECT cx, cy, CAST(sum(n_own) AS BIGINT) AS n_own, CAST(sum(n_nbr) AS BIGINT) AS nbr_sum
        FROM scat GROUP BY cx, cy),
part AS (
  SELECT CAST(sum(CASE WHEN n_own > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_occupied,
         CAST(sum(n_own) AS BIGINT) AS s1,
         CAST(sum(n_own * n_own) AS BIGINT) AS s2,
         CAST(sum(n_own * nbr_sum) AS BIGINT) AS s_cross,
         CAST(sum(((least(cx + 1, {hotspot.GI_GX - 1}) - greatest(cx - 1, 0) + 1)
                   * (least(cy + 1, {hotspot.GI_GY - 1}) - greatest(cy - 1, 0) + 1) - 1)
                  * n_own * n_own) AS BIGINT) AS s_w2
  FROM mrg),
m AS (SELECT *, CAST(s1 AS DOUBLE) / {float(hotspot.GI_NCELLS)!r} AS mean FROM part)
SELECT n_occupied, s2, s_cross, s_w2,
       round(({float(hotspot.GI_NCELLS - 1)!r} / {float(2 * hotspot.MORAN_W)!r})
             * (2.0 * (CAST(s_w2 AS DOUBLE) - CAST(s_cross AS DOUBLE)))
             / (CAST(s2 AS DOUBLE) - {float(hotspot.GI_NCELLS)!r} * mean * mean), 6) AS geary_c
FROM m""",
        # mirrors hotspot.cell_adjacency_triangles: 3-cliques of the
        # occupied-lattice queen-adjacency graph via the canonical
        # (a<b<c) three-edge join; wedges from degrees
        "cell_adjacency_triangles": f"""
WITH {_epts},
gcells AS (
  SELECT CAST(floor((lon - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy
  FROM epts),
occ AS (SELECT cx, cy, cx * {hotspot.GI_GY} + cy AS k FROM gcells GROUP BY cx, cy),
offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)),
edges AS (
  SELECT a.k AS ka, b.k AS kb
  FROM occ a JOIN offs o ON true
  JOIN occ b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
  WHERE b.k > a.k),
deg AS (
  SELECT k, count(*) AS d
  FROM (SELECT ka AS k FROM edges UNION ALL SELECT kb AS k FROM edges)
  GROUP BY k),
sc AS (
  SELECT (SELECT count(*) FROM occ) AS n_vertices,
         (SELECT count(*) FROM edges) AS n_edges,
         (SELECT coalesce(CAST(sum(d * (d - 1) // 2) AS BIGINT), 0) FROM deg) AS n_wedges,
         (SELECT count(*) FROM edges e1
            JOIN edges e2 ON e2.ka = e1.ka AND e2.kb > e1.kb
            JOIN edges e3 ON e3.ka = e1.kb AND e3.kb = e2.kb) AS n_triangles)
SELECT n_vertices, n_edges, n_wedges, n_triangles,
       round(CASE WHEN n_wedges > 0 THEN 3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE) ELSE 0.0 END, 6) AS transitivity
FROM sc""",
        # mirrors trajectory.turn_histogram: kept-segment octant stream
        # per user (zero-move steps dropped), LAG over the stream, turn
        # = octant difference mod 8
        "turn_histogram": f"""
WITH {_epts},
seq AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus, lon, lat,
         lag(lon) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS plon,
         lag(lat) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS plat
  FROM epts),
seg AS (
  SELECT user_id, tus, event_id,
         CASE
           WHEN lon - plon >= 0 AND lat - plat >= 0 AND abs(lon - plon) >= abs(lat - plat) THEN 0
           WHEN lon - plon >= 0 AND lat - plat >= 0 THEN 1
           WHEN lon - plon < 0 AND lat - plat >= 0 AND abs(lat - plat) > abs(lon - plon) THEN 2
           WHEN lon - plon < 0 AND lat - plat >= 0 THEN 3
           WHEN lon - plon < 0 AND lat - plat < 0 AND abs(lon - plon) >= abs(lat - plat) THEN 4
           WHEN lon - plon < 0 AND lat - plat < 0 THEN 5
           WHEN lon - plon >= 0 AND lat - plat < 0 AND abs(lat - plat) > abs(lon - plon) THEN 6
           ELSE 7
         END AS oct
  FROM seq
  WHERE plon IS NOT NULL AND NOT (lon = plon AND lat = plat)),
tr AS (
  SELECT user_id, oct,
         lag(oct) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS poct
  FROM seg)
SELECT user_id, (oct - poct + 8) % 8 AS turn, count(*) AS n_turns
FROM tr WHERE poct IS NOT NULL GROUP BY 1, 2""",
        # min(floor(x)) == floor(min(x)) for monotone floor, so the
        # per-batch quantize-then-min order matches this global form
        "distance_raster": f"""
WITH evv AS (
  SELECT {oracle.sql_derive_lon('event_id')} AS lon, {oracle.sql_derive_lat('event_id')} AS lat
  FROM events),
sites AS (
  SELECT i.i AS cx, j.j AS cy,
         {fixtures.LON_MIN!r} + (i.i + 0.5) * {hotspot.GI_EPS!r} AS sx,
         {fixtures.LAT_MIN!r} + (j.j + 0.5) * {hotspot.GI_EPS!r} AS sy
  FROM generate_series(0, {hotspot.GI_GX - 1}) AS i(i)
  CROSS JOIN generate_series(0, {hotspot.GI_GY - 1}) AS j(j))
SELECT s.cx, s.cy,
       min(CAST(floor(((e.lon - s.sx) * (e.lon - s.sx) + (e.lat - s.sy) * (e.lat - s.sy))
                      * {hotspot.DIST_FP!r} + 0.5) AS BIGINT)) AS min_d2_fp
FROM sites s CROSS JOIN evv e GROUP BY s.cx, s.cy""",
        # lexicographic (d2_fp, event_id) min: join back to the per-site
        # min distance, then take the smallest id among the achievers
        "voronoi_assign": f"""
WITH evv AS (
  SELECT event_id, {oracle.sql_derive_lon('event_id')} AS lon, {oracle.sql_derive_lat('event_id')} AS lat
  FROM events),
sites AS (
  SELECT i.i AS cx, j.j AS cy,
         {fixtures.LON_MIN!r} + (i.i + 0.5) * {hotspot.GI_EPS!r} AS sx,
         {fixtures.LAT_MIN!r} + (j.j + 0.5) * {hotspot.GI_EPS!r} AS sy
  FROM generate_series(0, {hotspot.GI_GX - 1}) AS i(i)
  CROSS JOIN generate_series(0, {hotspot.GI_GY - 1}) AS j(j)),
d AS (
  SELECT s.cx, s.cy, e.event_id,
         CAST(floor(((e.lon - s.sx) * (e.lon - s.sx) + (e.lat - s.sy) * (e.lat - s.sy))
                    * {hotspot.DIST_FP!r} + 0.5) AS BIGINT) AS d2_fp
  FROM sites s CROSS JOIN evv e),
m AS (SELECT cx, cy, min(d2_fp) AS min_d2_fp FROM d GROUP BY cx, cy)
SELECT m.cx, m.cy, m.min_d2_fp, min(d.event_id) AS nn_event
FROM m JOIN d ON d.cx = m.cx AND d.cy = m.cy AND d.d2_fp = m.min_d2_fp
GROUP BY m.cx, m.cy, m.min_d2_fp""",
        "kde_density": f"""
WITH {_kde_cte}
SELECT cx, cy, n_events, sum_w_fp,
       round(CAST(sum_w_fp AS DOUBLE) / {hotspot.KDE_FP!r} * {hotspot.KDE_NORM!r}, 6) AS intensity
FROM sw""",
        # raster -> vector: an edge of cell r at level L exists iff
        # r >= L and its 4-neighbor (0 when off-lattice/empty) < L —
        # exact integer thresholds, mirrors hotspot.kde_contours
        "kde_contours": f"""
WITH {_kde_cte},
lv(lvl, l_fp) AS (VALUES {", ".join(f"({i}, {l})" for i, l in enumerate(hotspot.CONTOUR_LEVELS_FP))}),
sd(side, dx, dy) AS (VALUES (0, -1, 0), (1, 1, 0), (2, 0, -1), (3, 0, 1))
SELECT CAST(lv.lvl AS BIGINT) AS lvl, r.cx, r.cy, CAST(sd.side AS BIGINT) AS side
FROM sw r CROSS JOIN lv CROSS JOIN sd
LEFT JOIN sw n ON n.cx = r.cx + sd.dx AND n.cy = r.cy + sd.dy
WHERE r.sum_w_fp >= lv.l_fp AND coalesce(n.sum_w_fp, 0) < lv.l_fp""",
        "cross_k": f"""
WITH et AS (SELECT event_id, event_type, {oracle.sql_derive_lon('event_id')} AS lon,
                   {oracle.sql_derive_lat('event_id')} AS lat FROM events),
pr AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         (b.lon - a.lon) * (b.lon - a.lon) + (b.lat - a.lat) * (b.lat - a.lat) AS d2
  FROM et a JOIN et b
  ON a.event_id <> b.event_id
  AND b.lon >= a.lon - {max(hotspot.RIPLEY_RADII)!r} AND b.lon <= a.lon + {max(hotspot.RIPLEY_RADII)!r}
  AND b.lat >= a.lat - {max(hotspot.RIPLEY_RADII)!r} AND b.lat <= a.lat + {max(hotspot.RIPLEY_RADII)!r})
{' UNION ALL '.join(f"SELECT type_a, type_b, CAST({r!r} AS DOUBLE) AS r, count(*) AS n_pairs FROM pr WHERE d2 <= {r * r!r} GROUP BY type_a, type_b" for r in hotspot.RIPLEY_RADII)}""",
        "nearest_neighbor": f"""
WITH {_epts},
pr AS (
  SELECT a.event_id AS event_id, b.event_id AS nn_id,
         {_fp_sql('(b.lon - a.lon)', '(b.lat - a.lat)')} AS dist_fp,
         (b.lon - a.lon) * (b.lon - a.lon) + (b.lat - a.lat) * (b.lat - a.lat) AS d2
  FROM epts a JOIN epts b
  ON a.event_id <> b.event_id
  AND b.lon >= a.lon - {hotspot.NN_RADIUS!r} AND b.lon <= a.lon + {hotspot.NN_RADIUS!r}
  AND b.lat >= a.lat - {hotspot.NN_RADIUS!r} AND b.lat <= a.lat + {hotspot.NN_RADIUS!r}),
f AS (
  SELECT event_id, nn_id, dist_fp,
         row_number() OVER (PARTITION BY event_id ORDER BY dist_fp, nn_id) AS rn
  FROM pr WHERE d2 <= {hotspot.NN_RADIUS * hotspot.NN_RADIUS!r})
SELECT event_id, nn_id, dist_fp FROM f WHERE rn = 1""",
        "clark_evans": f"""
WITH {_epts},
pr AS (
  SELECT a.event_id AS event_id, b.event_id AS nn_id,
         {_fp_sql('(b.lon - a.lon)', '(b.lat - a.lat)')} AS dist_fp,
         (b.lon - a.lon) * (b.lon - a.lon) + (b.lat - a.lat) * (b.lat - a.lat) AS d2
  FROM epts a JOIN epts b
  ON a.event_id <> b.event_id
  AND b.lon >= a.lon - {hotspot.NN_RADIUS!r} AND b.lon <= a.lon + {hotspot.NN_RADIUS!r}
  AND b.lat >= a.lat - {hotspot.NN_RADIUS!r} AND b.lat <= a.lat + {hotspot.NN_RADIUS!r}),
f AS (
  SELECT event_id, dist_fp,
         row_number() OVER (PARTITION BY event_id ORDER BY dist_fp, nn_id) AS rn
  FROM pr WHERE d2 <= {hotspot.NN_RADIUS * hotspot.NN_RADIUS!r}),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nn, CAST(sum(dist_fp) AS BIGINT) AS sum_fp
       FROM f WHERE rn = 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM events)
SELECT n_total AS n_points, n_nn AS n_with_nn,
       round((CAST(sum_fp AS DOUBLE) / {trajectory.FP_SCALE!r})
             / greatest(CAST(n_nn AS DOUBLE), 1.0), 6) AS mean_nn_dist,
       round(0.5 / sqrt(CAST(n_total AS DOUBLE) / {fixtures.LON_SPAN * fixtures.LAT_SPAN!r}), 6)
           AS expected_nn_dist,
       round(((CAST(sum_fp AS DOUBLE) / {trajectory.FP_SCALE!r})
              / greatest(CAST(n_nn AS DOUBLE), 1.0))
             / (0.5 / sqrt(CAST(n_total AS DOUBLE) / {fixtures.LON_SPAN * fixtures.LAT_SPAN!r})), 6)
           AS clark_evans_r,
       round((((CAST(sum_fp AS DOUBLE) / {trajectory.FP_SCALE!r})
               / greatest(CAST(n_nn AS DOUBLE), 1.0))
              - 0.5 / sqrt(CAST(n_total AS DOUBLE) / {fixtures.LON_SPAN * fixtures.LAT_SPAN!r}))
             / (0.26136 / sqrt(CAST(n_total AS DOUBLE)
                               * (CAST(n_total AS DOUBLE) / {fixtures.LON_SPAN * fixtures.LAT_SPAN!r}))), 6)
           AS z_score
FROM nn CROSS JOIN tot""",
        "l_diversity": f"""
WITH tl AS (
  SELECT CAST({oracle.sql_tile_x(oracle.sql_derive_lon('doc_id'), privacy.LDIV_Z)} AS BIGINT) AS x,
         CAST({oracle.sql_tile_y(oracle.sql_derive_lat('doc_id'), privacy.LDIV_Z)} AS BIGINT) AS y,
         lang
  FROM documents)
SELECT x, y, CAST(count(*) AS BIGINT) AS n_points,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(DISTINCT lang) >= {privacy.LDIV_L} AS BIGINT) AS meets_l
FROM tl GROUP BY 1, 2""",
        "t_closeness": f"""
WITH tl AS (
  SELECT CAST({oracle.sql_tile_x(oracle.sql_derive_lon('doc_id'), privacy.TCLOSE_Z)} AS BIGINT) AS x,
         CAST({oracle.sql_tile_y(oracle.sql_derive_lat('doc_id'), privacy.TCLOSE_Z)} AS BIGINT) AS y,
         lang
  FROM documents),
c AS (SELECT x, y, lang, CAST(count(*) AS BIGINT) AS n FROM tl GROUP BY 1, 2, 3),
g AS (SELECT lang, CAST(count(*) AS BIGINT) AS gn FROM tl GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS gt FROM tl),
nt AS (SELECT x, y, CAST(sum(n) AS BIGINT) AS n_points FROM c GROUP BY 1, 2),
xp AS (
  SELECT nt.x, nt.y, nt.n_points, g.gn, coalesce(c.n, 0) AS n
  FROM nt CROSS JOIN g
  LEFT JOIN c ON c.x = nt.x AND c.y = nt.y AND c.lang = g.lang),
s AS (
  SELECT x, y, n_points,
         0.5 * sum(abs(CAST(n AS DOUBLE) / CAST(n_points AS DOUBLE)
                     - CAST(gn AS DOUBLE) / CAST(tot.gt AS DOUBLE))) AS tvd
  FROM xp CROSS JOIN tot GROUP BY 1, 2, 3)
SELECT x, y, n_points, round(tvd, 6) AS tvd,
       CAST(tvd <= {privacy.TCLOSE_T!r} AS BIGINT) AS meets_t
FROM s""",
        "k_anonymity": f"""
WITH {_pts_cte()},
t12 AS (SELECT doc_id, {oracle.sql_tile_x('lon', privacy.KANON_ZOOMS[0])} AS x,
               {oracle.sql_tile_y('lat', privacy.KANON_ZOOMS[0])} AS y FROM pts),
c12 AS (SELECT x, y, count(*) AS n FROM t12 GROUP BY x, y),
c10 AS (SELECT x >> {privacy.KANON_ZOOMS[0] - privacy.KANON_ZOOMS[1]} AS x,
               y >> {privacy.KANON_ZOOMS[0] - privacy.KANON_ZOOMS[1]} AS y,
               CAST(sum(n) AS BIGINT) AS n FROM c12 GROUP BY 1, 2),
c8 AS (SELECT x >> {privacy.KANON_ZOOMS[1] - privacy.KANON_ZOOMS[2]} AS x,
              y >> {privacy.KANON_ZOOMS[1] - privacy.KANON_ZOOMS[2]} AS y,
              CAST(sum(n) AS BIGINT) AS n FROM c10 GROUP BY 1, 2),
m AS (
  SELECT b.x, b.y,
         CAST(CASE WHEN b.n >= {privacy.KANON_K} THEN {privacy.KANON_ZOOMS[0]}
                   WHEN p10.n >= {privacy.KANON_K} THEN {privacy.KANON_ZOOMS[1]}
                   WHEN p8.n >= {privacy.KANON_K} THEN {privacy.KANON_ZOOMS[2]}
                   ELSE -1 END AS BIGINT) AS anon_z
  FROM c12 b
  JOIN c10 p10 ON p10.x = b.x >> {privacy.KANON_ZOOMS[0] - privacy.KANON_ZOOMS[1]}
              AND p10.y = b.y >> {privacy.KANON_ZOOMS[0] - privacy.KANON_ZOOMS[1]}
  JOIN c8 p8 ON p8.x = b.x >> {privacy.KANON_ZOOMS[0] - privacy.KANON_ZOOMS[2]}
            AND p8.y = b.y >> {privacy.KANON_ZOOMS[0] - privacy.KANON_ZOOMS[2]})
SELECT t.doc_id, m.anon_z,
       CASE m.anon_z WHEN {privacy.KANON_ZOOMS[0]} THEN t.x
                     WHEN {privacy.KANON_ZOOMS[1]} THEN t.x >> {privacy.KANON_ZOOMS[0] - privacy.KANON_ZOOMS[1]}
                     WHEN {privacy.KANON_ZOOMS[2]} THEN t.x >> {privacy.KANON_ZOOMS[0] - privacy.KANON_ZOOMS[2]}
                     ELSE CAST(-1 AS BIGINT) END AS anon_x,
       CASE m.anon_z WHEN {privacy.KANON_ZOOMS[0]} THEN t.y
                     WHEN {privacy.KANON_ZOOMS[1]} THEN t.y >> {privacy.KANON_ZOOMS[0] - privacy.KANON_ZOOMS[1]}
                     WHEN {privacy.KANON_ZOOMS[2]} THEN t.y >> {privacy.KANON_ZOOMS[0] - privacy.KANON_ZOOMS[2]}
                     ELSE CAST(-1 AS BIGINT) END AS anon_y
FROM t12 t JOIN m ON m.x = t.x AND m.y = t.y""",
        "stratified_sample": f"""
SELECT event_id, user_id, event_type, value FROM events
WHERE ((event_id * {trajectory.SAMPLE_MULT} + {trajectory.SAMPLE_ADD}) % {trajectory.M31}) / {trajectory.M31}
  < CASE event_type {' '.join(f"WHEN '{k}' THEN CAST({v!r} AS DOUBLE)" for k, v in trajectory.SAMPLE_RATES.items())} ELSE CAST(0.0 AS DOUBLE) END""",
        "rolling_window": f"""
WITH f AS (SELECT event_id, user_id, ts,
           CAST(floor(value * {windows.ROLL_FP!r} + 0.5) AS BIGINT) AS fp FROM events)
SELECT event_id, user_id,
  CAST(sum(fp) OVER w AS BIGINT) AS w_sum_fp,
  CAST(count(*) OVER w AS BIGINT) AS w_n
FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN {windows.ROLL_WINDOW} PRECEDING AND CURRENT ROW)""",
        "scd2_intervals": """
SELECT user_id, event_id, ts AS valid_from,
       COALESCE(LEAD(ts) OVER w, TIMESTAMP '2100-01-01') AS valid_to,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
        "event_trigram_counts": """
WITH s AS (SELECT event_type AS t0,
                  lead(event_type, 1) OVER w AS t1, lead(event_type, 2) OVER w AS t2
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT t0, t1, t2, CAST(count(*) AS BIGINT) AS n
FROM s WHERE t2 IS NOT NULL GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
        "weighted_sample": f"""
WITH u AS (SELECT event_id, value,
                  ((event_id * {trajectory.SAMPLE_MULT} + {trajectory.SAMPLE_ADD}) % {trajectory.M31})
                  / {trajectory.M31} AS uu
           FROM events)
SELECT event_id, value, round(-ln(uu) / value, 9) AS skey
FROM u WHERE value > 0 AND uu > 0
ORDER BY -ln(uu) / value, event_id LIMIT {windows.WSAMPLE_K}""",
        "global_row_numbers": """
SELECT event_id, CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS rn
FROM events ORDER BY rn""",
        "hash_split_counts": """
WITH s AS (SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
                       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e', 'f') THEN 'test'
                       ELSE 'train' END AS split, lang FROM documents)
SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs
FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
        "rfm_features": f"""
SELECT user_id,
       ({stats.RFM_ASOF_US} - epoch_us(max(ts))) // 86400000000 AS r_days,
       CAST(count(*) AS BIGINT) AS f_events,
       CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS m_cents
FROM events GROUP BY 1 ORDER BY 1""",
        "iqr_outliers": f"""
WITH q AS (SELECT event_type, quantile_disc(value, 0.25) AS q1, quantile_disc(value, 0.75) AS q3
           FROM events GROUP BY 1),
f AS (SELECT event_type, q1 - {stats.IQR_MULT!r} * (q3 - q1) AS lo,
             q3 + {stats.IQR_MULT!r} * (q3 - q1) AS hi FROM q)
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM events e JOIN f USING (event_type) GROUP BY 1 ORDER BY 1""",
        "table_profile": """
SELECT tbl, col, CAST(n_rows AS BIGINT) AS n_rows, CAST(n_null AS BIGINT) AS n_null,
       CAST(n_empty AS BIGINT) AS n_empty FROM (
  SELECT 'documents' AS tbl, 'lang' AS col, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         CAST(sum(CASE WHEN lang = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty FROM documents
  UNION ALL
  SELECT 'documents', 'source', count(*), sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END),
         sum(CASE WHEN source = '' THEN 1 ELSE 0 END) FROM documents
  UNION ALL
  SELECT 'documents', 'text', count(*), sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END),
         sum(CASE WHEN text = '' THEN 1 ELSE 0 END) FROM documents
  UNION ALL
  SELECT 'events', 'event_type', count(*), sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END),
         sum(CASE WHEN event_type = '' THEN 1 ELSE 0 END) FROM events
  UNION ALL
  SELECT 'events', 'props', count(*), sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END),
         sum(CASE WHEN props = '' THEN 1 ELSE 0 END) FROM events
  UNION ALL
  SELECT 'orders', 'o_orderpriority', count(*), sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END),
         sum(CASE WHEN o_orderpriority = '' THEN 1 ELSE 0 END) FROM orders
  UNION ALL
  SELECT 'orders', 'o_orderstatus', count(*), sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END),
         sum(CASE WHEN o_orderstatus = '' THEN 1 ELSE 0 END) FROM orders
) ORDER BY tbl, col""",
        "sequence_pattern_counts": f"""
WITH s AS (SELECT user_id, event_type,
                  lead(event_type, 1) OVER w AS e1, lead(event_type, 2) OVER w AS e2
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches
FROM s WHERE event_type = '{windows.SEQ_PATTERN[0]}' AND e1 = '{windows.SEQ_PATTERN[1]}'
        AND e2 = '{windows.SEQ_PATTERN[2]}'
GROUP BY 1""",
        "ohlc_hourly": """
WITH b AS (SELECT event_id, epoch_us(ts) AS tus, CAST(round(value * 100.0, 0) AS BIGINT) AS c,
                  (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us FROM events),
r AS (SELECT *, row_number() OVER (PARTITION BY hour_us ORDER BY tus, event_id) AS ra,
             row_number() OVER (PARTITION BY hour_us ORDER BY tus DESC, event_id DESC) AS rd FROM b)
SELECT make_timestamp(hour_us) AS hour_start,
       CAST(max(CASE WHEN ra = 1 THEN c END) AS BIGINT) AS open_c,
       CAST(max(c) AS BIGINT) AS high_c, CAST(min(c) AS BIGINT) AS low_c,
       CAST(max(CASE WHEN rd = 1 THEN c END) AS BIGINT) AS close_c,
       CAST(count(*) AS BIGINT) AS n_events
FROM r GROUP BY hour_us ORDER BY 1""",
        "event_dedup": f"""
WITH k AS (SELECT event_id, user_id, ts, event_type, value,
                  epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id, event_type, CAST(round(value * 100.0, 0) AS BIGINT)
                    ORDER BY ts, event_id) AS gap_us
           FROM events)
SELECT event_id, user_id, ts, event_type, value FROM k
WHERE gap_us IS NULL OR gap_us > {windows.EVENT_DEDUP_GAP_S} * 1000000""",
        "user_retention": f"""
WITH uw AS (SELECT DISTINCT user_id,
                   CAST(floor(epoch_us(ts) / {windows.WEEK_US}) AS BIGINT) AS wk FROM events),
c AS (SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY 1)
SELECT cohort_week, wk - cohort_week AS week_offset, count(*) AS n_users
FROM uw JOIN c USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2""",
        "matryoshka_fidelity": f"""
WITH u AS (SELECT vec_id, unnest(embedding) AS val, generate_subscripts(embedding, 1) AS dim
           FROM embeddings),
qq AS (SELECT vec_id, dim,
              CAST(floor(CAST(val AS DOUBLE) * {ann.CENTROID_FP} + 0.5) AS BIGINT) AS q FROM u),
m AS (SELECT vec_id,
             CAST(sum(CASE WHEN dim <= {ann.MATRYOSHKA_HALF} THEN q * q ELSE 0 END) AS BIGINT) AS sh,
             CAST(sum(q * q) AS BIGINT) AS sf
      FROM qq GROUP BY 1)
SELECT vec_id, round(sqrt(CAST(sh AS DOUBLE) / CAST(sf AS DOUBLE)), 6) AS trunc_cos
FROM m ORDER BY vec_id""",
        "embedding_dim_stats": f"""
WITH u AS (SELECT vec_id, unnest(embedding) AS val, generate_subscripts(embedding, 1) AS dim
           FROM embeddings),
qq AS (SELECT CAST(dim - 1 AS BIGINT) AS dim,
              CAST(floor(CAST(val AS DOUBLE) * {ann.CENTROID_FP} + 0.5) AS BIGINT) AS q FROM u),
m AS (SELECT dim, CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(sum(q) AS BIGINT) AS s, CAST(sum(q * q) AS BIGINT) AS sq,
             CAST(min(q) AS BIGINT) AS mn, CAST(max(q) AS BIGINT) AS mx
      FROM qq GROUP BY 1)
SELECT dim, n_vecs,
       round(CAST(s AS DOUBLE) / {ann.CENTROID_FP} / n_vecs, 6) AS mean,
       round((CAST(n_vecs AS DOUBLE) * CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             / (CAST(n_vecs AS DOUBLE) * CAST(n_vecs AS DOUBLE) * {float(ann.CENTROID_FP) * float(ann.CENTROID_FP)!r}), 6) AS var,
       round(CAST(mn AS DOUBLE) / {ann.CENTROID_FP}, 6) AS vmin,
       round(CAST(mx AS DOUBLE) / {ann.CENTROID_FP}, 6) AS vmax
FROM m ORDER BY dim""",
        "recency_weighted_value": f"""
WITH r AS (
  SELECT user_id, CAST(round(value * 100.0, 0) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events),
w AS (SELECT user_id,
             cents * (CAST(1 AS BIGINT) << ({windows.RECENCY_K} - CAST(rn AS INTEGER))) AS wc
      FROM r WHERE rn <= {windows.RECENCY_K}),
a AS (SELECT user_id, CAST(sum(wc) AS BIGINT) AS ws, CAST(count(*) AS BIGINT) AS m
      FROM w GROUP BY 1)
SELECT user_id, m AS n_recent,
       CAST(ws AS DOUBLE)
       / ((CAST(1 AS BIGINT) << {windows.RECENCY_K}) - (CAST(1 AS BIGINT) << ({windows.RECENCY_K} - CAST(m AS INTEGER))))
       / 100.0 AS rw_value
FROM a""",
        "value_hour_correlation": """
WITH b AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
                  CAST(round(value * 100.0, 0) AS BIGINT) AS cents FROM events),
m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(hr) AS BIGINT) AS sx, CAST(sum(cents) AS BIGINT) AS sy,
             CAST(sum(hr * cents) AS BIGINT) AS sxy,
             CAST(sum(hr * hr) AS BIGINT) AS sxx,
             CAST(sum(cents * cents) AS BIGINT) AS syy
      FROM b GROUP BY 1)
SELECT event_type, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS pearson_r
FROM m ORDER BY event_type""",
        "label_class_weights": """
WITH c AS (SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n
           FROM embeddings GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS k FROM c)
SELECT label, n, CAST(total AS DOUBLE) / CAST(k * n AS DOUBLE) AS class_weight
FROM c, t ORDER BY label""",
        "decontaminate": f"""
WITH bench AS (SELECT md5(text) AS h FROM documents
  WHERE ((doc_id * {trajectory.SAMPLE_MULT} + {trajectory.SAMPLE_ADD}) % {trajectory.M31}) / {trajectory.M31}
        < CAST({dedup.DECON_FRAC!r} AS DOUBLE))
SELECT doc_id, lang, source FROM documents
WHERE md5(text) NOT IN (SELECT h FROM bench)""",
        "doc_keywords": """
WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tk FROM documents),
tf AS (SELECT doc_id, tk, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT tk, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
sc AS (SELECT doc_id, tf.tk, CAST(tf AS DOUBLE) * ln(CAST(nd AS DOUBLE) / df) AS score
       FROM tf JOIN df ON tf.tk = df.tk, n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tk) AS rn FROM sc)
SELECT doc_id, tk AS keyword, round(score, 6) AS score FROM r WHERE rn = 1 ORDER BY doc_id""",
        "ngram_decontaminate": f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
gi AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - {dedup.DECON_NGRAM_N - 1})) AS i FROM t),
g AS (SELECT doc_id, array_to_string(toks[i:i+{dedup.DECON_NGRAM_N - 1}], ' ') AS ng FROM gi),
bench AS (SELECT DISTINCT ng FROM g
          WHERE ((doc_id * {trajectory.SAMPLE_MULT} + {trajectory.SAMPLE_ADD}) % {trajectory.M31}) / {trajectory.M31}
                < CAST({dedup.DECON_FRAC!r} AS DOUBLE))
SELECT doc_id, CAST(count(DISTINCT g.ng) AS BIGINT) AS n_hits
FROM g JOIN bench ON g.ng = bench.ng
WHERE ((doc_id * {trajectory.SAMPLE_MULT} + {trajectory.SAMPLE_ADD}) % {trajectory.M31}) / {trajectory.M31}
      >= CAST({dedup.DECON_FRAC!r} AS DOUBLE)
GROUP BY 1 ORDER BY doc_id""",
        "snapshot_diff": f"""
WITH a AS (SELECT doc_id, md5(text) AS h_a FROM documents),
b AS (SELECT doc_id,
             md5(CASE WHEN doc_id % {dedup.SNAP_EDIT_MOD} = 0 THEN text || ' v2' ELSE text END) AS h_b
      FROM documents WHERE doc_id % {dedup.SNAP_DEL_MOD} <> 0)
SELECT CASE WHEN h_b IS NULL THEN 'removed' WHEN h_a IS NULL THEN 'added'
            WHEN h_a = h_b THEN 'unchanged' ELSE 'changed' END AS status,
       CAST(count(*) AS BIGINT) AS n_docs
FROM a FULL OUTER JOIN b USING (doc_id)
GROUP BY 1 ORDER BY 1""",
        "layout_pruning_stats": f"""
WITH base AS (SELECT event_id,
  CAST(least(greatest(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {fixtures.LON_SPAN!r} * 256), 0), 255) AS BIGINT) AS cx,
  (epoch_us(ts) // 86400000000) - {spatial.LAYOUT_DAY0} AS d8
  FROM events),
{oracle.sql_interleave_ctes('base', 'event_id, cx, d8', 'cx', 'd8', 'zval', 'z')},
r AS (SELECT cx, d8, zval,
             CASE WHEN cx BETWEEN {spatial.LAYOUT_CX[0]} AND {spatial.LAYOUT_CX[1]}
                   AND d8 BETWEEN {spatial.LAYOUT_D[0]} AND {spatial.LAYOUT_D[1]} THEN 1 ELSE 0 END AS m
      FROM z_out),
u AS (
  SELECT 'space' AS layout, cx >> 3 AS f, cx, d8, m FROM r
  UNION ALL SELECT 'time', d8, cx, d8, m FROM r
  UNION ALL SELECT 'zorder', zval >> 9, cx, d8, m FROM r),
mf AS (SELECT layout, f, min(cx) AS mncx, max(cx) AS mxcx,
              min(d8) AS mnd, max(d8) AS mxd, sum(m) AS nm
       FROM u GROUP BY 1, 2)
SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN mncx <= {spatial.LAYOUT_CX[1]} AND mxcx >= {spatial.LAYOUT_CX[0]}
                      AND mnd <= {spatial.LAYOUT_D[1]} AND mxd >= {spatial.LAYOUT_D[0]}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_touched,
       CAST(sum(CASE WHEN nm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
FROM mf GROUP BY 1 ORDER BY 1""",
        "price_band_pairs": f"""
WITH j AS (SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey),
o AS (SELECT o_orderkey AS rid, n_name, CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS c
      FROM orders JOIN j ON o_custkey = c_custkey)
SELECT a.n_name, CAST(count(*) AS BIGINT) AS n_pairs
FROM o a JOIN o b ON a.n_name = b.n_name
  AND (b.c > a.c OR (b.c = a.c AND b.rid > a.rid))
  AND b.c - a.c <= {relational.PRICE_BAND_CENTS}
GROUP BY 1 ORDER BY 1""",
        "snap_to_ways": f"""
WITH {_pts_cte()},
segs AS (SELECT * FROM {oracle.sql_way_segments_values()}),
c0 AS (SELECT doc_id, way_id, seg_idx, pts.lon AS px, pts.lat AS py,
              x1, y1, (x2 - x1) AS dx, (y2 - y1) AS dy
       FROM pts CROSS JOIN segs),
c1 AS (SELECT *, least(greatest(((px - x1) * dx + (py - y1) * dy) / (dx * dx + dy * dy), 0.0), 1.0) AS t
       FROM c0),
c2 AS (SELECT doc_id, way_id, seg_idx, px, py, (x1 + t * dx) AS qx, (y1 + t * dy) AS qy FROM c1),
c3 AS (SELECT doc_id, way_id, seg_idx, qx AS snap_lon, qy AS snap_lat,
              ((px - qx) * (px - qx) + (py - qy) * (py - qy)) AS dist2 FROM c2),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY dist2, way_id, seg_idx) AS rn FROM c3)
SELECT doc_id, way_id, seg_idx, snap_lon, snap_lat, dist2 FROM r WHERE rn = 1""",
        "route_corridor": f"""
WITH {_pts_cte()},
segs AS (SELECT * FROM {oracle.sql_way_segments_values()}
         WHERE way_id IN {snap.CORRIDOR_WAYS!r}),
c0 AS (SELECT doc_id, way_id, seg_idx, pts.lon AS px, pts.lat AS py,
              x1, y1, (x2 - x1) AS dx, (y2 - y1) AS dy
       FROM pts CROSS JOIN segs),
c1 AS (SELECT *, least(greatest(((px - x1) * dx + (py - y1) * dy) / (dx * dx + dy * dy), 0.0), 1.0) AS t
       FROM c0),
c2 AS (SELECT doc_id, way_id, seg_idx, px, py, (x1 + t * dx) AS qx, (y1 + t * dy) AS qy FROM c1),
c3 AS (SELECT doc_id, way_id, seg_idx,
              ((px - qx) * (px - qx) + (py - qy) * (py - qy)) AS dist2 FROM c2),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY dist2, way_id, seg_idx) AS rn FROM c3)
SELECT doc_id, way_id, seg_idx, dist2 FROM r
WHERE rn = 1 AND dist2 < CAST('{snap.CORRIDOR_R * snap.CORRIDOR_R!r}' AS DOUBLE)""",
        "user_burstiness": """
WITH o AS (SELECT user_id, epoch_us(ts) AS t,
                  lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nt
           FROM events),
g AS (SELECT user_id, (nt - t) // 1000000 AS gap FROM o WHERE nt IS NOT NULL),
m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(gap) AS BIGINT) AS s, CAST(sum(gap * gap) AS BIGINT) AS sq
      FROM g GROUP BY 1)
SELECT user_id, n_gaps,
       CAST(s AS DOUBLE) / n_gaps AS mean_gap_s,
       (sqrt(CAST(n_gaps AS DOUBLE) * CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) - CAST(s AS DOUBLE))
       / (sqrt(CAST(n_gaps AS DOUBLE) * CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) + CAST(s AS DOUBLE)) AS burstiness
FROM m""",
        "dwell_in_zone": f"""
WITH {_epts},
w AS (SELECT user_id, lon, lat,
        lead(lon) OVER uw AS nlon, lead(lat) OVER uw AS nlat,
        lead(epoch_us(ts)) OVER uw - epoch_us(ts) AS dur_us
      FROM epts WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)),
j AS (SELECT user_id, rel_id, dur_us FROM w JOIN {rects}
      ON w.lon >= b.lon_min AND w.lon < b.lon_max AND w.lat >= b.lat_min AND w.lat < b.lat_max
     AND w.nlon >= b.lon_min AND w.nlon < b.lon_max AND w.nlat >= b.lat_min AND w.nlat < b.lat_max)
SELECT user_id, rel_id, CAST(sum(dur_us) AS BIGINT) AS dwell_us, count(*) AS n_segments
FROM j GROUP BY user_id, rel_id""",
        "geofence_transitions": f"""
WITH {_epts},
z AS (SELECT e.event_id, e.user_id, e.ts, CAST(coalesce(min(b.rel_id), -1) AS BIGINT) AS zone
      FROM epts e LEFT JOIN {rects}
        ON e.lon >= b.lon_min AND e.lon < b.lon_max AND e.lat >= b.lat_min AND e.lat < b.lat_max
      GROUP BY e.event_id, e.user_id, e.ts),
w AS (SELECT user_id, ts, zone,
        lag(zone) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM z)
SELECT user_id, ts, prev AS from_zone, zone AS to_zone
FROM w WHERE prev IS NOT NULL AND prev <> zone""",
        "skyline_parts": """
SELECT p_partkey, p_size, p_retailprice FROM part t
WHERE NOT EXISTS (SELECT 1 FROM part u
  WHERE u.p_retailprice >= t.p_retailprice AND u.p_size <= t.p_size
    AND (u.p_retailprice > t.p_retailprice OR u.p_size < t.p_size))""",
        "cell_trend": f"""
WITH ec AS (
  SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy,
         CAST(floor(epoch_us(ts) / {hotspot.DAY_US}) AS BIGINT) AS day
  FROM events),
d AS (SELECT cx, cy, day, CAST(count(*) AS BIGINT) AS y FROM ec GROUP BY 1, 2, 3),
m AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(day) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(day * y) AS BIGINT) AS sxy, CAST(sum(day * day) AS BIGINT) AS sx2
      FROM d GROUP BY 1, 2)
SELECT cx, cy, n_days,
       n_days * sxy - sx * sy AS slope_num,
       n_days * sx2 - sx * sx AS slope_den,
       round(CAST(n_days * sxy - sx * sy AS DOUBLE) / CAST(n_days * sx2 - sx * sx AS DOUBLE), 9) AS slope
FROM m WHERE n_days >= {hotspot.TREND_MIN_DAYS} AND n_days * sx2 - sx * sx > 0""",
        "theil_sen_cell_trend": f"""
WITH ec AS (
  SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy,
         CAST(floor(epoch_us(ts) / {hotspot.DAY_US}) AS BIGINT) AS day
  FROM events),
d AS (SELECT cx, cy, day, CAST(count(*) AS BIGINT) AS y FROM ec GROUP BY 1, 2, 3),
nd AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n_days FROM d GROUP BY 1, 2
       HAVING count(*) >= {hotspot.TREND_MIN_DAYS}),
p AS (SELECT a.cx, a.cy, CAST(b.y - a.y AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
      FROM d a JOIN d b ON a.cx = b.cx AND a.cy = b.cy AND b.day > a.day)
SELECT p.cx, p.cy, nd.n_days, round(median(p.slope), 6) AS ts_slope
FROM p JOIN nd ON p.cx = nd.cx AND p.cy = nd.cy
GROUP BY p.cx, p.cy, nd.n_days""",
        "kriging_field": f"SELECT * FROM read_parquet('{golden.kriging_field_path(SF001)}')",
        # mirrors hotspot.lacunarity: per-scale occupied-box mass moments
        "lacunarity": " UNION ALL ".join(
            f"""
SELECT CAST({e!r} AS DOUBLE) AS eps, n_boxes, sum_mass, sum_mass_sq,
       round(CAST(n_boxes AS DOUBLE) * CAST(sum_mass_sq AS DOUBLE)
             / (CAST(sum_mass AS DOUBLE) * CAST(sum_mass AS DOUBLE)), 6) AS lacunarity
FROM (
  SELECT CAST(count(*) AS BIGINT) AS n_boxes, CAST(sum(m) AS BIGINT) AS sum_mass,
         CAST(sum(m * m) AS BIGINT) AS sum_mass_sq
  FROM (
    SELECT count(*) AS m FROM (
      SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {e!r}) AS BIGINT) AS gx,
             CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {e!r}) AS BIGINT) AS gy
      FROM events)
    GROUP BY gx, gy))"""
            for e in hotspot.FRACTAL_SCALES
        ),
        "fractal_dimension": f"""
WITH sc AS (
SELECT CAST(0 AS BIGINT) AS si, CAST(0.8 AS DOUBLE) AS eps, CAST(count(*) AS BIGINT) AS n_cells FROM (
  SELECT DISTINCT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / 0.8) AS BIGINT) AS gx,
                  CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / 0.8) AS BIGINT) AS gy
  FROM events)
UNION ALL
SELECT CAST(1 AS BIGINT) AS si, CAST(0.4 AS DOUBLE) AS eps, CAST(count(*) AS BIGINT) AS n_cells FROM (
  SELECT DISTINCT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / 0.4) AS BIGINT) AS gx,
                  CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / 0.4) AS BIGINT) AS gy
  FROM events)
UNION ALL
SELECT CAST(2 AS BIGINT) AS si, CAST(0.2 AS DOUBLE) AS eps, CAST(count(*) AS BIGINT) AS n_cells FROM (
  SELECT DISTINCT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / 0.2) AS BIGINT) AS gx,
                  CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / 0.2) AS BIGINT) AS gy
  FROM events)
UNION ALL
SELECT CAST(3 AS BIGINT) AS si, CAST(0.1 AS DOUBLE) AS eps, CAST(count(*) AS BIGINT) AS n_cells FROM (
  SELECT DISTINCT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / 0.1) AS BIGINT) AS gx,
                  CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / 0.1) AS BIGINT) AS gy
  FROM events)
UNION ALL
SELECT CAST(4 AS BIGINT) AS si, CAST(0.05 AS DOUBLE) AS eps, CAST(count(*) AS BIGINT) AS n_cells FROM (
  SELECT DISTINCT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / 0.05) AS BIGINT) AS gx,
                  CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / 0.05) AS BIGINT) AS gy
  FROM events)),
t AS (SELECT CAST(count(*) AS DOUBLE) AS m,
        CAST(sum(CAST(floor(ln(1.0 / eps) * 1000000000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000000000.0 AS fsx,
        CAST(sum(CAST(floor(ln(CAST(n_cells AS DOUBLE)) * 1000000000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000000000.0 AS fsy,
        CAST(sum(CAST(floor(ln(1.0 / eps) * ln(1.0 / eps) * 1000000000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000000000.0 AS fsxx,
        CAST(sum(CAST(floor(ln(1.0 / eps) * ln(CAST(n_cells AS DOUBLE)) * 1000000000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000000000.0 AS fsxy
      FROM sc)
SELECT sc.eps, sc.n_cells,
       round((t.m * t.fsxy - t.fsx * t.fsy) / (t.m * t.fsxx - t.fsx * t.fsx), 6) AS fractal_d
FROM sc CROSS JOIN t""",
        "join_count_stats": f"""
WITH {_epts},
ec AS (
  SELECT CAST(floor((lon - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor((lat - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy
  FROM epts),
c AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n FROM ec GROUP BY 1, 2),
m AS (SELECT CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean,
             CAST(count(*) AS BIGINT) AS nc FROM c),
f AS (SELECT cx, cy, CASE WHEN CAST(n AS DOUBLE) > m.mean THEN 1 ELSE 0 END AS b
      FROM c CROSS JOIN m),
e AS (SELECT a.b AS b1, x.b AS b2 FROM f a JOIN f x
      ON (x.cx = a.cx + 1 AND x.cy = a.cy) OR (x.cx = a.cx AND x.cy = a.cy + 1)),
j AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
             CAST(sum(CASE WHEN b1 = 1 AND b2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bb,
             CAST(sum(CASE WHEN b1 = 0 AND b2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ww,
             CAST(sum(CASE WHEN b1 <> b2 THEN 1 ELSE 0 END) AS BIGINT) AS bw
      FROM e),
k AS (SELECT CAST(sum(b) AS BIGINT) AS n_black FROM f),
p AS (SELECT CAST(k.n_black AS DOUBLE) / CAST(m.nc AS DOUBLE) AS pb,
             CAST(m.nc - k.n_black AS DOUBLE) / CAST(m.nc AS DOUBLE) AS pw
      FROM k CROSS JOIN m)
SELECT m.nc AS n_cells, k.n_black, j.n_edges, j.bb, j.ww, j.bw,
       round(CAST(j.n_edges AS DOUBLE) * p.pb * p.pb, 6) AS e_bb,
       round(CAST(j.n_edges AS DOUBLE) * p.pw * p.pw, 6) AS e_ww,
       round(2.0 * CAST(j.n_edges AS DOUBLE) * p.pb * p.pw, 6) AS e_bw
FROM m CROSS JOIN k CROSS JOIN j CROSS JOIN p""",
        "cell_peak_hours": f"""
WITH ec AS (
  SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour
  FROM events),
c AS (SELECT cx, cy, hour, CAST(count(*) AS BIGINT) AS n FROM ec GROUP BY 1, 2, 3),
r AS (SELECT cx, cy, hour, n,
        row_number() OVER (PARTITION BY cx, cy ORDER BY n DESC, hour) AS rk,
        CAST(sum(n) OVER (PARTITION BY cx, cy) AS BIGINT) AS n_total
      FROM c)
SELECT cx, cy, hour AS peak_hour, n AS n_peak, n_total,
       round(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS peak_share
FROM r WHERE rk = 1""",
        "p_median_greedy": f"""
WITH ec AS (
  SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy
  FROM events),
c AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n FROM ec GROUP BY 1, 2),
ctr AS (SELECT cx * {hotspot.GI_GY} + cy AS ck, n,
          {fixtures.LON_MIN!r} + (CAST(cx AS DOUBLE) + 0.5) * {hotspot.GI_EPS!r} AS clon,
          {fixtures.LAT_MIN!r} + (CAST(cy AS DOUBLE) + 0.5) * {hotspot.GI_EPS!r} AS clat
        FROM c),
pj AS (SELECT poi_id, lon, lat FROM {pois} WHERE value = '{hotspot.HUFF_VALUE}'),
x AS (SELECT ctr.ck, ctr.n, pj.poi_id,
        CAST(floor(sqrt((clon - lon) * (clon - lon) + (clat - lat) * (clat - lat)) * {hotspot.PMED_FP!r} + 0.5) AS BIGINT) AS dfp
      FROM ctr CROSS JOIN pj),
cost1 AS (SELECT poi_id, CAST(sum(n * dfp) AS BIGINT) AS cost FROM x GROUP BY poi_id),
pick1 AS (SELECT poi_id, cost FROM cost1 ORDER BY cost, poi_id LIMIT 1),
best1 AS (SELECT x.ck, x.dfp AS b FROM x JOIN pick1 ON x.poi_id = pick1.poi_id),
cost2 AS (SELECT x.poi_id, CAST(sum(x.n * least(b.b, x.dfp)) AS BIGINT) AS cost
          FROM x JOIN best1 b ON x.ck = b.ck
          WHERE x.poi_id NOT IN (SELECT poi_id FROM pick1) GROUP BY x.poi_id),
pick2 AS (SELECT poi_id, cost FROM cost2 ORDER BY cost, poi_id LIMIT 1),
best2 AS (SELECT b.ck, least(b.b, x.dfp) AS b
          FROM best1 b JOIN x ON x.ck = b.ck JOIN pick2 ON x.poi_id = pick2.poi_id),
cost3 AS (SELECT x.poi_id, CAST(sum(x.n * least(b.b, x.dfp)) AS BIGINT) AS cost
          FROM x JOIN best2 b ON x.ck = b.ck
          WHERE x.poi_id NOT IN (SELECT poi_id FROM pick1 UNION ALL SELECT poi_id FROM pick2)
          GROUP BY x.poi_id),
pick3 AS (SELECT poi_id, cost FROM cost3 ORDER BY cost, poi_id LIMIT 1)
SELECT CAST(1 AS BIGINT) AS step, poi_id, cost AS total_cost_fp,
       round(CAST(cost AS DOUBLE) / {hotspot.PMED_FP!r}, 6) AS total_cost FROM pick1
UNION ALL SELECT CAST(2 AS BIGINT), poi_id, cost, round(CAST(cost AS DOUBLE) / {hotspot.PMED_FP!r}, 6) FROM pick2
UNION ALL SELECT CAST(3 AS BIGINT), poi_id, cost, round(CAST(cost AS DOUBLE) / {hotspot.PMED_FP!r}, 6) FROM pick3""",
        "cell_mad_outliers": f"""
WITH ec AS (
  SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy,
         CAST(floor(epoch_us(ts) / {hotspot.DAY_US}) AS BIGINT) AS day
  FROM events),
d AS (SELECT cx, cy, day, CAST(count(*) AS BIGINT) AS y FROM ec GROUP BY 1, 2, 3),
st AS (SELECT cx, cy, median(CAST(y AS DOUBLE)) AS med FROM d GROUP BY 1, 2),
md AS (SELECT d.cx, d.cy, median(abs(CAST(d.y AS DOUBLE) - st.med)) AS mad
       FROM d JOIN st ON d.cx = st.cx AND d.cy = st.cy GROUP BY 1, 2)
SELECT d.cx, d.cy, d.day, d.y, round(st.med, 6) AS med, round(md.mad, 6) AS mad
FROM d JOIN st ON d.cx = st.cx AND d.cy = st.cy
JOIN md ON d.cx = md.cx AND d.cy = md.cy
WHERE abs(CAST(d.y AS DOUBLE) - st.med) > {hotspot.MAD_K!r} * md.mad""",
        "hot_cell_clusters": f"""
WITH RECURSIVE ec AS (
  SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy
  FROM events),
c AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n FROM ec GROUP BY 1, 2),
hot AS (SELECT cx, cy, n, cx * {hotspot.GI_GY} + cy AS key FROM c WHERE n >= {hotspot.PERC_MIN_EVENTS}),
e AS (SELECT a.key AS u, b.key AS v FROM hot a JOIN hot b
      ON abs(a.cx - b.cx) + abs(a.cy - b.cy) <= 1),
r(u, lbl) AS (
  SELECT key, key FROM hot
  UNION
  SELECT e.u, r.lbl FROM e JOIN r ON e.v = r.u),
m AS (SELECT u, CAST(min(lbl) AS BIGINT) AS cluster_id FROM r GROUP BY u),
sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size FROM m GROUP BY cluster_id)
SELECT hot.cx, hot.cy, hot.n AS n_events, m.cluster_id, sz.cluster_size
FROM hot JOIN m ON hot.key = m.u JOIN sz ON m.cluster_id = sz.cluster_id""",
        "poi_accessibility": f"""
WITH ec AS (
  SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy
  FROM events),
c AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n FROM ec GROUP BY 1, 2),
ctr AS (SELECT cx, cy, n,
          {fixtures.LON_MIN!r} + (CAST(cx AS DOUBLE) + 0.5) * {hotspot.GI_EPS!r} AS clon,
          {fixtures.LAT_MIN!r} + (CAST(cy AS DOUBLE) + 0.5) * {hotspot.GI_EPS!r} AS clat
        FROM c),
pj AS (SELECT poi_id, lon, lat, CAST(1 + poi_id % 3 AS DOUBLE) AS cap
       FROM {pois} WHERE value = '{hotspot.HUFF_VALUE}'),
x AS (SELECT ctr.cx, ctr.cy, ctr.n, pj.poi_id, pj.cap,
        (clon - lon) * (clon - lon) + (clat - lat) * (clat - lat) <= {hotspot.SFCA_D0!r} * {hotspot.SFCA_D0!r} AS reach
      FROM ctr CROSS JOIN pj),
dem AS (SELECT poi_id, cap, CAST(sum(CASE WHEN reach THEN n ELSE 0 END) AS BIGINT) AS demand
        FROM x GROUP BY poi_id, cap),
rj AS (SELECT poi_id,
         CASE WHEN demand > 0
              THEN CAST(floor(cap / CAST(demand AS DOUBLE) * {hotspot.SFCA_FP!r} + 0.5) AS BIGINT)
              ELSE 0 END AS rj_fp
       FROM dem)
SELECT x.cx, x.cy, x.n AS n_events,
       CAST(sum(CASE WHEN x.reach THEN 1 ELSE 0 END) AS BIGINT) AS n_pois_in_reach,
       CAST(sum(CASE WHEN x.reach THEN rj.rj_fp ELSE 0 END) AS BIGINT) AS access_fp,
       round(CAST(sum(CASE WHEN x.reach THEN rj.rj_fp ELSE 0 END) AS DOUBLE) / {hotspot.SFCA_FP!r}, 6) AS accessibility
FROM x JOIN rj ON x.poi_id = rj.poi_id
GROUP BY x.cx, x.cy, x.n""",
        "huff_model": f"""
WITH ec AS (
  SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy
  FROM events),
c AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n FROM ec GROUP BY 1, 2),
ctr AS (SELECT cx, cy, n,
          {fixtures.LON_MIN!r} + (CAST(cx AS DOUBLE) + 0.5) * {hotspot.GI_EPS!r} AS clon,
          {fixtures.LAT_MIN!r} + (CAST(cy AS DOUBLE) + 0.5) * {hotspot.GI_EPS!r} AS clat
        FROM c),
pj AS (SELECT poi_id, lon, lat, CAST(1 + poi_id % 3 AS DOUBLE) AS attr
       FROM {pois} WHERE value = '{hotspot.HUFF_VALUE}'),
w AS (SELECT ctr.cx, ctr.cy, ctr.n, pj.poi_id,
        CAST(floor(attr / ((clon - lon) * (clon - lon) + (clat - lat) * (clat - lat) + {hotspot.HUFF_SOFT!r}) * {hotspot.HUFF_FP!r} + 0.5) AS BIGINT) AS wfp
      FROM ctr CROSS JOIN pj),
sw AS (SELECT cx, cy, CAST(sum(wfp) AS BIGINT) AS sw FROM w GROUP BY 1, 2)
SELECT w.cx, w.cy, w.poi_id, w.n AS n_events,
       round(CAST(wfp AS DOUBLE) / CAST(sw.sw AS DOUBLE), 6) AS prob,
       round(CAST(w.n * wfp AS DOUBLE) / CAST(sw.sw AS DOUBLE), 6) AS expected
FROM w JOIN sw ON w.cx = sw.cx AND w.cy = sw.cy""",
        "knox_statistic": f"""
WITH {_epts},
s AS (SELECT count(*) AS n_space,
        CAST(sum(CASE WHEN abs(epoch_us(b.ts) - epoch_us(a.ts)) <= {hotspot.KNOX_TAU_US} THEN 1 ELSE 0 END) AS BIGINT) AS n_st
      FROM epts a JOIN epts b ON a.event_id < b.event_id
      AND b.lon >= a.lon - {hotspot.KNOX_R!r} AND b.lon <= a.lon + {hotspot.KNOX_R!r}
      AND b.lat >= a.lat - {hotspot.KNOX_R!r} AND b.lat <= a.lat + {hotspot.KNOX_R!r}
      AND (b.lon - a.lon) * (b.lon - a.lon) + (b.lat - a.lat) * (b.lat - a.lat) <= {hotspot.KNOX_R!r} * {hotspot.KNOX_R!r}),
t AS (SELECT count(*) AS n_time FROM epts a JOIN epts b ON a.event_id < b.event_id
      AND epoch_us(b.ts) >= epoch_us(a.ts) - {hotspot.KNOX_TAU_US}
      AND epoch_us(b.ts) <= epoch_us(a.ts) + {hotspot.KNOX_TAU_US}),
c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM epts)
SELECT n * (n - 1) // 2 AS n_pairs, CAST(n_space AS BIGINT) AS n_space,
       CAST(n_time AS BIGINT) AS n_time, n_st AS n_spacetime,
       round(CAST(n_space AS DOUBLE) * CAST(n_time AS DOUBLE) / CAST(n * (n - 1) // 2 AS DOUBLE), 6) AS expected,
       round(CAST(n_st AS DOUBLE) / (CAST(n_space AS DOUBLE) * CAST(n_time AS DOUBLE) / CAST(n * (n - 1) // 2 AS DOUBLE)), 6) AS knox_ratio
FROM s CROSS JOIN t CROSS JOIN c""",
        "semivariogram": f"""
WITH ec AS (
  SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events),
c AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sc
      FROM ec GROUP BY 1, 2),
m AS (SELECT cx, cy, CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS z FROM c),
p AS (SELECT CAST(floor(sqrt(CAST((a.cx - b.cx) * (a.cx - b.cx) + (a.cy - b.cy) * (a.cy - b.cy) AS DOUBLE))) AS BIGINT) AS lag,
             CAST(floor((a.z - b.z) * (a.z - b.z) * {hotspot.VAR_FP!r} + 0.5) AS BIGINT) AS fp
      FROM m a JOIN m b ON a.cx < b.cx OR (a.cx = b.cx AND a.cy < b.cy)),
g AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs, CAST(sum(fp) AS BIGINT) AS sfp
      FROM p WHERE lag >= 1 GROUP BY lag)
SELECT lag, n_pairs,
       round((CAST(sfp AS DOUBLE) / {hotspot.VAR_FP!r}) / (2.0 * CAST(n_pairs AS DOUBLE)), 6) AS gamma
FROM g""",
        # mirrors hotspot.anisotropy_variogram: orientation-invariant
        # integer sector rules on top of the same pair census
        "anisotropy_variogram": f"""
WITH ec AS (
  SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events),
c AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sc
      FROM ec GROUP BY 1, 2),
m AS (SELECT cx, cy, CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS z FROM c),
p AS (SELECT b.cx - a.cx AS dx, b.cy - a.cy AS dy,
             CAST(floor(sqrt(CAST((a.cx - b.cx) * (a.cx - b.cx) + (a.cy - b.cy) * (a.cy - b.cy) AS DOUBLE))) AS BIGINT) AS lag,
             CAST(floor((a.z - b.z) * (a.z - b.z) * {hotspot.VAR_FP!r} + 0.5) AS BIGINT) AS fp
      FROM m a JOIN m b ON a.cx < b.cx OR (a.cx = b.cx AND a.cy < b.cy)),
d AS (SELECT CASE WHEN 2 * abs(dy) <= abs(dx) THEN 'EW'
                  WHEN 2 * abs(dx) <= abs(dy) THEN 'NS'
                  WHEN dx * dy > 0 THEN 'NE' ELSE 'NW' END AS direction,
             lag, fp
      FROM p WHERE lag >= 1),
g AS (SELECT direction, lag, CAST(count(*) AS BIGINT) AS n_pairs, CAST(sum(fp) AS BIGINT) AS sfp
      FROM d GROUP BY 1, 2)
SELECT direction, lag, n_pairs,
       round((CAST(sfp AS DOUBLE) / {hotspot.VAR_FP!r}) / (2.0 * CAST(n_pairs AS DOUBLE)), 6) AS gamma
FROM g""",
        "emerging_hotspots": f"""
WITH ec AS (
  SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy,
         CAST(floor(epoch_us(ts) / {hotspot.DAY_US}) AS BIGINT) AS day
  FROM events),
d AS (SELECT cx, cy, day, CAST(count(*) AS BIGINT) AS y FROM ec GROUP BY 1, 2, 3),
gm AS (SELECT day, CAST(sum(y) AS DOUBLE) AS tot, CAST(sum(y * y) AS DOUBLE) AS ssq FROM d GROUP BY 1),
offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
scat AS (
  SELECT cx + dx AS cx, cy + dy AS cy, day, y FROM d, offs
  WHERE cx + dx BETWEEN 0 AND {hotspot.GI_GX - 1} AND cy + dy BETWEEN 0 AND {hotspot.GI_GY - 1}),
nbr AS (SELECT cx, cy, day, CAST(sum(y) AS BIGINT) AS nbr_sum FROM scat GROUP BY 1, 2, 3),
wct AS (
  SELECT cx, cy, day, nbr_sum,
         (least(cx + 1, {hotspot.GI_GX - 1}) - greatest(cx - 1, 0) + 1)
         * (least(cy + 1, {hotspot.GI_GY - 1}) - greatest(cy - 1, 0) + 1) AS w
  FROM nbr),
zt AS (
  SELECT wct.cx, wct.cy, wct.day,
         round((CAST(nbr_sum AS DOUBLE) - (gm.tot / {float(hotspot.GI_NCELLS)!r}) * CAST(w AS DOUBLE))
               / (sqrt(gm.ssq / {float(hotspot.GI_NCELLS)!r}
                       - (gm.tot / {float(hotspot.GI_NCELLS)!r}) * (gm.tot / {float(hotspot.GI_NCELLS)!r}))
                  * sqrt(({float(hotspot.GI_NCELLS)!r} * CAST(w AS DOUBLE) - CAST(w AS DOUBLE) * CAST(w AS DOUBLE))
                         / {float(hotspot.GI_NCELLS - 1)!r})), 6) AS z
  FROM wct JOIN gm ON gm.day = wct.day),
nd AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n_days,
              CAST(sum(CASE WHEN z >= {hotspot.EHS_HOT_Z!r} THEN 1 ELSE 0 END) AS BIGINT) AS hot_days
       FROM zt GROUP BY 1, 2 HAVING count(*) >= {hotspot.TREND_MIN_DAYS}),
lastz AS (SELECT cx, cy, z AS last_z FROM (
            SELECT cx, cy, z, row_number() OVER (PARTITION BY cx, cy ORDER BY day DESC) AS rk FROM zt)
          WHERE rk = 1),
p AS (SELECT a.cx, a.cy,
        CAST(sum(CASE WHEN b.z > a.z THEN 1 WHEN b.z < a.z THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM zt a JOIN zt b ON a.cx = b.cx AND a.cy = b.cy AND b.day > a.day GROUP BY 1, 2),
ties AS (SELECT cx, cy, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
         FROM (SELECT cx, cy, z, CAST(count(*) AS BIGINT) AS t FROM zt GROUP BY 1, 2, 3)
         GROUP BY 1, 2),
mk AS (SELECT nd.cx, nd.cy, nd.n_days, nd.hot_days, p.s,
        CASE WHEN nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5) - ties.tt > 0 AND p.s <> 0
             THEN round((p.s - sign(p.s))
                        / sqrt((nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5) - ties.tt) / 18.0), 6)
             ELSE 0.0 END AS mk_z
       FROM nd JOIN p ON p.cx = nd.cx AND p.cy = nd.cy
       JOIN ties ON ties.cx = nd.cx AND ties.cy = nd.cy)
SELECT mk.cx, mk.cy, mk.n_days, mk.hot_days, l.last_z, mk.s AS mk_s, mk.mk_z,
       CASE WHEN l.last_z >= {hotspot.EHS_HOT_Z!r} THEN
              CASE WHEN mk.mk_z > {hotspot.EHS_TREND_Z!r} THEN 'intensifying_hot'
                   WHEN mk.mk_z < -{hotspot.EHS_TREND_Z!r} THEN 'diminishing_hot'
                   WHEN CAST(mk.hot_days AS DOUBLE) >= {hotspot.EHS_PERSIST!r} * CAST(mk.n_days AS DOUBLE) THEN 'persistent_hot'
                   ELSE 'sporadic_hot' END
            WHEN mk.hot_days > 0 THEN 'historical_hot'
            ELSE 'none' END AS category
FROM mk JOIN lastz l ON l.cx = mk.cx AND l.cy = mk.cy""",
        "mann_kendall_cells": f"""
WITH ec AS (
  SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy,
         CAST(floor(epoch_us(ts) / {hotspot.DAY_US}) AS BIGINT) AS day
  FROM events),
d AS (SELECT cx, cy, day, CAST(count(*) AS BIGINT) AS y FROM ec GROUP BY 1, 2, 3),
nd AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n_days FROM d GROUP BY 1, 2
       HAVING count(*) >= {hotspot.TREND_MIN_DAYS}),
p AS (SELECT a.cx, a.cy,
        CAST(sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM d a JOIN d b ON a.cx = b.cx AND a.cy = b.cy AND b.day > a.day GROUP BY 1, 2),
ties AS (SELECT cx, cy, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
         FROM (SELECT cx, cy, y, CAST(count(*) AS BIGINT) AS t FROM d GROUP BY 1, 2, 3)
         GROUP BY 1, 2)
SELECT nd.cx, nd.cy, nd.n_days, p.s AS mk_s,
       CASE WHEN nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5) - ties.tt > 0 AND p.s <> 0
            THEN round((p.s - sign(p.s))
                       / sqrt((nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5) - ties.tt) / 18.0), 6)
            ELSE 0.0 END AS mk_z
FROM nd JOIN p ON nd.cx = p.cx AND nd.cy = p.cy
JOIN ties ON nd.cx = ties.cx AND nd.cy = ties.cy""",
        "eb_shrunk_rates": f"""
WITH ec AS (
  SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
  FROM events),
c AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS x
      FROM ec GROUP BY 1, 2),
g AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(x) AS BIGINT) AS xt FROM c)
SELECT cx, cy, n, x,
       round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
       round((CAST(x AS DOUBLE) + {hotspot.EB_PRIOR_M!r} * (CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE)))
             / (CAST(n AS DOUBLE) + {hotspot.EB_PRIOR_M!r}), 6) AS shrunk_rate
FROM c CROSS JOIN g""",
        "benford_audit": """
WITH v AS (SELECT CAST(floor(l_extendedprice) AS BIGINT) AS x FROM lineitem),
d AS (SELECT CAST(substr(CAST(x AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM v),
c AS (SELECT dg.digit, CAST(count(d.digit) AS BIGINT) AS n
      FROM (SELECT unnest(generate_series(1, 9)) AS digit) dg
      LEFT JOIN d ON d.digit = dg.digit GROUP BY dg.digit),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM c)
SELECT digit, n,
       round(CAST(n AS DOUBLE) / tot, 6) AS obs_frac,
       round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6) AS exp_frac,
       round(pow(CAST(n AS DOUBLE) - tot * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)), 2)
             / (tot * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))), 6) AS chi2_term
FROM c CROSS JOIN t""",
        "ks_weekend_test": """
WITH e AS (SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
                  CASE WHEN (epoch_us(ts) // 86400000000) % 7 IN (2, 3) THEN 1 ELSE 0 END AS we
           FROM events),
c AS (SELECT cents, CAST(sum(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT) AS wd,
             CAST(sum(we) AS BIGINT) AS wee FROM e GROUP BY cents),
t AS (SELECT CAST(sum(wd) AS BIGINT) AS m, CAST(sum(wee) AS BIGINT) AS n FROM c),
cum AS (SELECT cents,
          CAST(sum(wd) OVER (ORDER BY cents) AS BIGINT) AS cwd,
          CAST(sum(wee) OVER (ORDER BY cents) AS BIGINT) AS cwe
        FROM c),
d AS (SELECT cum.cents, abs(cum.cwe * t.m - cum.cwd * t.n) AS dn FROM cum CROSS JOIN t),
best AS (SELECT cents, dn FROM d ORDER BY dn DESC, cents LIMIT 1)
SELECT t.m AS n_weekday, t.n AS n_weekend,
       round(CAST(best.dn AS DOUBLE) / (CAST(t.m AS DOUBLE) * CAST(t.n AS DOUBLE)), 6) AS d_stat,
       round(least(1.0, 2.0 * exp(-2.0
             * (CAST(best.dn AS DOUBLE) / (CAST(t.m AS DOUBLE) * CAST(t.n AS DOUBLE)))
             * (CAST(best.dn AS DOUBLE) / (CAST(t.m AS DOUBLE) * CAST(t.n AS DOUBLE)))
             * (t.m * t.n / CAST(t.m + t.n AS DOUBLE)))), 6) AS ks_p,
       best.cents AS at_cents
FROM best CROSS JOIN t""",
        "hbos_outliers": f"""
WITH f AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
                  CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS disc_cents,
                  CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) // {stats.HBOS_PRICE_BIN_CENTS} AS price_bin
           FROM lineitem),
c AS (SELECT qty, disc_cents, price_bin, CAST(count(*) AS BIGINT) AS n_rows
      FROM f GROUP BY 1, 2, 3),
mq AS (SELECT qty, CAST(sum(n_rows) AS BIGINT) AS n_qty FROM c GROUP BY 1),
md AS (SELECT disc_cents, CAST(sum(n_rows) AS BIGINT) AS n_disc FROM c GROUP BY 1),
mp AS (SELECT price_bin, CAST(sum(n_rows) AS BIGINT) AS n_price FROM c GROUP BY 1)
SELECT c.qty, c.disc_cents, c.price_bin, c.n_rows, mq.n_qty, md.n_disc, mp.n_price,
       CAST(CAST(mq.n_qty AS HUGEINT) * md.n_disc * mp.n_price AS BIGINT) AS score
FROM c JOIN mq USING (qty) JOIN md USING (disc_cents) JOIN mp USING (price_bin)
ORDER BY score, c.qty, c.disc_cents, c.price_bin LIMIT {stats.HBOS_TOPK}""",
        "interpurchase_intervals": """
WITH o AS (SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day,
                  lag(epoch_us(o_orderdate) // 86400000000)
                    OVER (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate), o_orderkey) AS pday
           FROM orders),
g AS (SELECT (day - pday) // 7 AS week_bucket FROM o WHERE pday IS NOT NULL),
c AS (SELECT week_bucket, CAST(count(*) AS BIGINT) AS n_gaps FROM g GROUP BY week_bucket),
t AS (SELECT CAST(sum(n_gaps) AS DOUBLE) AS tot FROM c)
SELECT week_bucket, n_gaps, round(CAST(n_gaps AS DOUBLE) / tot, 6) AS frac
FROM c CROSS JOIN t ORDER BY week_bucket""",
        "peak_concurrency": """
WITH lagd AS (
  SELECT user_id, ts, event_id, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events),
flags AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM lagd),
sess AS (
  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM flags),
sw AS (SELECT user_id, session_id, epoch_us(min(ts)) AS s0, epoch_us(max(ts)) AS s1
       FROM sess GROUP BY 1, 2),
b AS (SELECT s0 AS tus, 1 AS delta FROM sw UNION ALL SELECT s1 AS tus, -1 AS delta FROM sw),
run AS (SELECT tus, CAST(sum(delta) OVER (ORDER BY tus, delta DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
        FROM b),
pk AS (SELECT max(conc) AS peak FROM run)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM sw) AS n_sessions,
       pk.peak AS peak,
       (SELECT min(tus) FROM run WHERE conc = pk.peak) AS at_us
FROM pk""",
        "expectations_audit": f"""
WITH f AS (SELECT
  CASE WHEN l_quantity >= 1.0 AND l_quantity <= 50.0 THEN 1 ELSE 0 END AS r1,
  CASE WHEN l_discount >= 0.0 AND l_discount <= 0.10 THEN 1 ELSE 0 END AS r2,
  CASE WHEN l_tax >= 0.0 THEN 1 ELSE 0 END AS r3,
  CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 1 ELSE 0 END AS r4,
  CASE WHEN l_shipdate IS NOT NULL THEN 1 ELSE 0 END AS r5,
  CASE WHEN l_extendedprice > 0.0 THEN 1 ELSE 0 END AS r6
  FROM lineitem),
a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r1) AS BIGINT) AS p1, CAST(sum(r2) AS BIGINT) AS p2,
             CAST(sum(r3) AS BIGINT) AS p3, CAST(sum(r4) AS BIGINT) AS p4,
             CAST(sum(r5) AS BIGINT) AS p5, CAST(sum(r6) AS BIGINT) AS p6
      FROM f)
SELECT r.rule_id, r.rule, a.n AS n_rows,
       CASE r.rule_id WHEN 1 THEN p1 WHEN 2 THEN p2 WHEN 3 THEN p3
            WHEN 4 THEN p4 WHEN 5 THEN p5 ELSE p6 END AS n_pass,
       a.n - CASE r.rule_id WHEN 1 THEN p1 WHEN 2 THEN p2 WHEN 3 THEN p3
            WHEN 4 THEN p4 WHEN 5 THEN p5 ELSE p6 END AS n_fail
FROM (VALUES {", ".join(f"({i}, '{r}')" for i, r in stats.EXPECT_RULES)}) AS r(rule_id, rule)
CROSS JOIN a ORDER BY r.rule_id""",
        "neyman_allocation": f"""
WITH e AS (SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM events),
s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2
      FROM e GROUP BY event_type),
w AS (SELECT event_type, n,
        sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS sd
      FROM s),
t AS (SELECT sum(CAST(n AS DOUBLE) * sd) AS tot FROM w)
SELECT event_type, n AS n_rows, round(sd, 6) AS stddev_cents,
       round(CAST(n AS DOUBLE) * sd, 6) AS weight,
       CAST(floor({stats.NEYMAN_BUDGET} * (CAST(n AS DOUBLE) * sd) / t.tot + 0.5) AS BIGINT) AS n_alloc
FROM w CROSS JOIN t ORDER BY event_type""",
        "cohort_ltv": """
WITH o AS (SELECT o_custkey AS cust,
                  CAST(date_part('year', o_orderdate) * 12 + date_part('month', o_orderdate) - 1 AS BIGINT) AS em,
                  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
           FROM orders),
f AS (SELECT cust, min(em) AS cohort_em FROM o GROUP BY cust),
jx AS (SELECT o.cust, f.cohort_em, o.em - f.cohort_em AS age, o.cents
       FROM o JOIN f USING (cust)),
a AS (SELECT cohort_em, age, CAST(count(DISTINCT cust) AS BIGINT) AS n_customers,
             CAST(sum(cents) AS BIGINT) AS revenue_cents
      FROM jx GROUP BY cohort_em, age)
SELECT cohort_em AS cohort_month, age AS age_months, n_customers, revenue_cents,
       CAST(sum(revenue_cents) OVER (PARTITION BY cohort_em ORDER BY age
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents
FROM a ORDER BY cohort_month, age_months""",
        "runs_test": """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY day),
m AS (SELECT quantile_disc(cents, 0.5) AS med FROM (SELECT cents FROM d)),
s AS (SELECT day, CASE WHEN cents > (SELECT med FROM m) THEN 1 ELSE 0 END AS ab FROM d),
lagd AS (SELECT ab, lag(ab) OVER (ORDER BY day) AS pab FROM s),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(ab) AS BIGINT) AS n1,
               CAST(1 + sum(CASE WHEN pab IS NOT NULL AND ab <> pab THEN 1 ELSE 0 END) AS BIGINT) AS r
        FROM lagd)
SELECT n AS n_days, n1 AS n_above, n - n1 AS n_below, r AS n_runs,
       round((CAST(r AS DOUBLE) - (1.0 + 2.0 * n1 * (n - n1) / CAST(n AS DOUBLE)))
             / sqrt(2.0 * n1 * (n - n1) * (2.0 * n1 * (n - n1) - n)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6) AS z
FROM agg""",
        "ship_delay_quantiles": """
WITH fs AS (SELECT l_orderkey, min(epoch_us(l_shipdate) // 86400000000) AS sday
            FROM lineitem GROUP BY l_orderkey),
d AS (SELECT o.o_orderpriority, fs.sday - epoch_us(o.o_orderdate) // 86400000000 AS delay
      FROM orders o JOIN fs ON fs.l_orderkey = o.o_orderkey),
a AS (SELECT o_orderpriority,
        CAST(quantile_disc(delay, 0.5) AS BIGINT) AS p50,
        CAST(quantile_disc(delay, 0.9) AS BIGINT) AS p90,
        CAST(quantile_disc(delay, 0.99) AS BIGINT) AS p99
      FROM d GROUP BY o_orderpriority)
SELECT o_orderpriority, 0.5 AS q, p50 AS delay_days FROM a
UNION ALL SELECT o_orderpriority, 0.9, p90 FROM a
UNION ALL SELECT o_orderpriority, 0.99, p99 FROM a""",
        "supplier_ontime_wilson": f"""
WITH j AS (SELECT l.l_suppkey,
             CASE WHEN epoch_us(l.l_shipdate) // 86400000000
                       - epoch_us(o.o_orderdate) // 86400000000 <= {relational.ONTIME_DAYS}
                  THEN 1 ELSE 0 END AS ontime
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
a AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(ontime) AS BIGINT) AS n_ontime
      FROM j GROUP BY l_suppkey),
w AS (SELECT *, CAST(n_ontime AS DOUBLE) / CAST(n_lines AS DOUBLE) AS p,
        CAST(n_lines AS DOUBLE) AS nd FROM a)
SELECT l_suppkey, n_lines, n_ontime, round(p, 6) AS rate,
       round((p + {relational.WILSON_Z}*{relational.WILSON_Z} / (2.0 * nd)
              - {relational.WILSON_Z} * sqrt(p * (1.0 - p) / nd
                    + {relational.WILSON_Z}*{relational.WILSON_Z} / (4.0 * nd * nd)))
             / (1.0 + {relational.WILSON_Z}*{relational.WILSON_Z} / nd), 6) AS wilson_lo
FROM w ORDER BY wilson_lo DESC, l_suppkey LIMIT 15""",
        "mann_whitney_u": """
WITH e AS (SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
                  CASE WHEN (epoch_us(ts) // 86400000000) % 7 IN (2, 3) THEN 1 ELSE 0 END AS we
           FROM events),
c AS (SELECT cents, CAST(sum(1 - we) AS HUGEINT) AS wd, CAST(sum(we) AS HUGEINT) AS wee
      FROM e GROUP BY cents),
cum AS (SELECT cents, wd, wee, wd + wee AS tv,
          coalesce(sum(wd + wee) OVER (ORDER BY cents
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        FROM c),
t AS (SELECT CAST(sum(wd) AS HUGEINT) AS m, CAST(sum(wee) AS HUGEINT) AS n,
             CAST(sum(wee * (2 * cb + tv + 1)) AS HUGEINT) AS r2,
             CAST(sum(tv * tv * tv - tv) AS HUGEINT) AS tie
      FROM cum)
SELECT CAST(m AS BIGINT) AS n_weekday, CAST(n AS BIGINT) AS n_weekend,
       CAST(r2 - n * (n + 1) AS BIGINT) AS u2_weekend,
       round((CAST(r2 - n * (n + 1) AS DOUBLE) / 2.0
              - CAST(m AS DOUBLE) * CAST(n AS DOUBLE) / 2.0)
             / sqrt(CAST(m AS DOUBLE) * CAST(n AS DOUBLE) / 12.0
                    * (CAST(m + n + 1 AS DOUBLE)
                       - CAST(tie AS DOUBLE)
                         / (CAST(m + n AS DOUBLE) * CAST(m + n - 1 AS DOUBLE)))), 6) AS z
FROM t""",
        "kmv_overlap_eval": f"""
WITH m AS (SELECT DISTINCT CASE WHEN event_type = '{stats.KMVO_SET_A}' THEN 1 ELSE 0 END AS s, user_id
           FROM events WHERE event_type IN ('{stats.KMVO_SET_A}', '{stats.KMVO_SET_B}')),
a AS (SELECT user_id FROM m WHERE s = 1), b AS (SELECT user_id FROM m WHERE s = 0),
ha AS (SELECT md5(CAST(user_id AS VARCHAR)) AS h FROM a),
hb AS (SELECT md5(CAST(user_id AS VARCHAR)) AS h FROM b),
hu AS (SELECT h FROM ha UNION SELECT h FROM hb),
ea AS (SELECT CASE WHEN count(*) <= {stats.KMVO_K} THEN CAST(count(*) AS DOUBLE)
               ELSE ({stats.KMVO_K} - 1) / (CAST(CAST(concat('0x', substr(min(CASE WHEN rn = {stats.KMVO_K} THEN h END), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0)
             END AS v
       FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ha)),
eb AS (SELECT CASE WHEN count(*) <= {stats.KMVO_K} THEN CAST(count(*) AS DOUBLE)
               ELSE ({stats.KMVO_K} - 1) / (CAST(CAST(concat('0x', substr(min(CASE WHEN rn = {stats.KMVO_K} THEN h END), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0)
             END AS v
       FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hb)),
eu AS (SELECT CASE WHEN count(*) <= {stats.KMVO_K} THEN CAST(count(*) AS DOUBLE)
               ELSE ({stats.KMVO_K} - 1) / (CAST(CAST(concat('0x', substr(min(CASE WHEN rn = {stats.KMVO_K} THEN h END), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0)
             END AS v
       FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hu)),
x AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
             (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b,
             (SELECT CAST(count(*) AS BIGINT) FROM a JOIN b USING (user_id)) AS n_inter,
             ea.v AS est_a, eb.v AS est_b, eu.v AS est_union
      FROM ea CROSS JOIN eb CROSS JOIN eu)
SELECT n_a, n_b, n_inter, round(est_a, 6) AS est_a, round(est_b, 6) AS est_b,
       round(est_union, 6) AS est_union, round(est_a + est_b - est_union, 6) AS est_inter,
       round(abs(est_a + est_b - est_union - CAST(n_inter AS DOUBLE)), 6) AS abs_err
FROM x""",
        "tail_dependence": f"""
WITH f AS (SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
                  CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y FROM lineitem),
qs AS (SELECT CAST(count(*) AS BIGINT) AS n,
              quantile_disc(x, {stats.TAIL_Q!r}) AS qx_hi, quantile_disc(y, {stats.TAIL_Q!r}) AS qy_hi,
              quantile_disc(x, {1.0 - stats.TAIL_Q!r}) AS qx_lo, quantile_disc(y, {1.0 - stats.TAIL_Q!r}) AS qy_lo
       FROM f),
c AS (SELECT qs.n, qs.qx_hi, qs.qy_hi, qs.qx_lo, qs.qy_lo,
             CAST(count(*) FILTER (WHERE f.x > qs.qx_hi) AS BIGINT) AS n_xhi,
             CAST(count(*) FILTER (WHERE f.x > qs.qx_hi AND f.y > qs.qy_hi) AS BIGINT) AS n_joint_hi,
             CAST(count(*) FILTER (WHERE f.x <= qs.qx_lo) AS BIGINT) AS n_xlo,
             CAST(count(*) FILTER (WHERE f.x <= qs.qx_lo AND f.y <= qs.qy_lo) AS BIGINT) AS n_joint_lo
      FROM f CROSS JOIN qs
      GROUP BY qs.n, qs.qx_hi, qs.qy_hi, qs.qx_lo, qs.qy_lo)
SELECT n, qx_hi, qy_hi, n_xhi, n_joint_hi,
       round(CAST(n_joint_hi AS DOUBLE) / CAST(greatest(n_xhi, 1) AS DOUBLE), 6) AS lambda_upper,
       qx_lo, qy_lo, n_xlo, n_joint_lo,
       round(CAST(n_joint_lo AS DOUBLE) / CAST(greatest(n_xlo, 1) AS DOUBLE), 6) AS lambda_lower
FROM c""",
        "mutual_info_rank": """
WITH f AS (
  SELECT 'quantity5' AS feature, CAST(floor(l_quantity + 0.5) AS BIGINT) // 5 AS b, l_returnflag AS y FROM lineitem
  UNION ALL
  SELECT 'discount_pct', CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT), l_returnflag FROM lineitem
  UNION ALL
  SELECT 'ship_month', CAST(month(l_shipdate) AS BIGINT), l_returnflag FROM lineitem),
c AS (SELECT feature, b, y, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1, 2, 3),
nx AS (SELECT feature, b, CAST(sum(n) AS BIGINT) AS nx FROM c GROUP BY 1, 2),
ny AS (SELECT feature, y, CAST(sum(n) AS BIGINT) AS ny FROM c GROUP BY 1, 2),
nt AS (SELECT feature, CAST(sum(n) AS BIGINT) AS nt FROM c GROUP BY 1),
bb AS (SELECT feature, CAST(count(DISTINCT b) AS BIGINT) AS n_bins FROM c GROUP BY 1)
SELECT c.feature, bb.n_bins,
       round(sum((CAST(c.n AS DOUBLE) / nt.nt)
                 * ln(CAST(nt.nt AS DOUBLE) * c.n / (CAST(nx.nx AS DOUBLE) * ny.ny))), 6) AS mi_nats
FROM c
JOIN nx ON nx.feature = c.feature AND nx.b = c.b
JOIN ny ON ny.feature = c.feature AND ny.y = c.y
JOIN nt ON nt.feature = c.feature
JOIN bb ON bb.feature = c.feature
GROUP BY c.feature, bb.n_bins""",
        "conformal_interval": """
WITH f AS (SELECT CAST(floor(l_quantity + 0.5) AS HUGEINT) AS x1,
                  CAST(floor(l_discount * 100.0 + 0.5) AS HUGEINT) AS x2,
                  CAST(floor(l_extendedprice + 0.5) AS HUGEINT) AS y
           FROM lineitem),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
             sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
             sum(x1*y) AS s1y, sum(x2*y) AS s2y FROM f),
d AS (SELECT *,
             n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det,
             sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y) AS det0,
             n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS det1,
             n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2) AS det2
      FROM s),
b AS (SELECT CAST(n AS BIGINT) AS n,
             CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) AS b0,
             CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) AS b1,
             CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) AS b2 FROM d),
r AS (SELECT CAST(floor(abs(CAST(f.y AS DOUBLE) - (b.b0 + b.b1 * CAST(f.x1 AS DOUBLE) + b.b2 * CAST(f.x2 AS DOUBLE))) * 100.0 + 0.5) AS BIGINT) AS rc
      FROM f CROSS JOIN b),
k AS (SELECT least(n, CAST(ceil((n + 1) * 0.9) AS BIGINT)) AS rank, n FROM b),
q AS (SELECT rc AS q_cents FROM (SELECT rc, row_number() OVER (ORDER BY rc) AS rn FROM r) t
      WHERE rn = (SELECT rank FROM k)),
w AS (SELECT CAST(count(*) AS BIGINT) AS n_within FROM r CROSS JOIN q WHERE r.rc <= q.q_cents)
SELECT b.n, round(b.b0, 6) AS b0, round(b.b1, 6) AS b1, round(b.b2, 6) AS b2,
       q.q_cents, w.n_within,
       round(CAST(w.n_within AS DOUBLE) / CAST(b.n AS DOUBLE), 6) AS coverage
FROM b CROSS JOIN q CROSS JOIN w""",
        "psi_drift": """
WITH f AS (
  SELECT 'quantity' AS feature, CAST(floor(l_quantity + 0.5) AS BIGINT) // 5 AS b,
         CASE WHEN l_shipdate >= DATE '1995-01-01' THEN 1 ELSE 0 END AS late FROM lineitem
  UNION ALL
  SELECT 'discount_pct', CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT),
         CASE WHEN l_shipdate >= DATE '1995-01-01' THEN 1 ELSE 0 END FROM lineitem
  UNION ALL
  SELECT 'price_10k', CAST(floor(l_extendedprice + 0.5) AS BIGINT) // 10000,
         CASE WHEN l_shipdate >= DATE '1995-01-01' THEN 1 ELSE 0 END FROM lineitem),
h AS (SELECT feature, b, late, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1, 2, 3),
bins AS (SELECT DISTINCT feature, b FROM h),
per AS (SELECT bins.feature, bins.b, p.late, coalesce(h.n, 0) + 1 AS n
        FROM bins CROSS JOIN (SELECT 0 AS late UNION ALL SELECT 1) p
        LEFT JOIN h ON h.feature = bins.feature AND h.b = bins.b AND h.late = p.late),
tot AS (SELECT feature, late, CAST(sum(n) AS BIGINT) AS tot FROM per GROUP BY 1, 2),
pp AS (SELECT per.feature, per.b, per.late, CAST(per.n AS DOUBLE) / CAST(tot.tot AS DOUBLE) AS p
       FROM per JOIN tot USING (feature, late)),
w AS (SELECT a.feature, a.b, a.p AS p_a, l.p AS p_b
      FROM pp a JOIN pp l ON a.feature = l.feature AND a.b = l.b AND a.late = 0 AND l.late = 1),
raw AS (SELECT feature,
               CAST(coalesce(sum(n) FILTER (WHERE late = 0), 0) AS BIGINT) AS n_early,
               CAST(coalesce(sum(n) FILTER (WHERE late = 1), 0) AS BIGINT) AS n_late
        FROM h GROUP BY 1)
SELECT w.feature, raw.n_early, raw.n_late,
       round(sum((w.p_a - w.p_b) * ln(w.p_a / w.p_b)), 6) AS psi
FROM w JOIN raw ON raw.feature = w.feature
GROUP BY w.feature, raw.n_early, raw.n_late""",
        "decision_stump": """
WITH f AS (
  SELECT 'quantity' AS feature, CAST(floor(l_quantity + 0.5) AS BIGINT) AS v,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM lineitem
  UNION ALL
  SELECT 'discount_pct', CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT),
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END FROM lineitem
  UNION ALL
  SELECT 'ship_month', CAST(month(l_shipdate) AS BIGINT),
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END FROM lineitem),
g AS (SELECT feature, v, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
      FROM f GROUP BY 1, 2),
c AS (SELECT feature, v,
             CAST(sum(n) OVER w AS BIGINT) AS n_le,
             CAST(sum(pos) OVER w AS BIGINT) AS pos_le,
             CAST(sum(n) OVER (PARTITION BY feature) AS BIGINT) AS n_tot,
             CAST(sum(pos) OVER (PARTITION BY feature) AS BIGINT) AS pos_tot
      FROM g WINDOW w AS (PARTITION BY feature ORDER BY v)),
s AS (SELECT feature, v AS threshold, n_le, pos_le, n_tot - n_le AS n_gt, pos_tot - pos_le AS pos_gt, n_tot
      FROM c WHERE n_le > 0 AND n_le < n_tot),
e AS (SELECT feature, threshold, n_le, pos_le, n_gt, pos_gt,
             round((CAST(n_le AS DOUBLE) / CAST(n_tot AS DOUBLE))
                   * (1.0 - pow(CAST(pos_le AS DOUBLE) / CAST(n_le AS DOUBLE), 2)
                          - pow(CAST(n_le - pos_le AS DOUBLE) / CAST(n_le AS DOUBLE), 2))
                 + (CAST(n_gt AS DOUBLE) / CAST(n_tot AS DOUBLE))
                   * (1.0 - pow(CAST(pos_gt AS DOUBLE) / CAST(n_gt AS DOUBLE), 2)
                          - pow(CAST(n_gt - pos_gt AS DOUBLE) / CAST(n_gt AS DOUBLE), 2)), 6) AS gini
      FROM s),
r AS (SELECT *, row_number() OVER (PARTITION BY feature ORDER BY gini, threshold) AS rk FROM e)
SELECT feature, threshold, n_le, pos_le, n_gt, pos_gt, gini FROM r WHERE rk = 1""",
        "mediation_analysis": """
WITH f AS (SELECT CAST(floor(l_discount * 100.0 + 0.5) AS HUGEINT) AS x,
                  CAST(floor(l_quantity + 0.5) AS HUGEINT) AS m,
                  CAST(floor(l_extendedprice + 0.5) AS HUGEINT) AS y
           FROM lineitem),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(m) AS sm, sum(y) AS sy,
             sum(x*x) AS sxx, sum(x*m) AS sxm, sum(x*y) AS sxy,
             sum(m*m) AS smm, sum(m*y) AS smy FROM f),
d AS (SELECT *,
             n*(sxx*smm - sxm*sxm) - sx*(sx*smm - sxm*sm) + sm*(sx*sxm - sxx*sm) AS det,
             n*(sxy*smm - sxm*smy) - sy*(sx*smm - sxm*sm) + sm*(sx*smy - sxy*sm) AS det_c,
             n*(sxx*smy - sxy*sxm) - sx*(sx*smy - sxy*sm) + sy*(sx*sxm - sxx*sm) AS det_b
      FROM s),
b AS (SELECT CAST(n AS BIGINT) AS n,
             CAST(n*sxm - sx*sm AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS a,
             CAST(det_b AS DOUBLE) / CAST(det AS DOUBLE) AS b,
             CAST(det_c AS DOUBLE) / CAST(det AS DOUBLE) AS c_prime,
             CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS total
      FROM d)
SELECT n, round(a, 6) AS a, round(b, 6) AS b, round(c_prime, 6) AS c_prime,
       round(total, 6) AS total, round(a * b, 6) AS indirect
FROM b""",
        "capture_recapture": f"""
WITH f AS (SELECT user_id,
                  CAST(max(CASE WHEN epoch_us(ts) < {stats.CR_SPLIT_US} THEN 1 ELSE 0 END) AS BIGINT) AS a,
                  CAST(max(CASE WHEN epoch_us(ts) >= {stats.CR_SPLIT_US} THEN 1 ELSE 0 END) AS BIGINT) AS b
           FROM events GROUP BY user_id),
s AS (SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(b) AS BIGINT) AS n2,
             CAST(sum(a * b) AS BIGINT) AS m FROM f)
SELECT n1, n2, m,
       round((CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0) / (CAST(m AS DOUBLE) + 1.0) - 1.0, 6) AS n_hat,
       round(sqrt((CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0)
                  * (CAST(n1 - m AS DOUBLE)) * (CAST(n2 - m AS DOUBLE))
                  / (pow(CAST(m AS DOUBLE) + 1.0, 2) * (CAST(m AS DOUBLE) + 2.0))), 6) AS se_hat
FROM s""",
        "pps_sample": """
WITH s AS (SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
                  CAST(abs(floor(s_acctbal * 100.0 + 0.5)) AS BIGINT) AS size_cents
           FROM supplier),
c AS (SELECT s_suppkey, size_cents,
             CAST(coalesce(sum(size_cents) OVER (ORDER BY s_suppkey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
             CAST(sum(size_cents) OVER (ORDER BY s_suppkey) AS BIGINT) AS cum_incl
      FROM s),
t AS (SELECT CAST(sum(size_cents) AS HUGEINT) AS total FROM s),
k AS (SELECT CAST(range AS BIGINT) AS k FROM range(10))
SELECT k.k, c.s_suppkey, c.size_cents, c.cum_before AS cum_before_cents
FROM k CROSS JOIN t JOIN c
  ON CAST(c.cum_before AS HUGEINT) * 20 <= (2 * k.k + 1) * t.total
 AND (2 * k.k + 1) * t.total < CAST(c.cum_incl AS HUGEINT) * 20""",
        "jackknife_se": f"""
WITH s AS (SELECT o_orderkey % {stats.JACK_SHARDS} AS g,
                  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sg,
                  CAST(count(*) AS BIGINT) AS ng
           FROM orders GROUP BY 1),
t AS (SELECT CAST(sum(sg) AS BIGINT) AS S, CAST(sum(ng) AS BIGINT) AS N, CAST(count(*) AS BIGINT) AS G FROM s),
l AS (SELECT CAST(t.S - s.sg AS DOUBLE) / CAST(t.N - s.ng AS DOUBLE) AS loo, t.G AS G, t.S AS S, t.N AS N
      FROM s CROSS JOIN t),
m AS (SELECT avg(loo) AS tb, G, S, N FROM l GROUP BY G, S, N)
SELECT m.N AS n,
       round(CAST(m.S AS DOUBLE) / CAST(m.N AS DOUBLE), 6) AS mean_cents,
       round(sqrt(CAST(m.G - 1 AS DOUBLE) / CAST(m.G AS DOUBLE)
                  * (SELECT sum((l2.loo - m.tb) * (l2.loo - m.tb)) FROM l l2)), 6) AS se_cents,
       m.G AS g
FROM m""",
        "simpsons_paradox": """
WITH f AS (SELECT p.p_brand,
                  CAST(floor(l.l_discount * 100.0 + 0.5) AS HUGEINT) AS x,
                  CAST(floor(l.l_quantity + 0.5) AS HUGEINT) AS y
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
s AS (SELECT p_brand, CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy
      FROM f GROUP BY 1),
g AS (SELECT sum(n) AS gn, sum(sx) AS gx, sum(sy) AS gy, sum(sxy) AS gxy FROM s),
t AS (SELECT s.p_brand, CAST(s.n AS BIGINT) AS n,
             CASE WHEN s.n * s.sxy - s.sx * s.sy > 0 THEN 1
                  WHEN s.n * s.sxy - s.sx * s.sy < 0 THEN -1 ELSE 0 END AS slope_num_sign,
             CASE WHEN g.gn * g.gxy - g.gx * g.gy > 0 THEN 1
                  WHEN g.gn * g.gxy - g.gx * g.gy < 0 THEN -1 ELSE 0 END AS global_sign
      FROM s CROSS JOIN g)
SELECT p_brand, n, CAST(slope_num_sign AS BIGINT) AS slope_num_sign,
       CAST(global_sign AS BIGINT) AS global_sign,
       CAST(CASE WHEN slope_num_sign != 0 AND slope_num_sign != global_sign THEN 1 ELSE 0 END AS BIGINT) AS reversed
FROM t""",
        "ols_regression": """
WITH f AS (SELECT l_returnflag,
                  CAST(floor(l_quantity + 0.5) AS HUGEINT) AS x1,
                  CAST(floor(l_discount * 100.0 + 0.5) AS HUGEINT) AS x2,
                  CAST(floor(l_extendedprice + 0.5) AS HUGEINT) AS y
           FROM lineitem),
s AS (SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
             sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
             sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
             sum(x1*y) AS s1y, sum(x2*y) AS s2y, sum(y*y) AS syy
      FROM f GROUP BY l_returnflag),
d AS (SELECT *,
             n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det,
             sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y) AS det0,
             n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS det1,
             n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2) AS det2
      FROM s),
b AS (SELECT *,
             CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) AS b0,
             CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) AS b1,
             CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) AS b2
      FROM d)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       round(b0, 6) AS b0, round(b1, 6) AS b1, round(b2, 6) AS b2,
       round(1.0 - (CAST(syy AS DOUBLE) - b0 * CAST(sy AS DOUBLE) - b1 * CAST(s1y AS DOUBLE) - b2 * CAST(s2y AS DOUBLE))
                   / (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS r2
FROM b""",
        "discount_elasticity": """
WITH f AS (SELECT p.p_brand,
                  CAST(floor(l.l_discount * 100.0 + 0.5) AS BIGINT) AS x,
                  CAST(floor(l.l_quantity * 100.0 + 0.5) AS BIGINT) AS y
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
s AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx,
             CAST(sum(y*y) AS BIGINT) AS syy
      FROM f GROUP BY p_brand)
SELECT p_brand, n,
       round(CAST(n*sxy - sx*sy AS DOUBLE)
             / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6) AS pearson_r
FROM s""",
        "rank_correlation": """
WITH h AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS d,
         CAST(count(*) AS HUGEINT) AS n
  FROM lineitem GROUP BY 1, 2),
rm AS (SELECT q, CAST(sum(n) AS HUGEINT) AS rn FROM h GROUP BY 1),
cm AS (SELECT d, CAST(sum(n) AS HUGEINT) AS cn FROM h GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS HUGEINT) AS nt FROM h),
rx AS (SELECT q, rn,
         2 * (SELECT coalesce(sum(rn), 0) FROM rm r2 WHERE r2.q < rm.q) + rn + 1 AS x
       FROM rm),
ry AS (SELECT d, cn,
         2 * (SELECT coalesce(sum(cn), 0) FROM cm c2 WHERE c2.d < cm.d) + cn + 1 AS y
       FROM cm),
mom AS (SELECT
  (SELECT CAST(sum(rn * x) AS HUGEINT) FROM rx) AS sx,
  (SELECT CAST(sum(cn * y) AS HUGEINT) FROM ry) AS sy,
  (SELECT CAST(sum(rn * x * x) AS HUGEINT) FROM rx) AS sxx,
  (SELECT CAST(sum(cn * y * y) AS HUGEINT) FROM ry) AS syy,
  (SELECT CAST(sum(h.n * rx.x * ry.y) AS HUGEINT)
   FROM h JOIN rx ON rx.q = h.q JOIN ry ON ry.d = h.d) AS sxy),
cd AS (SELECT
  (SELECT CAST(coalesce(sum(a.n * b.n), 0) AS HUGEINT) FROM h a JOIN h b ON b.q < a.q AND b.d < a.d) AS conc,
  (SELECT CAST(coalesce(sum(a.n * b.n), 0) AS HUGEINT) FROM h a JOIN h b ON b.q < a.q AND b.d > a.d) AS disc),
ties AS (SELECT
  (SELECT CAST(sum(rn * (rn - 1) // 2) AS HUGEINT) FROM rm) AS n1,
  (SELECT CAST(sum(cn * (cn - 1) // 2) AS HUGEINT) FROM cm) AS n2,
  (SELECT nt * (nt - 1) // 2 FROM tot) AS n0)
SELECT CAST(tot.nt AS BIGINT) AS n,
       round(CAST(tot.nt * mom.sxy - mom.sx * mom.sy AS DOUBLE)
             / (sqrt(CAST(tot.nt * mom.sxx - mom.sx * mom.sx AS DOUBLE))
                * sqrt(CAST(tot.nt * mom.syy - mom.sy * mom.sy AS DOUBLE))), 6) AS spearman_rho,
       round(CAST(cd.conc - cd.disc AS DOUBLE)
             / (sqrt(CAST(ties.n0 - ties.n1 AS DOUBLE)) * sqrt(CAST(ties.n0 - ties.n2 AS DOUBLE))), 6) AS kendall_tau
FROM tot CROSS JOIN mom CROSS JOIN cd CROSS JOIN ties""",
        "lineitem_corr_matrix": """
WITH f AS (SELECT CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS q,
                  CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS p,
                  CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS d,
                  CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT) AS t FROM lineitem),
s AS (SELECT count(*) AS n,
             sum(q) AS sq, sum(p) AS sp, sum(d) AS sd, sum(t) AS st,
             sum(q*q) AS sqq, sum(q*p) AS sqp, sum(q*d) AS sqd, sum(q*t) AS sqt,
             sum(p*p) AS spp, sum(p*d) AS spd, sum(p*t) AS spt,
             sum(d*d) AS sdd, sum(d*t) AS sdt, sum(t*t) AS stt FROM f)
SELECT * FROM (
  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, CAST(n AS BIGINT) AS n,
         round(CAST(n*sqp - sq*sp AS DOUBLE) / sqrt(CAST(n*sqq - sq*sq AS DOUBLE) * CAST(n*spp - sp*sp AS DOUBLE)), 6) AS pearson_r FROM s
  UNION ALL
  SELECT 'l_quantity', 'l_discount', CAST(n AS BIGINT),
         round(CAST(n*sqd - sq*sd AS DOUBLE) / sqrt(CAST(n*sqq - sq*sq AS DOUBLE) * CAST(n*sdd - sd*sd AS DOUBLE)), 6) FROM s
  UNION ALL
  SELECT 'l_quantity', 'l_tax', CAST(n AS BIGINT),
         round(CAST(n*sqt - sq*st AS DOUBLE) / sqrt(CAST(n*sqq - sq*sq AS DOUBLE) * CAST(n*stt - st*st AS DOUBLE)), 6) FROM s
  UNION ALL
  SELECT 'l_extendedprice', 'l_discount', CAST(n AS BIGINT),
         round(CAST(n*spd - sp*sd AS DOUBLE) / sqrt(CAST(n*spp - sp*sp AS DOUBLE) * CAST(n*sdd - sd*sd AS DOUBLE)), 6) FROM s
  UNION ALL
  SELECT 'l_extendedprice', 'l_tax', CAST(n AS BIGINT),
         round(CAST(n*spt - sp*st AS DOUBLE) / sqrt(CAST(n*spp - sp*sp AS DOUBLE) * CAST(n*stt - st*st AS DOUBLE)), 6) FROM s
  UNION ALL
  SELECT 'l_discount', 'l_tax', CAST(n AS BIGINT),
         round(CAST(n*sdt - sd*st AS DOUBLE) / sqrt(CAST(n*sdd - sd*sd AS DOUBLE) * CAST(n*stt - st*st AS DOUBLE)), 6) FROM s
)""",
        "acf_hourly": """
WITH e AS (SELECT epoch_us(ts) // 3600000000 AS h FROM events),
c AS (SELECT h, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY h),
b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
g AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
dense AS (SELECT g.h, coalesce(c.n, 0) AS n FROM g LEFT JOIN c ON g.h = c.h),
s AS (SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(n) AS BIGINT) AS tot FROM dense),
dev AS (SELECT h, n * nn - tot AS dx FROM dense CROSS JOIN s),
den AS (SELECT sum(dx * dx) AS s0 FROM dev),
lags AS (SELECT unnest(generate_series(1, 24)) AS k),
num AS (SELECT l.k, sum(a.dx * b2.dx) AS sk
        FROM lags l JOIN dev a ON TRUE JOIN dev b2 ON a.h = b2.h + l.k
        GROUP BY l.k)
SELECT num.k AS lag, round(CAST(num.sk AS DOUBLE) / CAST(den.s0 AS DOUBLE), 6) AS acf
FROM num CROSS JOIN den""",
        # mirrors windows.follows_latency: same-user lag pairs, median =
        # quantile_disc element, mean = sum/n
        "follows_latency": """
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus,
         lag(event_type) OVER w AS prev_type,
         lag(epoch_us(ts)) OVER w AS ptus
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
p AS (SELECT prev_type, event_type AS next_type, CAST(tus - ptus AS BIGINT) AS delta
      FROM seq WHERE prev_type IS NOT NULL)
SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n,
       CAST(quantile_disc(delta, 0.5) AS BIGINT) AS p50_delta_us,
       round(CAST(sum(delta) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_delta_us
FROM p GROUP BY 1, 2 ORDER BY 1, 2""",
        # mirrors windows.dau_wau_ratio: distinct (day,user) base table,
        # week folds, stickiness = (sum_dau/n_days)/wau
        "dau_wau_ratio": """
WITH du AS (SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, user_id FROM events),
dau AS (SELECT day // 7 AS week, day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY 1, 2),
wau AS (SELECT day // 7 AS week, CAST(count(DISTINCT user_id) AS BIGINT) AS wau FROM du GROUP BY 1),
df AS (SELECT week, CAST(count(*) AS BIGINT) AS n_days, CAST(sum(dau) AS BIGINT) AS sum_dau
       FROM dau GROUP BY 1)
SELECT df.week, df.n_days, wau.wau, df.sum_dau,
       round((CAST(df.sum_dau AS DOUBLE) / CAST(df.n_days AS DOUBLE)) / CAST(wau.wau AS DOUBLE), 6)
           AS stickiness
FROM df JOIN wau ON wau.week = df.week ORDER BY df.week""",
        # mirrors windows.ccf_event_types: ccf(k) = corr(a_t, b_{{t-k}})
        "ccf_event_types": f"""
WITH e AS (SELECT epoch_us(ts) // 3600000000 AS h, event_type FROM events
           WHERE event_type IN ('{windows.CCF_TYPE_A}', '{windows.CCF_TYPE_B}')),
c AS (SELECT h,
             CAST(sum(CASE WHEN event_type = '{windows.CCF_TYPE_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN event_type = '{windows.CCF_TYPE_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM e GROUP BY h),
bnd AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
g AS (SELECT unnest(generate_series(lo, hi)) AS h FROM bnd),
dense AS (SELECT g.h, coalesce(c.n_a, 0) AS n_a, coalesce(c.n_b, 0) AS n_b
          FROM g LEFT JOIN c ON g.h = c.h),
s AS (SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(n_a) AS BIGINT) AS sa,
             CAST(sum(n_b) AS BIGINT) AS sb FROM dense),
dev AS (SELECT h, n_a * nn - sa AS da, n_b * nn - sb AS db FROM dense CROSS JOIN s),
den AS (SELECT sqrt(CAST(sum(da * da) AS DOUBLE) * CAST((SELECT sum(db * db) FROM dev) AS DOUBLE)) AS d0
        FROM dev),
lags AS (SELECT unnest(generate_series(-24, 24)) AS k),
num AS (SELECT l.k, CAST(sum(a.da * b2.db) AS BIGINT) AS sk
        FROM lags l JOIN dev a ON TRUE JOIN dev b2 ON a.h = b2.h + l.k
        GROUP BY l.k)
SELECT num.k AS lag, round(CAST(num.sk AS DOUBLE) / den.d0, 6) AS ccf
FROM num CROSS JOIN den""",
        "incremental_tile_counts": f"""
WITH tc AS (
  SELECT CAST({oracle.sql_tile_x(oracle.sql_derive_lon('event_id'), spatial.GINI_Z)} AS BIGINT) AS x,
         CAST({oracle.sql_tile_y(oracle.sql_derive_lat('event_id'), spatial.GINI_Z)} AS BIGINT) AS y,
         CAST(sum(CASE WHEN ts < TIMESTAMP '{spatial.IVM_CUT}' THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '{spatial.IVM_CUT}' THEN 1 ELSE 0 END) AS BIGINT) AS n_delta
  FROM events GROUP BY 1, 2)
SELECT {spatial.GINI_Z} AS z, x, y, n_base, n_delta, n_base + n_delta AS n_total FROM tc""",
        "tile_gini": f"""
WITH tc AS (
  SELECT CAST({oracle.sql_tile_x(oracle.sql_derive_lon("CAST(substr(image_id, 5) AS BIGINT)"), spatial.GINI_Z)} AS BIGINT) AS x,
         CAST({oracle.sql_tile_y(oracle.sql_derive_lat("CAST(substr(image_id, 5) AS BIGINT)"), spatial.GINI_Z)} AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS n
  FROM {img_pq} GROUP BY 1, 2),
r AS (SELECT n, CAST(row_number() OVER (ORDER BY n, x, y) AS BIGINT) AS i FROM tc),
s AS (SELECT CAST(count(*) AS BIGINT) AS nt, CAST(sum(n) AS BIGINT) AS sx,
             CAST(sum(i * n) AS BIGINT) AS swx FROM r)
SELECT nt AS n_tiles, sx AS n_images,
       round(2.0 * swx / (CAST(nt AS DOUBLE) * sx) - (nt + 1.0) / nt, 6) AS gini FROM s""",
        "location_unicity": f"""
WITH uc AS (
  SELECT user_id,
         CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {privacy.UNICITY_PITCH!r}) AS BIGINT) * 1024
       + CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {privacy.UNICITY_PITCH!r}) AS BIGINT) AS cell
  FROM events),
c AS (SELECT user_id, cell, count(*) AS n FROM uc GROUP BY 1, 2),
r AS (SELECT user_id, cell,
             row_number() OVER (PARTITION BY user_id ORDER BY n DESC, cell) AS rk FROM c),
sigs AS (
  SELECT k.k, r.user_id,
         string_agg(CAST(r.cell AS VARCHAR), '|' ORDER BY r.rk) AS sig
  FROM r CROSS JOIN (VALUES (1), (2), (3)) k(k)
  WHERE r.rk <= k.k GROUP BY 1, 2),
per_sig AS (SELECT k, sig, CAST(count(*) AS BIGINT) AS n_users_sig FROM sigs GROUP BY 1, 2)
SELECT CAST(k AS BIGINT) AS k, CAST(sum(n_users_sig) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN n_users_sig = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       round(sum(CASE WHEN n_users_sig = 1 THEN 1 ELSE 0 END)
             / CAST(sum(n_users_sig) AS DOUBLE), 6) AS unicity
FROM per_sig GROUP BY 1 ORDER BY 1""",
        "dp_tile_counts": f"""
WITH tc AS (
  SELECT CAST({oracle.sql_tile_x(oracle.sql_derive_lon('doc_id'), privacy.DP_Z)} AS BIGINT) AS x,
         CAST({oracle.sql_tile_y(oracle.sql_derive_lat('doc_id'), privacy.DP_Z)} AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2)
SELECT {privacy.DP_Z} AS z, x, y,
       greatest(n + ((x * {1 << privacy.DP_Z} + y) * {privacy.DP_MULT} + {privacy.DP_ADD})
                    % {privacy.DP_M31} % {2 * privacy.DP_BOUND + 1} - {privacy.DP_BOUND}, 0) AS n_noised
FROM tc""",
        "latest_event_per_user": """
SELECT user_id, ts, event_id, value FROM (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1""",
        "burst_cells": f"""
WITH ec AS (
  SELECT CAST(floor(({oracle.sql_derive_lon('event_id')} - {fixtures.LON_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(({oracle.sql_derive_lat('event_id')} - {fixtures.LAT_MIN!r}) / {hotspot.GI_EPS!r}) AS BIGINT) AS cy,
         CAST(floor(epoch_us(ts) / {hotspot.DAY_US}) AS BIGINT) AS day
  FROM events),
d AS (SELECT cx, cy, day, count(*) AS n_events FROM ec GROUP BY 1, 2, 3),
s AS (SELECT cx, cy, count(*) AS dd, CAST(sum(n_events) AS BIGINT) AS ss,
             CAST(sum(n_events * n_events) AS BIGINT) AS qq
      FROM d GROUP BY 1, 2)
SELECT d.cx, d.cy, d.day, d.n_events FROM d JOIN s USING (cx, cy)
WHERE s.dd >= {hotspot.BURST_MIN_DAYS} AND d.n_events * s.dd - s.ss > 0
  AND (d.n_events * s.dd - s.ss) * (d.n_events * s.dd - s.ss)
      > {hotspot.BURST_K * hotspot.BURST_K} * (s.qq * s.dd - s.ss * s.ss)""",
    }
    d["mann_kendall_fdr"] = f"""
WITH mk AS ({d["mann_kendall_cells"]}),
pv AS (SELECT cx, cy, mk_z,
         (1.0 / (1.0 + 0.3275911 * (abs(mk_z) / sqrt(2.0)))) AS t,
         abs(mk_z) / sqrt(2.0) AS e
       FROM mk),
pp AS (SELECT cx, cy, mk_z,
         (t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))))
           * exp(-e * e) AS p
       FROM pv),
rk AS (SELECT cx, cy, mk_z, p,
         CAST(row_number() OVER (ORDER BY p, cx, cy) AS BIGINT) AS p_rank,
         CAST(count(*) OVER () AS BIGINT) AS m
       FROM pp),
fl AS (SELECT *, p <= {hotspot.FDR_Q!r} * p_rank / CAST(m AS DOUBLE) AS flag FROM rk),
ct AS (SELECT coalesce(max(CASE WHEN flag THEN p_rank END), 0) AS cutoff FROM fl)
SELECT fl.cx, fl.cy, fl.mk_z, round(fl.p, 6) AS p_value, fl.p_rank,
       fl.p_rank <= ct.cutoff AS discovery
FROM fl CROSS JOIN ct"""
    d["rbo_rankings"] = f"""
WITH a AS ({d["search_ranked"]}),
b AS ({d["search_bm25"]}),
dep AS (SELECT unnest(generate_series(1, {SEARCH_K})) AS dd),
o AS (SELECT dep.dd AS depth,
        (SELECT CAST(count(*) AS BIGINT) FROM a JOIN b ON a.doc_id = b.doc_id
          WHERE a.search_rank <= dep.dd AND b.bm25_rank <= dep.dd) AS overlap
      FROM dep),
t AS (SELECT CAST(sum(CAST(floor(pow({index.RBO_P!r}, depth - 1)
        * (CAST(overlap AS DOUBLE) / CAST(depth AS DOUBLE)) * {index.RBO_FP!r} + 0.5) AS BIGINT)) AS BIGINT) AS sfp
      FROM o)
SELECT o.depth, o.overlap,
       round(CAST(o.overlap AS DOUBLE) / CAST(o.depth AS DOUBLE), 6) AS agreement,
       round((1.0 - {index.RBO_P!r}) * (CAST(t.sfp AS DOUBLE) / {index.RBO_FP!r}), 6) AS rbo
FROM o CROSS JOIN t"""
    return d
