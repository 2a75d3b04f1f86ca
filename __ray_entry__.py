"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship spatial-join + tiling pipeline on
sf0.001; ``queries()`` exposes one Ray pipeline per implemented
operator family (SURVEY.md §2 + the training-data ops); ``oracle_sql``
gives the DuckDB-equivalent SQL (full value-hash parity — including a
complete SQL re-implementation of the rHEALPix forward projection and
SUID digit chain, see rhealpixdggs_py_ray/oracle.py).

Ray is initialised by the driver before this module is imported;
nothing here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derive coordinates,
    index every event to its resolution-9 rHEALPix cell (actor-pool
    map_batches over zero-copy Arrow), assign SUID-prefix tiles, and
    aggregate per-tile counts with the salted combiner."""
    from rhealpixdggs_py_ray.pipelines import queries as Q

    return Q.q_tile_counts("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from rhealpixdggs_py_ray.pipelines import queries as Q

    return {
        "cell_from_point": Q.q_cell_from_point,
        "tile_counts": Q.q_tile_counts,
        "tile_pyramid": Q.q_tile_pyramid,
        "spatial_join_bbox": Q.q_spatial_join_bbox,
        "grid": Q.q_grid,
        "knn": Q.q_knn,
        "agg_lineitem": Q.q_agg_lineitem,
        "join_customer_nation": Q.q_join_customer_nation,
        "topk_orders": Q.q_topk_orders,
        "topk_per_group": Q.q_topk_per_group,
        "dedup_exact": Q.q_dedup_exact,
        "dedup_normalized": Q.q_dedup_normalized,
        "curate": Q.q_curate,
        "token_stats": Q.q_token_stats,
        "chunk_docs": Q.q_chunk_docs,
        "sample_stratified": Q.q_sample_stratified,
        "sample_bottomk": Q.q_sample_bottomk,
        "vocab": Q.q_vocab,
        "salient_terms": Q.q_salient_terms,
        "decontaminate": Q.q_decontaminate,
        "repetition": Q.q_repetition,
        "sessions": Q.q_sessions,
        "dedup_minhash_lsh": Q.q_minhash_lsh,
        "dedup_clusters": Q.q_dedup_clusters,
        "dedup_simhash": Q.q_simhash,
        "dedup_ngram_jaccard": Q.q_ngram_jaccard,
        "dedup_embedding": Q.q_embedding_dedup,
        "dedup_embedding_lsh": Q.q_embedding_dedup_lsh,
        "embedding_centroids": Q.q_embedding_centroids,
        "embedding_gram": Q.q_embedding_gram,
        "nearest_centroid": Q.q_nearest_centroid,
        "ann_topk": Q.q_ann_topk,
        "ann_topk_lsh": Q.q_ann_topk_lsh,
        "ann_topk_ivf": Q.q_ann_topk_ivf,
        "lang_id": Q.q_lang_id,
        "quality_score": Q.q_quality,
        "label_quality": Q.q_label_quality,
        "fingerprint": Q.q_fingerprint,
        "polyfill": Q.q_polyfill,
        "compress_cells": Q.q_compress,
        "k_ring": Q.q_k_ring,
        "cell_geometry": Q.q_cell_geometry,
        "image_pipeline": Q.q_image_pipeline,
        "hierarchy": Q.q_hierarchy,
        "successor": Q.q_successor,
        "validate": Q.q_validate,
        "minimal_cover": Q.q_minimal_cover,
        "windowed_counts": Q.q_windowed_counts,
        "sliding_counts": Q.q_sliding_counts,
        "hll_registers": Q.q_hll_registers,
        "distinct_users": Q.q_distinct_users,
        "props_parse": Q.q_props_parse,
        "quantiles": Q.q_quantiles,
        "winsorize": Q.q_winsorize,
        "asof_join": Q.q_asof_join,
        "range_join": Q.q_range_join,
        "spatial_antijoin": Q.q_spatial_antijoin,
        "linetrace": Q.q_linetrace,
        "cells_from_region": Q.q_cells_from_region,
        "cells_from_parallel": Q.q_cells_from_parallel,
        "cell_latitudes": Q.q_cell_latitudes,
        "cells_from_meridian": Q.q_cells_from_meridian,
        "knn_rings": Q.q_knn_rings,
        "resumable_tiling": Q.q_resumable_tiling,
        "image_features": Q.q_image_features,
        "image_neardup": Q.q_image_neardup,
        "cell_stats": Q.q_cell_stats,
        "tile_counts_salted": Q.q_tile_counts_salted,
        "cell_from_region": Q.q_cell_from_region,
        "predecessor": Q.q_predecessor,
        "interval": Q.q_interval,
        "suid_rowcol": Q.q_suid_rowcol,
        "num_cells": Q.q_num_cells,
        "xy_range": Q.q_xy_range,
        "cell_boundary": Q.q_cell_boundary,
        "cell_interior": Q.q_cell_interior,
        "cell_contains": Q.q_cell_contains,
        "cell_overlaps": Q.q_cell_overlaps,
        "random_cells": Q.q_random_cells,
        "random_points": Q.q_random_points,
        "cell_zone": Q.q_cell_zone,
    }


def oracle_sql() -> dict[str, str]:
    from rhealpixdggs_py_ray.pipelines import queries as Q

    return {
        "cell_from_point": Q.sql_cell_from_point(),
        "tile_counts": Q.sql_tile_counts(),
        "tile_pyramid": Q.sql_tile_pyramid(),
        "spatial_join_bbox": Q.sql_spatial_join_bbox(),
        "grid": Q.sql_grid(),
        "knn": Q.sql_knn(),
        "agg_lineitem": Q.sql_agg_lineitem(),
        "join_customer_nation": Q.sql_join_customer_nation(),
        "topk_orders": Q.sql_topk_orders(),
        "topk_per_group": Q.sql_topk_per_group(),
        "dedup_exact": Q.sql_dedup_exact(),
        "dedup_normalized": Q.sql_dedup_normalized(),
        "curate": Q.sql_curate(),
        "token_stats": Q.sql_token_stats(),
        "chunk_docs": Q.sql_chunk_docs(),
        "sample_stratified": Q.sql_sample_stratified(),
        "sample_bottomk": Q.sql_sample_bottomk(),
        "vocab": Q.sql_vocab(),
        "salient_terms": Q.sql_salient_terms(),
        "decontaminate": Q.sql_decontaminate(),
        "repetition": Q.sql_repetition(),
        "sessions": Q.sql_sessions(),
        "dedup_minhash_lsh": Q.sql_minhash_lsh(),
        "dedup_clusters": Q.sql_dedup_clusters(),
        "dedup_simhash": Q.sql_simhash(),
        "dedup_ngram_jaccard": Q.sql_ngram_jaccard(),
        "dedup_embedding": Q.sql_embedding_dedup(),
        "dedup_embedding_lsh": Q.sql_embedding_dedup_lsh(),
        "embedding_centroids": Q.sql_embedding_centroids(),
        "embedding_gram": Q.sql_embedding_gram(),
        "nearest_centroid": Q.sql_nearest_centroid(),
        "ann_topk": Q.sql_ann_topk(),
        "ann_topk_lsh": Q.sql_ann_topk_lsh(),
        "ann_topk_ivf": Q.sql_ann_topk_ivf(),
        "lang_id": Q.sql_lang_id(),
        "quality_score": Q.sql_quality(),
        "label_quality": Q.sql_label_quality(),
        "fingerprint": Q.sql_fingerprint(),
        "polyfill": Q.sql_polyfill(),
        "k_ring": Q.sql_k_ring(),
        "knn_rings": Q.sql_knn(),
        "compress_cells": Q.sql_compress(),
        "cells_from_region": Q.sql_cells_from_region(),
        "cells_from_parallel": Q.sql_cells_from_parallel(),
        "cell_latitudes": Q.sql_cell_latitudes(),
        "cells_from_meridian": Q.sql_cells_from_meridian(),
        "cell_geometry": Q.sql_cell_geometry(),
        "hierarchy": Q.sql_hierarchy(),
        "successor": Q.sql_successor(),
        "validate": Q.sql_validate(),
        "minimal_cover": Q.sql_minimal_cover(),
        "windowed_counts": Q.sql_windowed_counts(),
        "sliding_counts": Q.sql_sliding_counts(),
        "hll_registers": Q.sql_hll_registers(),
        "distinct_users": Q.sql_distinct_users(),
        "props_parse": Q.sql_props_parse(),
        "quantiles": Q.sql_quantiles(),
        "winsorize": Q.sql_winsorize(),
        "asof_join": Q.sql_asof_join(),
        "range_join": Q.sql_range_join(),
        "spatial_antijoin": Q.sql_spatial_antijoin(),
        "resumable_tiling": Q.sql_resumable_tiling(),
        "cell_stats": Q.sql_cell_stats(),
        "tile_counts_salted": Q.sql_tile_counts(),
        "cell_from_region": Q.sql_cell_from_region(),
        "linetrace": Q.sql_linetrace(),
        "predecessor": Q.sql_predecessor(),
        "interval": Q.sql_interval(),
        "suid_rowcol": Q.sql_suid_rowcol(),
        "num_cells": Q.sql_num_cells(),
        "xy_range": Q.sql_xy_range(),
        "cell_boundary": Q.sql_cell_boundary(),
        "cell_interior": Q.sql_cell_interior(),
        "cell_contains": Q.sql_cell_contains(),
        "cell_overlaps": Q.sql_cell_overlaps(),
        "random_cells": Q.sql_random_cells(),
        "random_points": Q.sql_random_points(),
        "cell_zone": Q.sql_cell_zone(),
        "image_pipeline": Q.sql_image_pipeline(),
        "image_features": Q.sql_image_features(),
        "image_neardup": Q.sql_image_neardup(),
    }
