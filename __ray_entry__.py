"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator surface
(SURVEY.md §2 + training-data ops); ``oracle_sql()`` provides the DuckDB
equivalent for every SQL-expressible query (KG extraction itself is not
SQL-expressible — those entries are gated by the oracle parity tests in
tests/test_pipeline_parity.py and get rows-only driver checks).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_STOP_IN = "('the','a','and','of','to','in','is','on','at')"
_TERM_VALUES = "(VALUES ('spark'),('table'),('join'),('window'),('stream'),('vector'))"
_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"

PASSAGE_CTE = """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> x <> '') AS t
              FROM documents),
            w AS (SELECT doc_id, unnest(t) AS w,
                         generate_subscripts(t, 1) AS pos FROM toks),
            g AS (SELECT doc_id, pos - 1 AS pos0,
                         count(*) OVER win AS cnt,
                         md5(string_agg(w, ' ') OVER win) AS phash
                  FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)),
            f AS (SELECT phash, doc_id, pos0 FROM g WHERE cnt = 8)"""


_SIMHASH_SQL = """
            WITH toks AS (
              SELECT doc_id, list_distinct(list_filter(
                         regexp_split_to_array(trim(lower(text)), '\\s+'),
                         x -> x <> '')) AS t
              FROM documents),
            w AS (SELECT doc_id, unnest(t) AS word FROM toks),
            h AS (SELECT doc_id,
                         ('0x' || substr(md5(word), 1, 16))::UBIGINT AS hv
                  FROM w),
            bits AS (
              SELECT doc_id, i AS bit,
                     sum(CASE WHEN ((hv >> i) & 1) = 1 THEN 1 ELSE -1 END) AS acc
              FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
              GROUP BY doc_id, i),
            sig AS (
              SELECT doc_id,
                     (sum(CASE WHEN acc > 0 AND bit < 63
                               THEN (1::BIGINT << bit) ELSE 0 END)
                      + sum(CASE WHEN acc > 0 AND bit = 63
                                 THEN -9223372036854775808::HUGEINT
                                 ELSE 0 END))::BIGINT AS simhash
              FROM bits GROUP BY doc_id)
            SELECT d.doc_id, coalesce(s.simhash, 0)::BIGINT AS simhash
            FROM documents d LEFT JOIN sig s USING (doc_id)
        """


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: spans adapter →
    chunk → extract → canonicalize → edges → triples."""
    from graphrag_ray.config import PipelineConfig
    from graphrag_ray.pipelines.kg import build_kg, spans_dataset_from_flat_parquet

    docs = spans_dataset_from_flat_parquet("/root/testdata/sf0.001/documents.parquet")
    res = build_kg(docs, PipelineConfig(chunk_size=512, chunk_overlap=100))
    return res.triples


def queries() -> dict[str, Callable[[str], Any]]:
    from graphrag_ray import queries as q

    return {
        # --- benchmark harness (monitoring/benchmark.rs parity, SQL-oracled)
        "bench_quality": q.bench_quality,
        "bench_rag_summary": q.bench_rag_summary,
        # --- text analysis (SQL-oracled)
        "doc_token_stats": q.doc_token_stats,
        "doc_bpe_tokens": q.doc_bpe_tokens,      # SQL-oracled (RE2 twin)
        "doc_quality": q.doc_quality,
        "doc_readability": q.doc_readability,
        "doc_lang_id": q.doc_lang_id,
        "doc_fingerprint": q.doc_fingerprint,
        "doc_split_counts": q.doc_split_counts,
        "doc_sample": q.doc_sample,
        "corpus_stats": q.corpus_stats,
        "term_stats": q.term_stats,
        "term_cooccur": q.term_cooccur,
        "top_terms": q.top_terms,
        "doc_length_histogram": q.doc_length_histogram,
        # --- join patterns (SQL-oracled)
        "nation_region_join": q.nation_region_join,
        "customer_order_counts": q.customer_order_counts,
        "customer_order_join": q.customer_order_join,
        # --- dedup family
        "dedup_exact": q.dedup_exact,           # SQL-oracled
        "dedup_simhash": q.dedup_simhash,        # SQL-oracled (signature table)
        "dedup_simhash_pairs": q.dedup_simhash_pairs,  # SQL-oracled (banded Hamming pairs)
        "dedup_minhash_pairs": q.dedup_minhash_pairs,
        "dedup_ngram_pairs": q.dedup_ngram_pairs,
        "doc_lm_score": q.doc_lm_score,              # SQL-oracled (bigram LM replay)
        "lm_quality_buckets": q.lm_quality_buckets,  # SQL-oracled (CCNet tercile twin)
        "top_bigrams": q.top_bigrams,                # SQL-oracled
        "dup_passages": q.dup_passages,              # SQL-oracled (windowed md5 twin)
        "doc_dup_passage_counts": q.doc_dup_passage_counts,  # SQL-oracled
        "doc_novel_window_counts": q.doc_novel_window_counts,  # SQL-oracled (first-occurrence twin)
        "doc_passage_scrub": q.doc_passage_scrub,  # SQL-oracled (coverage string_agg twin)
        "doc_winnow_fingerprints": q.doc_winnow_fingerprints,  # SQL-oracled (windowed-min twin)
        "winnow_dup_pairs": q.winnow_dup_pairs,  # SQL-oracled (shared-fingerprint join twin)
        "embedding_near_dup": q.embedding_near_dup,
        "embedding_mutual_knn": q.embedding_mutual_knn,
        "embedding_near_dup_bucketed": q.embedding_near_dup_bucketed,
        "dedup_semantic_keep": q.dedup_semantic_keep,
        "dedup_ngram_keep": q.dedup_ngram_keep,      # SQL-oracled (min-label closure)
        "dedup_minhash_keep": q.dedup_minhash_keep,  # SQL-oracled (same closure, LSH pair source)
        "dedup_simhash_keep": q.dedup_simhash_keep,  # SQL-oracled (closure over Hamming pairs)
        "curation_pipeline": q.curation_pipeline,    # SQL-oracled (composed twin)
        # --- similarity search
        "ann_topk": q.ann_topk,                  # SQL-oracled
        "rrf_fusion": q.rrf_fusion,              # SQL-oracled
        "bm25_topk": q.bm25_topk,                # SQL-oracled (T2 keyword retrieval)
        "hybrid_topk": q.hybrid_topk,            # SQL-oracled (T2 hybrid retrieval)
        "dual_retrieval_topk": q.dual_retrieval_topk,          # SQL-oracled (LightRAG dual-level, interleave)
        "dual_retrieval_weighted": q.dual_retrieval_weighted,  # SQL-oracled (weighted merge)
        "ann_lsh_topk": q.ann_lsh_topk,          # SQL-oracled (plane replay)
        "ann_ivf_topk": q.ann_ivf_topk,          # SQL-oracled (k-means replay)
        "ivf_cluster_sizes": q.ivf_cluster_sizes,  # SQL-oracled (same trainer replay)
        "embedding_pca_top": q.embedding_pca_top,  # SQL-oracled (power-iteration replay)
        # --- kgx: KG pipeline over the md5-derived oracle corpus
        #     (SQL-oracled end-to-end: extract → canonicalize → edges)
        "kgx_doc_entities": q.kgx_doc_entities,
        "kgx_entities": q.kgx_entities,
        "kgx_alias_map": q.kgx_alias_map,
        "kgx_edges": q.kgx_edges,
        "kgx_triples": q.kgx_triples,
        # --- kgx_fuzzy: same pipeline over the near-miss variant corpus —
        #     the greedy FUZZY clustering path is exercised for real
        "kgx_fuzzy_entities": q.kgx_fuzzy_entities,
        "kgx_fuzzy_alias_map": q.kgx_fuzzy_alias_map,
        "kgx_fuzzy_edges": q.kgx_fuzzy_edges,
        "kgx_fuzzy_triples": q.kgx_fuzzy_triples,
        # --- syn_*: full KG build over the synth spans corpus itself
        #     (multi-sentence Zipf docs + md5-derived fuzzy variants);
        #     DuckDB replays extraction over the word stream and the
        #     greedy fuzzy clustering as recursive CTEs (syn_oracle_kg.py)
        "syn_doc_entities": q.syn_doc_entities,
        "syn_entities": q.syn_entities,
        "syn_alias_map": q.syn_alias_map,
        "syn_edges": q.syn_edges,
        "syn_triples": q.syn_triples,
        # downstream analytics twins over the replayed syn graph — the
        # same stage code as the kg_* surfaces, every row SQL-oracled
        "syn_stats": q.syn_stats,
        "syn_cooccur": q.syn_cooccur,
        "syn_common_entities": q.syn_common_entities,
        "syn_components": q.syn_components,
        "syn_triangles": q.syn_triangles,
        "syn_link_pred": q.syn_link_pred,
        "syn_lpa": q.syn_lpa,
        "syn_kcore": q.syn_kcore,
        "syn_eccentricity": q.syn_eccentricity,
        "syn_assortativity": q.syn_assortativity,
        "syn_component_sizes": q.syn_component_sizes,
        "syn_hits": q.syn_hits,
        "kgx_hits": q.kgx_hits,
        "syn_leiden": q.syn_leiden,
        "syn_leiden_l1": q.syn_leiden_l1,
        "syn_leiden_l2": q.syn_leiden_l2,
        "syn_louvain": q.syn_louvain,
        "syn_graph_metrics": q.syn_graph_metrics,
        "syn_pagerank": q.syn_pagerank,
        "syn_centrality": q.syn_centrality,
        "syn_mentions": q.syn_mentions,
        "syn_incremental": q.syn_incremental,
        "syn_boundaries": q.syn_boundaries,      # SQL-oracled (BAR-RAG boundary detection)
        "syn_query_analysis": q.syn_query_analysis,  # SQL-oracled (adaptive-retrieval query classifier)
        "kgx_structure": q.kgx_structure,        # SQL-oracled (heading hierarchy)
        "kgx_causal_chains": q.kgx_causal_chains,  # SQL-oracled (temporal causal chains)
        "syn_anchors": q.syn_anchors,            # SQL-oracled (symbolic anchoring)
        "kgx_metadata_search": q.kgx_metadata_search,  # SQL-oracled (enriched metadata retrieval)
        "syn_contextual_chunks": q.syn_contextual_chunks,  # SQL-oracled (contextual retrieval enrichment)
        "kg_boundary_chunks": q.kg_boundary_chunks,  # SQL-oracled (greedy packing replay)
        "kgx_rdf_import": q.kgx_rdf_import,
        "kgx_chunks": q.kgx_chunks,
        "kgx_mentions": q.kgx_mentions,
        "kgx_stats": q.kgx_stats,
        "kgx_cooccur": q.kgx_cooccur,
        "kgx_common_entities": q.kgx_common_entities,
        "kgx_components": q.kgx_components,
        "kgx_triangles": q.kgx_triangles,
        "kgx_link_pred": q.kgx_link_pred,
        "kgx_lpa": q.kgx_lpa,
        "kgx_kcore": q.kgx_kcore,
        "kgx_eccentricity": q.kgx_eccentricity,
        "kgx_assortativity": q.kgx_assortativity,
        "kgx_component_sizes": q.kgx_component_sizes,
        "kgx_leiden": q.kgx_leiden,
        "kgx_leiden_l1": q.kgx_leiden_l1,
        "kgx_rel_hierarchy": q.kgx_rel_hierarchy,
        "kgx_louvain": q.kgx_louvain,
        "kgx_graph_metrics": q.kgx_graph_metrics,
        "kgx_pagerank": q.kgx_pagerank,
        "kgx_centrality": q.kgx_centrality,
        "kgx_enriched": q.kgx_enriched,
        "kgx_yake": q.kgx_yake,
        "kgx_incremental": q.kgx_incremental,
        "kgx_graphml_import": q.kgx_graphml_import,
        "kgx_csv_import": q.kgx_csv_import,
        "kgx_layout": q.kgx_layout,
        "kgx_community_summaries": q.kgx_community_summaries,
        "kgx_ppr": q.kgx_ppr,
        "kgx_media_meta": q.kgx_media_meta,
        "kgx_media_frames": q.kgx_media_frames,
        "kgx_atomic_facts": q.kgx_atomic_facts,
        "kgx_validated_facts": q.kgx_validated_facts,
        "kgx_gleaning": q.kgx_gleaning,
        # --- KG construction over the REAL corpus. Round 5: the chunked
        #     corpus itself is SQL-replayed (_kg_full_cte), so the core
        #     build (entities/alias/triples/mentions), the graph analytics
        #     and Leiden levels are hard-oracled DIRECTLY; the remaining
        #     rows-only kg_* surfaces stay oracled through the kgx_*/syn_*
        #     twins of the same stage code.
        "kg_chunks": q.kg_chunks,
        "kg_entities": q.kg_entities,
        "kg_triples": q.kg_triples,
        "kg_alias_map": q.kg_alias_map,
        "kg_communities": q.kg_communities,
        "kg_leiden": q.kg_leiden,
        "kg_leiden_l1": q.kg_leiden_l1,
        "kg_community_summaries": q.kg_community_summaries,
        "kg_chunk_embeddings": q.kg_chunk_embeddings,
        "kg_semantic_chunks": q.kg_semantic_chunks,
        "kg_semantic_chunk_coverage": q.kg_semantic_chunk_coverage,
        "kg_late_chunk_embeddings": q.kg_late_chunk_embeddings,
        "kg_mentions": q.kg_mentions,
        "kg_stats": q.kg_stats,
        "kg_pagerank": q.kg_pagerank,
        "kg_components": q.kg_components,
        "kg_common_entities": q.kg_common_entities,
        "kg_centrality": q.kg_centrality,
        "kg_louvain": q.kg_louvain,
        "kg_graph_metrics": q.kg_graph_metrics,
        "kg_relationship_hierarchy": q.kg_relationship_hierarchy,
        "kg_node2vec": q.kg_node2vec,
        "kg_graphsage": q.kg_graphsage,
        "kg_semantic_neighbors": q.kg_semantic_neighbors,
        "kg_cooccur_edges": q.kg_cooccur_edges,
        "kg_enriched_chunks": q.kg_enriched_chunks,
        "kg_atomic_facts": q.kg_atomic_facts,
        "kgx_entity_temporal": q.kgx_entity_temporal,
        "kgx_temporal_snapshot": q.kgx_temporal_snapshot,
        "kg_yake_keywords": q.kg_yake_keywords,
        "kg_gleaning_extraction": q.kg_gleaning_extraction,
        "kg_validated_facts": q.kg_validated_facts,
        "media_features": q.media_features,
        "media_frames": q.media_frames,
        "media_resized": q.media_resized,
        # --- rograg: query-side subsystem over the kgx graph (SQL-oracled)
        "rograg_intent": q.rograg_intent,
        "rograg_decompose": q.rograg_decompose,
        "rograg_logic_form": q.rograg_logic_form,
        "rograg_fuzzy": q.rograg_fuzzy,
        "rograg_responses": q.rograg_responses,
        "rograg_quality": q.rograg_quality,
        "rograg_stream": q.rograg_stream,
        # --- query intelligence / routing / plan optimizer (SQL-oracled)
        "rograg_metrics": q.rograg_metrics,
        "qi_rewrite": q.qi_rewrite,
        "qi_routing": q.qi_routing,
        "qopt_plans": q.qopt_plans,
        "gen_answers": q.gen_answers,
        "explained_steps": q.explained_steps,
        "explained_sources": q.explained_sources,
        "rerank_fuzzy": q.rerank_fuzzy,
        "rerank_stats": q.rerank_stats,
        # --- rule-based NLP over the kgx sentences (SQL-oracled)
        "nlp_pos": q.nlp_pos,
        "nlp_noun_phrases": q.nlp_noun_phrases,
        "nlp_dependencies": q.nlp_dependencies,
        "ner_custom": q.ner_custom,
        "lightrag_entities": q.lightrag_entities,
        "lightrag_relationships": q.lightrag_relationships,
        # --- function-calling toolset over the kgx graph (SQL-oracled)
        "fc_graph_search": q.fc_graph_search,
        "fc_entity_expand": q.fc_entity_expand,
        "pipeline_validation": q.pipeline_validation,
        "concept_nodes": q.concept_nodes,
        "concept_edges": q.concept_edges,
        "concept_rank": q.concept_rank,
        "concept_match": q.concept_match,
        "weight_opt_history": q.weight_opt_history,
        "inferred_relations": q.inferred_relations,
        "query_refine": q.query_refine,        # SQL-oracled (event-step replay)
        "ids_search_depths": q.ids_search_depths,  # SQL-oracled (unrolled-depth replay)
        # --- training-data curation (stages/curation.py — SQL-oracled)
        "pii_detect": q.pii_detect,
        "pii_redacted": q.pii_redacted,
        "doc_split": q.doc_split,
        "doc_repetition": q.doc_repetition,
        "doc_decontam": q.doc_decontam,
        "source_stats": q.source_stats,
        "source_mix_weights": q.source_mix_weights,  # SQL-oracled (temperature mixing)
        "lang_sample": q.lang_sample,
        "doc_filter_verdict": q.doc_filter_verdict,
        "gopher_quality": q.gopher_quality,          # SQL-oracled (integer-exact line rules)
        "source_cap": q.source_cap,                  # SQL-oracled (row_number twin)
        "doc_shard_assignment": q.doc_shard_assignment,  # SQL-oracled (derived shard count + row_number twin)
        "shard_packing": q.shard_packing,            # SQL-oracled (windowed running-sum twin)
        "doc_length_quantiles": q.doc_length_quantiles,  # SQL-oracled (quantile_disc)
        "split_leakage": q.split_leakage,
        # --- stream-shaped event operators (SQL-oracled)
        "events_tumbling": q.events_tumbling,
        "events_sessionize": q.events_sessionize,
        "events_hopping": q.events_hopping,
        "events_type_stats": q.events_type_stats,
        "events_asof": q.events_asof,        # SQL-oracled (ASOF JOIN twin)
        "lineitem_pricing_summary": q.lineitem_pricing_summary,
        "ship_latency_histogram": q.ship_latency_histogram,
        "customers_without_orders": q.customers_without_orders,
        "events_user_cms": q.events_user_cms,
        "events_top_users": q.events_top_users,  # SQL-oracled (grouped top-k twin)
        "events_user_hll": q.events_user_hll,
        "latest_order_per_customer": q.latest_order_per_customer,
        "top_orders_per_customer": q.top_orders_per_customer,  # SQL-oracled (row_number<=k twin)
        "part_type_supplier_counts": q.part_type_supplier_counts,  # SQL-oracled (Q16-shape count-distinct)
        "orders_rollup": q.orders_rollup,    # SQL-oracled (GROUP BY ROLLUP twin)
        "large_order_customers": q.large_order_customers,  # SQL-oracled (Q18-shape HAVING + join back)
        "late_shipment_priority_counts": q.late_shipment_priority_counts,
        "top_segment_order_revenue": q.top_segment_order_revenue,
        "events_user_running": q.events_user_running,  # SQL-oracled (window twin)
        "events_funnel": q.events_funnel,    # SQL-oracled (staged-min twin)
        "events_value_quantiles": q.events_value_quantiles,  # SQL-oracled
        "events_bursts": q.events_bursts,    # SQL-oracled (integer contract)
        "events_retention": q.events_retention,  # SQL-oracled
    }


def oracle_sql() -> dict[str, str]:
    from graphrag_ray import kgx as _kgx_sql
    from graphrag_ray import kgx_fuzzy as _kgxf_sql
    from graphrag_ray import rograg_oracle as _rograg_sql
    from graphrag_ray import query_intel_oracle as _qi_sql
    from graphrag_ray import generation_oracle as _gen_sql
    from graphrag_ray import nlp_oracle as _nlp_sql
    from graphrag_ray import fc_oracle as _fc_sql
    from graphrag_ray import syn_oracle_kg as _synkg_sql
    from graphrag_ray import synth_oracle as _syn_sql
    from graphrag_ray import curation_oracle as _cur_sql

    oracles = {
        # training-data curation (curation_oracle.py replays the
        # md5-derived PII injection, RE2 regexes, hash split, n-gram
        # repetition/decontamination and sampling arithmetic exactly)
        "pii_detect": _cur_sql.pii_detect_sql(),
        "pii_redacted": _cur_sql.pii_redacted_sql(),
        "doc_split": _cur_sql.doc_split_sql(),
        "doc_repetition": _cur_sql.doc_repetition_sql(),
        "doc_decontam": _cur_sql.doc_decontam_sql(),
        "source_stats": _cur_sql.source_stats_sql(),
        "source_mix_weights": _cur_sql.source_mix_weights_sql(),
        "lang_sample": _cur_sql.lang_sample_sql(),
        "doc_filter_verdict": _cur_sql.doc_filter_verdict_sql(),
        "gopher_quality": _cur_sql.gopher_quality_sql(),
        "source_cap": _cur_sql.source_cap_sql(),
        "doc_shard_assignment": _cur_sql.shard_assignment_sql(),
        "shard_packing": _cur_sql.shard_packing_sql(),
        "doc_length_quantiles": _cur_sql.doc_length_quantiles_sql(),
        "split_leakage": _cur_sql.split_leakage_sql(f"""
            WITH sigs AS ({_SIMHASH_SQL})
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
            FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """),
        # rograg query-side subsystem (rograg_oracle.py rule replay)
        "rograg_intent": _rograg_sql.rograg_intent_sql(),
        "rograg_decompose": _rograg_sql.rograg_decompose_sql(),
        "rograg_logic_form": _rograg_sql.rograg_logic_form_sql(),
        "rograg_fuzzy": _rograg_sql.rograg_fuzzy_sql(),
        "rograg_responses": _rograg_sql.rograg_responses_sql(),
        "rograg_quality": _rograg_sql.rograg_quality_sql(),
        "rograg_stream": _rograg_sql.rograg_stream_sql(),
        "rograg_metrics": _rograg_sql.rograg_metrics_sql(),
        "qi_rewrite": _qi_sql.qi_rewrite_sql(),
        "qi_routing": _qi_sql.qi_routing_sql(),
        "qopt_plans": _qi_sql.qopt_plans_sql(),
        "gen_answers": _gen_sql.gen_answers_sql(),
        "explained_steps": _gen_sql.explained_steps_sql(),
        "explained_sources": _gen_sql.explained_sources_sql(),
        "rerank_fuzzy": _gen_sql.rerank_fuzzy_sql(),
        "rerank_stats": _gen_sql.rerank_stats_sql(),
        "nlp_pos": _nlp_sql.nlp_pos_sql(),
        "nlp_noun_phrases": _nlp_sql.nlp_noun_phrases_sql(),
        "nlp_dependencies": _nlp_sql.nlp_dependencies_sql(),
        "ner_custom": _nlp_sql.ner_custom_sql(),
        "lightrag_entities": _nlp_sql.lightrag_entities_sql(),
        "lightrag_relationships": _nlp_sql.lightrag_relationships_sql(),
        "fc_graph_search": _fc_sql.fc_graph_search_sql(),
        "ids_search_depths": _fc_sql.ids_search_depths_sql(),
        "query_refine": _fc_sql.query_refine_sql(),
        "fc_entity_expand": _fc_sql.fc_entity_expand_sql(),
        "pipeline_validation": _fc_sql.pipeline_validation_sql(),
        "concept_nodes": _fc_sql.concept_nodes_sql(),
        "concept_edges": _fc_sql.concept_edges_sql(),
        "concept_rank": _fc_sql.concept_rank_sql(),
        "concept_match": _fc_sql.concept_match_sql(),
        "weight_opt_history": _fc_sql.weight_opt_history_sql(),
        "inferred_relations": _fc_sql.inferred_relations_sql(),
        # synth-corpus md5 replay (synth_oracle.py): the named-md5-draw
        # respec of synth.py makes the real kg corpus SQL-derivable, so
        # the flagship pipeline's chunk offsets and media span structure
        # get HARD oracles (text assembly + recursive-CTE chunker replay
        # on the DuckDB side; the Ray side runs the actual distributed
        # pipeline).
        "kg_chunks": _syn_sql.kg_chunks_sql(),
        "media_features": _syn_sql.media_features_sql(),
        "media_frames": _syn_sql.media_frames_sql(),
        "media_resized": _syn_sql.media_resized_sql(),
        "kg_chunk_embeddings": _syn_sql.kg_chunk_embeddings_sql(),
        "kg_late_chunk_embeddings": _syn_sql.kg_late_chunk_embeddings_sql(),
        "kg_boundary_chunks": _syn_sql.kg_boundary_chunks_sql(),
        "bench_quality": _syn_sql.bench_quality_sql(),
        "bench_rag_summary": _syn_sql.bench_rag_summary_sql(),
        "kg_semantic_chunk_coverage":
            _syn_sql.kg_semantic_chunk_coverage_sql(),
        "doc_token_stats": f"""
            SELECT doc_id,
                   length(text)::BIGINT AS n_chars,
                   array_length({_TOKS})::BIGINT AS n_tokens,
                   array_length(list_distinct({_TOKS}))::BIGINT AS n_uniq_tokens,
                   coalesce(list_sum(list_transform({_TOKS}, t -> length(t))), 0)::BIGINT
                       AS sum_token_len
            FROM documents
        """,
        "doc_quality": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents)
            SELECT doc_id,
                   array_length(t)::BIGINT AS n_tokens,
                   array_length(list_filter(t, x -> x IN {_STOP_IN}))::BIGINT
                       AS n_stop_tokens,
                   array_length(list_distinct(t))::BIGINT AS n_uniq_tokens
            FROM toks
        """,
        "doc_readability": f"""
            WITH toks AS (SELECT doc_id, text, {_TOKS} AS t FROM documents),
            c AS (SELECT doc_id,
                   greatest(1, array_length(
                       regexp_extract_all(text, '[.!?]+')))::BIGINT
                       AS n_sentences,
                   coalesce(array_length(t), 0)::BIGINT AS n_words,
                   coalesce(list_sum(list_transform(t, w ->
                       greatest(1, array_length(
                           regexp_extract_all(lower(w), '[aeiouy]+'))))),
                       0)::BIGINT AS n_syllables
              FROM toks)
            SELECT doc_id, n_sentences, n_words, n_syllables,
                   CASE WHEN n_words = 0 THEN 0.0
                        ELSE round(206.835
                                   - 1.015 * (n_words::DOUBLE / n_sentences)
                                   - 84.6 * (n_syllables::DOUBLE / n_words),
                                   4)
                   END AS flesch
            FROM c
        """,
        "doc_lang_id": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            h AS (SELECT doc_id,
              array_length(list_filter(t, x -> x IN ('the','a','and','of','to')))::BIGINT AS hits_en,
              array_length(list_filter(t, x -> x IN ('der','die','das','und','zu')))::BIGINT AS hits_de,
              array_length(list_filter(t, x -> x IN ('el','la','de','los','y')))::BIGINT AS hits_es,
              array_length(list_filter(t, x -> x IN ('le','la','de','et','les')))::BIGINT AS hits_fr,
              array_length(list_filter(t, x -> x IN ('de','shi','bu','le','zai')))::BIGINT AS hits_zh
            FROM toks)
            SELECT doc_id,
                   CASE WHEN hits_en >= greatest(hits_de, hits_es, hits_fr, hits_zh) THEN 'en'
                        WHEN hits_de >= greatest(hits_es, hits_fr, hits_zh) THEN 'de'
                        WHEN hits_es >= greatest(hits_fr, hits_zh) THEN 'es'
                        WHEN hits_fr >= hits_zh THEN 'fr'
                        ELSE 'zh' END AS pred_lang,
                   hits_en, hits_de, hits_es, hits_fr, hits_zh
            FROM h
        """,
        "doc_fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents",
        "doc_split_counts": """
            SELECT CASE WHEN b < 80 THEN 'train'
                        WHEN b < 90 THEN 'valid'
                        ELSE 'test' END AS split,
                   lang, count(*)::BIGINT AS n_docs
            FROM (SELECT lang,
                         ('0x'||substr(md5(doc_id::VARCHAR),1,8))::BIGINT
                         % 100 AS b
                  FROM documents)
            GROUP BY 1, 2
        """,
        "doc_sample": """
            SELECT doc_id, lang FROM documents
            WHERE ('0x'||substr(md5('sample:v1:'||doc_id::VARCHAR),1,8))::BIGINT
                  % 100 < 10
        """,
        "corpus_stats": f"""
            SELECT lang,
                   count(*)::BIGINT AS n_docs,
                   sum(length(text))::BIGINT AS n_chars,
                   sum(array_length({_TOKS}))::BIGINT AS n_tokens
            FROM documents GROUP BY lang
        """,
        "term_stats": f"""
            SELECT t.term,
                   sum((length(d.text) - length(replace(d.text, t.term, '')))
                       // length(t.term))::BIGINT AS n_occurrences,
                   sum(CASE WHEN contains(d.text, t.term) THEN 1 ELSE 0 END)::BIGINT
                       AS doc_freq
            FROM documents d CROSS JOIN {_TERM_VALUES} AS t(term)
            GROUP BY t.term
        """,
        "term_cooccur": f"""
            SELECT a.term AS term_a, b.term AS term_b,
                   sum(CASE WHEN contains(d.text, a.term) AND contains(d.text, b.term)
                       THEN 1 ELSE 0 END)::BIGINT AS n_docs
            FROM documents d
            CROSS JOIN {_TERM_VALUES} AS a(term)
            CROSS JOIN {_TERM_VALUES} AS b(term)
            WHERE a.term < b.term
            GROUP BY 1, 2
        """,
        "top_terms": f"""
            SELECT term, count(*)::BIGINT AS n
            FROM (SELECT unnest({_TOKS}) AS term FROM documents)
            GROUP BY term ORDER BY n DESC, term ASC LIMIT 20
        """,
        "doc_length_histogram": """
            SELECT (length(text) // 100)::BIGINT AS len_bucket,
                   count(*)::BIGINT AS n_docs
            FROM documents GROUP BY 1
        """,
        "nation_region_join": """
            SELECT n.n_nationkey, n.n_name, n.n_regionkey, r.r_name
            FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        """,
        "customer_order_counts": """
            SELECT o.o_custkey, count(*)::BIGINT AS n, c.c_name
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY o.o_custkey, c.c_name
        """,
        "customer_order_join": """
            SELECT o.o_custkey, o.o_orderkey, c.c_name
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "dedup_exact": """
            SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
                   min(doc_id)::BIGINT AS keep_doc_id,
                   count(*)::BIGINT AS n_docs
            FROM documents GROUP BY 1
        """,
        "embedding_near_dup": """
            SELECT a.vec_id::BIGINT AS vec_a, b.vec_id::BIGINT AS vec_b,
                   round(list_cosine_similarity(a.embedding, b.embedding)::DOUBLE, 4) AS sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding, b.embedding)::DOUBLE, 4) >= 0.45
        """,
        "embedding_mutual_knn": """
            WITH sims AS (
              SELECT a.vec_id AS ia, b.vec_id AS ib,
                     round(list_cosine_similarity(
                         a.embedding, b.embedding)::DOUBLE, 4) AS sim
              FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
            nn AS (
              SELECT ia, ib, sim,
                     row_number() OVER (PARTITION BY ia
                                        ORDER BY sim DESC, ib) AS rn
              FROM sims)
            SELECT n1.ia::BIGINT AS vec_a, n1.ib::BIGINT AS vec_b, n1.sim
            FROM nn n1 JOIN nn n2 ON n2.ia = n1.ib AND n2.ib = n1.ia
            WHERE n1.rn = 1 AND n2.rn = 1 AND n1.ia < n1.ib
        """,
        # same EXACT oracle: the banded path must reach full recall
        "embedding_near_dup_bucketed": """
            SELECT a.vec_id::BIGINT AS vec_a, b.vec_id::BIGINT AS vec_b,
                   round(list_cosine_similarity(a.embedding, b.embedding)::DOUBLE, 4) AS sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding, b.embedding)::DOUBLE, 4) >= 0.45
        """,
        "events_tumbling": """
            SELECT user_id::BIGINT AS user_id,
                   (epoch_us(ts) // 21600000000)::BIGINT AS window_id,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 4) AS sum_value,
                   min(value) AS min_value,
                   max(value) AS max_value
            FROM events GROUP BY 1, 2
        """,
        "events_sessionize": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
            m AS (SELECT user_id, ts_us, value,
                    CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
                         OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                            > 7200000000
                         THEN 1 ELSE 0 END AS is_start
                  FROM e),
            s AS (SELECT user_id, ts_us, value,
                    sum(is_start) OVER (PARTITION BY user_id ORDER BY ts_us
                                        ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
                  FROM m)
            SELECT user_id::BIGINT AS user_id, session_idx::BIGINT AS session_idx,
                   count(*)::BIGINT AS n_events,
                   min(ts_us)::BIGINT AS start_ts, max(ts_us)::BIGINT AS end_ts,
                   round(sum(value), 4) AS sum_value
            FROM s GROUP BY 1, 2
        """,
        "top_bigrams": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            w AS (SELECT doc_id, unnest(t) AS w,
                         generate_subscripts(t, 1) AS pos FROM toks),
            bg AS (SELECT a.w AS w1, b.w AS w2
                   FROM w a JOIN w b
                     ON a.doc_id = b.doc_id AND b.pos = a.pos + 1)
            SELECT w1, w2, count(*)::BIGINT AS n
            FROM bg GROUP BY 1, 2
            ORDER BY n DESC, w1 ASC, w2 ASC LIMIT 20
        """,
        "doc_bpe_tokens": """
            SELECT doc_id,
                   array_length(regexp_extract_all(text, ' ?[A-Za-z]+'))::BIGINT
                       AS n_alpha_tokens,
                   array_length(regexp_extract_all(text, ' ?[0-9]+'))::BIGINT
                       AS n_num_tokens,
                   array_length(regexp_extract_all(text,
                       ' ?[^ \tA-Za-z0-9]+'))::BIGINT AS n_other_tokens,
                   (array_length(regexp_extract_all(text, ' ?[A-Za-z]+'))
                    + array_length(regexp_extract_all(text, ' ?[0-9]+'))
                    + array_length(regexp_extract_all(text,
                        ' ?[^ \tA-Za-z0-9]+')))::BIGINT AS n_bpe_tokens
            FROM documents
        """,
        "doc_lm_score": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            w AS (SELECT doc_id, unnest(t) AS w,
                         generate_subscripts(t, 1) AS pos FROM toks),
            bg AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
                   FROM w a JOIN w b
                     ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
            cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
            cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY 1),
            vv AS (SELECT count(DISTINCT w) AS v FROM w),
            contrib AS (
              SELECT bg.doc_id, ln(cb.cb + 1) - ln(cu.cu + vv.v) AS x
              FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1)
              CROSS JOIN vv)
            SELECT doc_id::BIGINT AS doc_id,
                   count(*)::BIGINT AS n_bigrams,
                   round(sum(x) / count(*), 4) AS avg_logprob
            FROM contrib GROUP BY 1
        """,
        "lm_quality_buckets": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            w AS (SELECT doc_id, unnest(t) AS w,
                         generate_subscripts(t, 1) AS pos FROM toks),
            bg AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
                   FROM w a JOIN w b
                     ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
            cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
            cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY 1),
            vv AS (SELECT count(DISTINCT w) AS v FROM w),
            contrib AS (
              SELECT bg.doc_id, ln(cb.cb + 1) - ln(cu.cu + vv.v) AS x
              FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1)
              CROSS JOIN vv),
            scores AS (
              SELECT doc_id::BIGINT AS doc_id,
                     CAST(round(round(sum(x) / count(*), 4) * 10000, 0)
                          AS BIGINT) AS score_e4
              FROM contrib GROUP BY 1),
            rk AS (SELECT score_e4,
                          row_number() OVER (ORDER BY score_e4) AS rn,
                          count(*) OVER () AS n
                   FROM scores),
            b AS (SELECT max(CASE WHEN rn = (n + 2) // 3
                                  THEN score_e4 END) AS v1,
                         max(CASE WHEN rn = (2 * n + 2) // 3
                                  THEN score_e4 END) AS v2
                  FROM rk)
            SELECT s.doc_id, s.score_e4,
                   CASE WHEN s.score_e4 <= b.v1 THEN 'tail'
                        WHEN s.score_e4 <= b.v2 THEN 'middle'
                        ELSE 'head' END AS bucket
            FROM scores s CROSS JOIN b
        """,
        "dup_passages": f"""{PASSAGE_CTE},
            s AS (SELECT phash, count(DISTINCT doc_id) AS n_docs,
                         count(*) AS n_occ
                  FROM f GROUP BY phash HAVING count(DISTINCT doc_id) >= 2),
            firsts AS (SELECT phash, doc_id, pos0,
                              row_number() OVER (PARTITION BY phash
                                  ORDER BY doc_id, pos0) AS rn FROM f)
            SELECT s.phash, s.n_docs::BIGINT AS n_docs,
                   s.n_occ::BIGINT AS n_occ,
                   firsts.doc_id::BIGINT AS first_doc_id,
                   firsts.pos0::BIGINT AS first_pos
            FROM s JOIN firsts ON firsts.phash = s.phash AND firsts.rn = 1
        """,
        "doc_dup_passage_counts": f"""{PASSAGE_CTE},
            d AS (SELECT phash FROM f GROUP BY phash
                  HAVING count(DISTINCT doc_id) >= 2)
            SELECT f.doc_id::BIGINT AS doc_id,
                   count(*)::BIGINT AS n_dup_windows
            FROM f JOIN d USING (phash) GROUP BY 1
        """,
        "doc_novel_window_counts": f"""{PASSAGE_CTE},
            fo AS (SELECT phash, doc_id,
                          row_number() OVER (PARTITION BY phash
                                             ORDER BY doc_id, pos0) AS rn
                   FROM f)
            SELECT doc_id::BIGINT AS doc_id,
                   count(*)::BIGINT AS n_novel_windows
            FROM fo WHERE rn = 1 GROUP BY 1
        """,
        "doc_winnow_fingerprints": f"""{PASSAGE_CTE},
            wm AS (SELECT doc_id, pos0 AS i,
                          min(phash) OVER win AS mh,
                          count(*) OVER win AS cnt
                   FROM f WINDOW win AS (PARTITION BY doc_id ORDER BY pos0
                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
            sel AS (SELECT wm.doc_id, max(f2.pos0) AS pos
                    FROM wm JOIN f f2
                      ON f2.doc_id = wm.doc_id
                     AND f2.pos0 BETWEEN wm.i AND wm.i + 3
                     AND f2.phash = wm.mh
                    WHERE wm.cnt = 4
                    GROUP BY wm.doc_id, wm.i)
            SELECT DISTINCT s.doc_id::BIGINT AS doc_id,
                   s.pos::BIGINT AS pos, f3.phash
            FROM sel s JOIN f f3
              ON f3.doc_id = s.doc_id AND f3.pos0 = s.pos
        """,
        "doc_passage_scrub": f"""{PASSAGE_CTE},
            d AS (SELECT phash FROM f GROUP BY phash
                  HAVING count(DISTINCT doc_id) >= 2),
            occ AS (SELECT f.doc_id, f.pos0 FROM f JOIN d USING (phash)),
            cov AS (SELECT DISTINCT occ.doc_id, occ.pos0 + i.i AS tpos
                    FROM occ CROSS JOIN
                         (SELECT unnest(generate_series(0, 7)) AS i) i),
            kept AS (SELECT w.doc_id, w.w, w.pos - 1 AS tpos
                     FROM w LEFT JOIN cov
                       ON cov.doc_id = w.doc_id AND cov.tpos = w.pos - 1
                     WHERE cov.tpos IS NULL),
            nt AS (SELECT doc_id, count(*) AS n_tokens FROM w GROUP BY doc_id)
            SELECT nt.doc_id::BIGINT AS doc_id,
                   coalesce(string_agg(kept.w, ' ' ORDER BY kept.tpos), '')
                       AS clean_text,
                   count(kept.w)::BIGINT AS n_tokens_kept,
                   (nt.n_tokens - count(kept.w))::BIGINT AS n_tokens_removed
            FROM nt LEFT JOIN kept USING (doc_id)
            GROUP BY nt.doc_id, nt.n_tokens
        """,
        "events_retention": """
            WITH e AS (SELECT user_id,
                              epoch_us(ts) // 604800000000 AS week
                       FROM events),
            uw AS (SELECT DISTINCT user_id, week FROM e),
            f AS (SELECT user_id, min(week) AS cw FROM uw GROUP BY 1)
            SELECT f.cw::BIGINT AS cohort_week,
                   (uw.week - f.cw)::BIGINT AS week_offset,
                   count(*)::BIGINT AS n_users
            FROM uw JOIN f USING (user_id) GROUP BY 1, 2
        """,
        "events_bursts": """
            WITH c AS (
              SELECT event_type,
                     (epoch_us(ts) // 21600000000)::BIGINT AS window_id,
                     count(*)::BIGINT AS n_events
              FROM events GROUP BY 1, 2),
            t AS (SELECT event_type, sum(n_events) AS total,
                         count(*) AS nw
                  FROM c GROUP BY 1)
            SELECT c.event_type, c.window_id, c.n_events,
                   (CASE WHEN c.n_events * t.nw > 2 * t.total
                         THEN 1 ELSE 0 END)::BIGINT AS is_burst
            FROM c JOIN t USING (event_type)
        """,
        "events_value_quantiles": """
            WITH r AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM events),
            qs AS (SELECT unnest([25, 50, 75, 90]) AS qpct)
            SELECT r.event_type, qs.qpct / 100.0 AS q, r.value
            FROM r JOIN qs ON r.rn = (r.n * qs.qpct + 99) // 100
        """,
        "events_user_running": """
            WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts, value
                       FROM events)
            SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS user_id,
                   ts::BIGINT AS ts,
                   (row_number() OVER w)::BIGINT AS running_n,
                   round(sum(value) OVER w, 4) AS running_value
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING)
        """,
        "events_funnel": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_type
                       FROM events),
            s0 AS (SELECT user_id, min(ts) AS t FROM e
                   WHERE event_type = 'signup' GROUP BY 1),
            s1 AS (SELECT e.user_id, min(e.ts) AS t FROM e
                   JOIN s0 ON s0.user_id = e.user_id
                   WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t FROM e
                   JOIN s1 ON s1.user_id = e.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY 1)
            SELECT user_id::BIGINT AS user_id, 0::BIGINT AS stage_idx,
                   'signup' AS stage, t::BIGINT AS first_ts FROM s0
            UNION ALL SELECT user_id, 1, 'click', t FROM s1
            UNION ALL SELECT user_id, 2, 'purchase', t FROM s2
        """,
        "events_asof": """
            WITH c AS (
              SELECT user_id, epoch_us(ts) AS ts_us, min(event_id) AS r_event_id
              FROM events WHERE event_type = 'click' GROUP BY 1, 2),
            p AS (
              SELECT event_id, user_id, epoch_us(ts) AS ts_us
              FROM events WHERE event_type = 'purchase')
            SELECT p.event_id::BIGINT AS event_id, p.user_id::BIGINT AS user_id,
                   p.ts_us::BIGINT AS ts,
                   c.r_event_id::BIGINT AS r_event_id, c.ts_us::BIGINT AS r_ts,
                   (p.ts_us - c.ts_us)::BIGINT AS gap
            FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
        """,
        "events_type_stats": """
            SELECT event_type, count(*)::BIGINT AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1
        """,
        "customers_without_orders": """
            SELECT c_custkey::BIGINT AS c_custkey, c_name
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 400000.0)
        """,
        "events_user_hll": """
            WITH h AS (SELECT DISTINCT
                           ('0x'||substr(md5(user_id::VARCHAR), 1, 16))
                               ::UBIGINT AS hv
                       FROM events),
            rg AS (SELECT (hv >> 54)::BIGINT AS idx,
                          CASE WHEN (hv & ((1::UBIGINT << 54) - 1)) = 0
                               THEN 55
                               ELSE 54 - length(bin(
                                        hv & ((1::UBIGINT << 54) - 1))) + 1
                          END AS rank
                   FROM h),
            regs AS (SELECT i.idx, coalesce(max(rg.rank), 0) AS r
                     FROM (SELECT unnest(range(1024)) AS idx) i
                     LEFT JOIN rg ON rg.idx = i.idx GROUP BY 1),
            s AS (SELECT sum(power(2.0, -r)) AS z,
                         sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS zeros
                  FROM regs),
            e AS (SELECT (0.7213 / (1.0 + 1.079 / 1024)) * 1024 * 1024 / z
                             AS raw,
                         zeros
                  FROM s),
            f AS (SELECT CASE WHEN raw <= 2.5 * 1024 AND zeros > 0
                              THEN 1024 * ln(1024.0 / zeros)
                              ELSE raw END AS est
                  FROM e)
            SELECT (SELECT count(DISTINCT user_id) FROM events)::BIGINT
                       AS exact_distinct,
                   CAST(round(est, 0) AS BIGINT) AS hll_estimate
            FROM f
        """,
        "events_user_cms": """
            WITH ex AS (SELECT user_id, count(*) AS exact_count
                        FROM events GROUP BY 1),
            top AS (SELECT user_id, exact_count FROM ex
                    ORDER BY exact_count DESC, user_id LIMIT 20),
            rws AS (SELECT unnest([0, 1, 2, 3]) AS r),
            cms AS (SELECT r.r,
                           ('0x'||substr(md5(r.r||':'||e.user_id), 1, 8))
                               ::BIGINT % 256 AS b,
                           count(*) AS cnt
                    FROM events e CROSS JOIN rws r GROUP BY 1, 2),
            est AS (SELECT t.user_id, t.exact_count, min(c.cnt) AS est
                    FROM top t CROSS JOIN rws r
                    JOIN cms c ON c.r = r.r
                     AND c.b = ('0x'||substr(md5(r.r||':'||t.user_id), 1, 8))
                                   ::BIGINT % 256
                    GROUP BY 1, 2)
            SELECT user_id::BIGINT AS user_id,
                   exact_count::BIGINT AS exact_count,
                   est::BIGINT AS cms_estimate
            FROM est
        """,
        "events_top_users": """
            WITH c AS (SELECT event_type, user_id, count(*) AS n
                       FROM events GROUP BY event_type, user_id),
            r AS (SELECT event_type, user_id, n,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY n DESC, user_id) AS rn
                  FROM c)
            SELECT event_type, rn::BIGINT AS rn, user_id::BIGINT AS user_id,
                   n::BIGINT AS n
            FROM r WHERE rn <= 5
        """,
        "large_order_customers": """
            WITH t AS (SELECT l_orderkey, sum(l_quantity) AS q
                       FROM lineitem GROUP BY 1
                       HAVING sum(l_quantity) > 250)
            SELECT t.l_orderkey::BIGINT AS o_orderkey,
                   t.q::BIGINT AS total_qty,
                   o.o_custkey::BIGINT AS o_custkey
            FROM t JOIN orders o ON o.o_orderkey = t.l_orderkey
        """,
        "orders_rollup": """
            SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                   coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                   count(*)::BIGINT AS n_orders,
                   sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))::BIGINT
                       AS sum_cents
            FROM orders
            GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "part_type_supplier_counts": """
            SELECT p_type, count(DISTINCT l_suppkey)::BIGINT AS n_suppliers
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_type
        """,
        "top_orders_per_customer": """
            WITH r AS (
              SELECT o_custkey, o_orderkey,
                     CAST(round(o_totalprice * 100, 0) AS BIGINT)
                         AS price_cents,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC,
                                                 o_orderkey) AS rn
              FROM orders)
            SELECT o_custkey::BIGINT AS o_custkey, rn::BIGINT AS rn,
                   o_orderkey::BIGINT AS o_orderkey, price_cents
            FROM r WHERE rn <= 3
        """,
        "latest_order_per_customer": """
            WITH r AS (
              SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS odate_us,
                     CAST(round(o_totalprice * 100, 0) AS BIGINT)
                         AS price_cents,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate DESC,
                                                 o_orderkey) AS rn
              FROM orders)
            SELECT o_custkey::BIGINT AS o_custkey,
                   o_orderkey::BIGINT AS o_orderkey,
                   odate_us::BIGINT AS odate_us, price_cents
            FROM r WHERE rn = 1
        """,
        "late_shipment_priority_counts": """
            SELECT o_orderpriority, count(*)::BIGINT AS n_late_orders
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate
                                               + INTERVAL 60 DAY)
            GROUP BY 1
        """,
        "top_segment_order_revenue": """
            SELECT l.l_orderkey::BIGINT AS o_orderkey,
                   sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100, 0)
                                     AS BIGINT)))::BIGINT AS revenue_e4,
                   epoch_us(o.o_orderdate)::BIGINT AS odate_us,
                   o.o_orderpriority
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < DATE '1995-03-15'
              AND l.l_shipdate > DATE '1995-03-15'
            GROUP BY 1, 3, 4
            ORDER BY revenue_e4 DESC, o_orderkey
            LIMIT 10
        """,
        "ship_latency_histogram": """
            SELECT CAST(floor((epoch_us(l_shipdate) - epoch_us(o_orderdate))
                              / 86400000000.0) AS BIGINT) AS latency_days,
                   count(*)::BIGINT AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1
        """,
        "lineitem_pricing_summary": """
            WITH li AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(round(l_quantity, 0) AS BIGINT) AS qty_i,
                     CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS ext_c,
                     CAST(round(l_discount * 100, 0) AS BIGINT) AS d100,
                     CAST(round(l_tax * 100, 0) AS BIGINT) AS t100
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02 23:59:59')
            SELECT l_returnflag, l_linestatus,
                   sum(qty_i)::BIGINT AS sum_qty,
                   sum(ext_c)::BIGINT AS sum_base_cents,
                   sum(ext_c * (100 - d100))::BIGINT AS sum_disc_e4,
                   sum(ext_c * (100 - d100) * (100 + t100))::BIGINT
                       AS sum_charge_e6,
                   count(*)::BIGINT AS count_order,
                   round(sum(qty_i)::DOUBLE / count(*), 4) AS avg_qty,
                   round(sum(ext_c)::DOUBLE / count(*), 4) AS avg_price_cents,
                   round(sum(d100)::DOUBLE / count(*), 4) AS avg_disc100
            FROM li GROUP BY 1, 2
        """,
        "kgx_rdf_import": f"""
            WITH choice AS (
              SELECT doc_id,
                     ('0x'||substr(md5('kgx:'||doc_id||':0'),1,8))::BIGINT
                         % {len(_kgx_sql.KGX_TEMPLATES)} AS tid,
                     ('0x'||substr(md5('kgx:'||doc_id||':1'),1,8))::BIGINT % 20 AS p_idx,
                     ('0x'||substr(md5('kgx:'||doc_id||':3'),1,8))::BIGINT % 4 AS o_idx
              FROM documents)
            SELECT 'p'||p_idx AS src, 'o'||o_idx AS dst, 'r'||tid AS rel_type,
                   count(*)::BIGINT AS n
            FROM choice GROUP BY 1, 2, 3
        """,
        "kgx_entity_temporal": """
            WITH choice AS (
              SELECT doc_id,
                     ('0x'||substr(md5('kgx:'||doc_id||':1'),1,8))::BIGINT % 20 AS p_idx,
                     1900 + ('0x'||substr(md5('kgx:'||doc_id||':6'),1,8))::BIGINT % 120
                         AS year
              FROM documents),
            persons(idx, pname) AS (VALUES """ + ",".join(
                f"({i},'{n}')" for i, n in enumerate(_kgx_sql.KGX_PERSONS)
            ) + """),
            ts AS (SELECT p.pname AS entity_name,
                          (c.year - 1970) * 31536000 AS t
                   FROM choice c JOIN persons p ON p.idx = c.p_idx)
            SELECT entity_name,
                   min(t)::BIGINT AS first_mentioned,
                   max(t)::BIGINT AS last_mentioned,
                   min(t)::BIGINT AS valid_from,
                   max(t)::BIGINT AS valid_to
            FROM ts GROUP BY entity_name
        """,
        "kgx_temporal_snapshot": f"""
            WITH choice AS (
              SELECT doc_id,
                     ('0x'||substr(md5('kgx:'||doc_id||':1'),1,8))::BIGINT
                         % {len(_kgx_sql.KGX_PERSONS)} AS p_idx,
                     ('0x'||substr(md5('kgx:'||doc_id||':3'),1,8))::BIGINT
                         % {len(_kgx_sql.KGX_ORGS)} AS o_idx,
                     1900 + ('0x'||substr(md5('kgx:'||doc_id||':6'),1,8))::BIGINT % 120
                         AS year
              FROM documents),
            persons(idx, pname) AS (VALUES """ + ",".join(
                f"({i},'{n}')" for i, n in enumerate(_kgx_sql.KGX_PERSONS)
            ) + """),
            orgs(idx, oname) AS (VALUES """ + ",".join(
                f"({i},'{n}')" for i, (n, _s) in enumerate(_kgx_sql.KGX_ORGS)
            ) + """),
            active AS (
              SELECT p.pname AS src, o.oname AS dst
              FROM choice c
              JOIN persons p ON p.idx = c.p_idx
              JOIN orgs o ON o.idx = c.o_idx
              WHERE c.year BETWEEN 1950 AND 1999),
            deg AS (
              SELECT src AS node_id, count(*)::BIGINT AS degree FROM active
                GROUP BY 1
              UNION ALL
              SELECT dst, count(*)::BIGINT FROM active GROUP BY 1)
            SELECT node_id, sum(degree)::BIGINT AS degree
            FROM deg GROUP BY node_id
        """,
        "kgx_doc_entities": _kgx_sql.kgx_doc_entities_sql(),
        "kgx_entities": _kgx_sql.kgx_entities_sql(),
        "kgx_alias_map": _kgx_sql.kgx_alias_map_sql(),
        "kgx_edges": _kgx_sql.kgx_edges_sql(),
        "kgx_triples": _kgx_sql.kgx_triples_sql(),
        "kgx_chunks": _kgx_sql.kgx_chunks_sql(),
        "kgx_mentions": _kgx_sql.kgx_mentions_sql(),
        "kgx_stats": _kgx_sql.kgx_stats_sql(),
        "kgx_cooccur": _kgx_sql.kgx_cooccur_sql(),
        "kgx_common_entities": _kgx_sql.kgx_common_entities_sql(),
        "kgx_components": _kgx_sql.kgx_components_sql(),
        "kgx_louvain": _kgx_sql.kgx_louvain_sql(),
        "kgx_graph_metrics": _kgx_sql.kgx_graph_metrics_sql(),
        "kgx_pagerank": _kgx_sql.kgx_pagerank_sql(),
        "kgx_centrality": _kgx_sql.kgx_centrality_sql(),
        "kgx_enriched": _kgx_sql.kgx_enriched_sql(),
        "kgx_yake": _kgx_sql.kgx_yake_sql(),
        "kgx_incremental": _kgx_sql.kgx_triples_sql(),
        "kgx_fuzzy_entities": _kgxf_sql.kgx_fuzzy_entities_sql(),
        "kgx_fuzzy_alias_map": _kgxf_sql.kgx_fuzzy_alias_map_sql(),
        "kgx_fuzzy_edges": _kgxf_sql.kgx_fuzzy_edges_sql(),
        "kgx_fuzzy_triples": _kgxf_sql.kgx_fuzzy_triples_sql(),
        "syn_doc_entities": _synkg_sql.syn_doc_entities_sql(),
        "syn_entities": _synkg_sql.syn_entities_sql(),
        "syn_alias_map": _synkg_sql.syn_alias_map_sql(),
        "syn_edges": _synkg_sql.syn_edges_sql(),
        "syn_stats": _synkg_sql.syn_stats_sql(),
        "syn_cooccur": _synkg_sql.syn_cooccur_sql(),
        "syn_common_entities": _synkg_sql.syn_common_entities_sql(),
        "syn_components": _synkg_sql.syn_components_sql(),
        "syn_triangles": _synkg_sql.syn_triangles_sql(),
        "syn_link_pred": _synkg_sql.syn_link_pred_sql(),
        "syn_lpa": _synkg_sql.syn_lpa_sql(),
        "kgx_link_pred": _synkg_sql.kgx_link_pred_sql(),
        "kgx_lpa": _synkg_sql.kgx_lpa_sql(),
        "syn_kcore": _synkg_sql.syn_kcore_sql(),
        "kgx_triangles": _synkg_sql.kgx_triangles_sql(),
        "kgx_kcore": _synkg_sql.kgx_kcore_sql(),
        "kgx_eccentricity": _synkg_sql.kgx_eccentricity_sql(),
        "kgx_assortativity": _synkg_sql.kgx_assortativity_sql(),
        "kgx_component_sizes": _synkg_sql.kgx_component_sizes_sql(),
        "syn_assortativity": _synkg_sql.syn_assortativity_sql(),
        "syn_component_sizes": _synkg_sql.syn_component_sizes_sql(),
        "syn_hits": _synkg_sql.syn_hits_sql(),
        "kgx_hits": _synkg_sql.kgx_hits_sql(),
        "syn_eccentricity": _synkg_sql.syn_eccentricity_sql(),
        "syn_leiden": _synkg_sql.syn_leiden_sql(),
        "syn_leiden_l1": _synkg_sql.syn_leiden_l1_sql(),
        "syn_leiden_l2": _synkg_sql.syn_leiden_l2_sql(),
        "kgx_leiden": _synkg_sql.kgx_leiden_sql(),
        "kgx_leiden_l1": _synkg_sql.kgx_leiden_l1_sql(),
        "kgx_rel_hierarchy": _synkg_sql.kgx_rel_hierarchy_sql(),
        "syn_louvain": _synkg_sql.syn_louvain_sql(),
        "syn_graph_metrics": _synkg_sql.syn_graph_metrics_sql(),
        "syn_pagerank": _synkg_sql.syn_pagerank_sql(),
        "syn_centrality": _synkg_sql.syn_centrality_sql(),
        "syn_mentions": _synkg_sql.syn_mentions_sql(),
        # flagship (kg_*) twins: the CHUNKED corpus replay (_kg_full_cte —
        # recursive chunker + per-chunk word-stream extraction + chunk→doc
        # rollup into the same canonicalization/edge replay)
        "kg_entities": _synkg_sql.kg_entities_sql(),
        "kg_alias_map": _synkg_sql.kg_alias_map_sql(),
        "kg_triples": _synkg_sql.kg_triples_sql(),
        "kg_stats": _synkg_sql.kg_stats_sql(),
        "kg_cooccur_edges": _synkg_sql.kg_cooccur_sql(),
        "kg_common_entities": _synkg_sql.kg_common_entities_sql(),
        "kg_components": _synkg_sql.kg_components_sql(),
        "kg_louvain": _synkg_sql.kg_louvain_sql(),
        "kg_graph_metrics": _synkg_sql.kg_graph_metrics_sql(),
        "kg_pagerank": _synkg_sql.kg_pagerank_sql(),
        "kg_leiden": _synkg_sql.kg_leiden_sql(),
        "kg_leiden_l1": _synkg_sql.kg_leiden_l1_sql(),
        "kg_communities": _synkg_sql.kg_communities_sql(),
        "kg_community_summaries": _synkg_sql.kg_community_summaries_sql(),
        "kg_gleaning_extraction": _synkg_sql.kg_gleaning_sql(),
        "kg_atomic_facts": _syn_sql.kg_atomic_facts_sql(),
        "kg_validated_facts": _syn_sql.kg_validated_facts_sql(),
        "kg_yake_keywords": _syn_sql.kg_yake_sql(),
        "kg_enriched_chunks": _syn_sql.kg_enriched_sql(),
        "kg_centrality": _synkg_sql.kg_centrality_sql(),
        "kg_mentions": _synkg_sql.kg_mentions_sql(),
        "syn_incremental": _synkg_sql.syn_triples_sql(),
        "syn_boundaries": _syn_sql.syn_boundaries_sql(),
        "syn_query_analysis": _synkg_sql.syn_query_analysis_sql(),
        "kgx_structure": _kgx_sql.kgx_structure_sql(),
        "kgx_causal_chains": _kgx_sql.kgx_causal_sql(),
        "syn_anchors": _synkg_sql.syn_anchors_sql(),
        "kgx_metadata_search": _kgx_sql.kgx_metadata_search_sql(),
        "syn_contextual_chunks": _syn_sql.syn_contextual_sql(),
        "syn_triples": _synkg_sql.syn_triples_sql(),
        "kgx_graphml_import": _kgx_sql.kgx_graphml_import_sql(),
        "kgx_csv_import": _kgx_sql.kgx_csv_import_sql(),
        "kgx_layout": _kgx_sql.kgx_layout_sql(),
        "kgx_community_summaries": _kgx_sql.kgx_community_summaries_sql(),
        "kgx_ppr": _kgx_sql.kgx_ppr_sql(),
        "kgx_media_meta": _kgx_sql.kgx_media_meta_sql(),
        "kgx_media_frames": _kgx_sql.kgx_media_frames_sql(),
        "kgx_atomic_facts": _kgx_sql.kgx_atomic_facts_sql(),
        "kgx_validated_facts": _kgx_sql.kgx_validated_facts_sql(),
        "kgx_gleaning": _kgx_sql.kgx_gleaning_sql(),
        "ann_topk": """
            SELECT vec_id::BIGINT AS vec_id,
                   round(list_cosine_similarity(embedding,
                       (SELECT embedding FROM embeddings WHERE vec_id = 0))::DOUBLE, 4) AS sim
            FROM embeddings
            ORDER BY sim DESC, vec_id ASC LIMIT 10
        """,
        "ann_lsh_topk": _ann_lsh_sql(),
        "dedup_semantic_keep": _kgx_sql.dedup_semantic_keep_sql(),
        "bm25_topk": _kgx_sql.bm25_topk_sql(),
        "hybrid_topk": _kgx_sql.hybrid_topk_sql(),
        "dual_retrieval_topk": _kgx_sql.dual_retrieval_sql(),
        "dual_retrieval_weighted": _kgx_sql.dual_retrieval_sql(
            strategy="weighted"),
        "ann_ivf_topk": _ann_ivf_sql(),
        "ivf_cluster_sizes": _ivf_cluster_sizes_sql(),
        "embedding_pca_top": _pca_top_sql(),
        "rrf_fusion": """
            WITH cos AS (
              SELECT vec_id,
                     round(list_cosine_similarity(embedding,
                         (SELECT embedding FROM embeddings WHERE vec_id = 0)
                     )::DOUBLE, 4) AS sim
              FROM embeddings ORDER BY sim DESC, vec_id LIMIT 100),
            cr AS (SELECT vec_id,
                          row_number() OVER (ORDER BY sim DESC, vec_id) AS r
                   FROM cos),
            lab AS (SELECT vec_id, label FROM embeddings
                    ORDER BY label DESC, vec_id LIMIT 100),
            lr AS (SELECT vec_id,
                          row_number() OVER (ORDER BY label DESC, vec_id) AS r
                   FROM lab),
            u AS (SELECT vec_id, r FROM cr UNION ALL SELECT vec_id, r FROM lr),
            s AS (SELECT vec_id, sum(1.0 / (60 + r)) AS score
                  FROM u GROUP BY vec_id)
            SELECT vec_id::BIGINT AS vec_id, round(score, 6) AS rrf
            FROM s ORDER BY rrf DESC, vec_id LIMIT 10
        """,
        "dedup_minhash_pairs": f"""
            WITH toks AS (
              SELECT doc_id, list_filter(
                         regexp_split_to_array(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS t
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN array_length(t) < 3 THEN [array_to_string(t, ' ')]
                          ELSE list_distinct(list_transform(
                              generate_series(1, array_length(t) - 2),
                              i -> array_to_string(t[i:i+2], ' '))) END AS s
              FROM toks),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     array_length(list_intersect(a.s, b.s))::DOUBLE /
                     array_length(list_distinct(list_concat(a.s, b.s))) AS j
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE array_length(a.s) > 0 OR array_length(b.s) > 0)
            SELECT doc_a::BIGINT AS doc_a, doc_b::BIGINT AS doc_b,
                   round(j, 4) AS jaccard
            FROM pairs WHERE j >= 0.5
        """,
        "dedup_ngram_pairs": f"""
            WITH toks AS (
              SELECT doc_id, list_filter(
                         regexp_split_to_array(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS t
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN array_length(t) < 3 THEN [array_to_string(t, ' ')]
                          ELSE list_distinct(list_transform(
                              generate_series(1, array_length(t) - 2),
                              i -> array_to_string(t[i:i+2], ' '))) END AS s
              FROM toks),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     array_length(list_intersect(a.s, b.s))::DOUBLE /
                     array_length(list_distinct(list_concat(a.s, b.s))) AS j
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE array_length(a.s) > 0 OR array_length(b.s) > 0)
            SELECT doc_a::BIGINT AS doc_a, doc_b::BIGINT AS doc_b,
                   round(j, 4) AS jaccard
            FROM pairs WHERE j >= 0.5
        """,
        "dedup_ngram_keep": """
            WITH RECURSIVE toks AS (
              SELECT doc_id, list_filter(
                         regexp_split_to_array(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS t
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN array_length(t) < 3 THEN [array_to_string(t, ' ')]
                          ELSE list_distinct(list_transform(
                              generate_series(1, array_length(t) - 2),
                              i -> array_to_string(t[i:i+2], ' '))) END AS s
              FROM toks),
            pairs AS (
              SELECT a.doc_id AS va, b.doc_id AS vb
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE array_length(list_intersect(a.s, b.s))::DOUBLE /
                    array_length(list_distinct(list_concat(a.s, b.s)))
                    >= 0.5),
            und AS (SELECT va AS a, vb AS b FROM pairs
                    UNION SELECT vb, va FROM pairs),
            reach(a, b) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b)
            SELECT a::BIGINT AS doc_id, min(b)::BIGINT AS keep_id
            FROM reach GROUP BY a
        """,
        "events_hopping": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
            x AS (SELECT user_id, t // 10800000000 - k.k AS window_id, value
                  FROM e CROSS JOIN (VALUES (0),(1)) k(k))
            SELECT user_id::BIGINT AS user_id, window_id::BIGINT AS window_id,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM x GROUP BY 1, 2
        """,
        "dedup_simhash": _SIMHASH_SQL,
        "dedup_simhash_pairs": f"""
            WITH sigs AS ({_SIMHASH_SQL})
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
            FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
    }

    # the LSH-sourced keep table shares the exact-Jaccard closure contract
    # (pair-set equality at this threshold is the dedup_minhash_pairs
    # oracle's own guarantee), so the SQL twin is identical
    oracles["dedup_minhash_keep"] = oracles["dedup_ngram_keep"]
    oracles["dedup_simhash_keep"] = f"""
        WITH RECURSIVE sigs AS ({_SIMHASH_SQL}),
        pairs AS (SELECT a.doc_id AS va, b.doc_id AS vb
                  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
                  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
        und AS (SELECT va AS a, vb AS b FROM pairs
                UNION SELECT vb, va FROM pairs),
        reach(a, b) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b)
        SELECT a::BIGINT AS doc_id, min(b)::BIGINT AS keep_id
        FROM reach GROUP BY a
    """
    oracles["winnow_dup_pairs"] = f"""
        WITH win AS ({oracles["doc_winnow_fingerprints"]}),
        du AS (SELECT DISTINCT doc_id, phash FROM win),
        df AS (SELECT phash, count(*) AS c FROM du GROUP BY phash),
        keep AS (SELECT phash FROM df WHERE c BETWEEN 2 AND 10),
        p AS (SELECT a.doc_id AS da, b.doc_id AS db
              FROM du a JOIN du b USING (phash) JOIN keep USING (phash)
              WHERE a.doc_id < b.doc_id)
        SELECT da::BIGINT AS doc_a, db::BIGINT AS doc_b,
               count(*)::BIGINT AS n_shared
        FROM p GROUP BY 1, 2 HAVING count(*) >= 2
    """
    oracles["curation_pipeline"] = f"""
        WITH v AS ({oracles["doc_filter_verdict"]}),
             k AS ({oracles["dedup_ngram_keep"]}),
             s AS ({oracles["doc_split"]})
        SELECT v.doc_id, s.split, v.n_tokens
        FROM v JOIN k USING (doc_id) JOIN s USING (doc_id)
        WHERE v.keep AND k.keep_id = v.doc_id
    """
    return oracles


def _ivf_train_parts(k_cent: int = 16, iters: int = 10,
                     sample_n: int = 1024) -> tuple[list, str]:
    """Shared IVF trainer replay: re-derives the strided-init float64
    Lloyd quantizer (stages/ann.py train_ivf_centroids) in SQL — sample =
    ``vec_id < 1024 ORDER BY vec_id``, init = every ⌊n/k⌋-th row, then
    ``iters`` unrolled assign/update rounds (assignment ties broken by
    centroid index, matching np.argmin; empty cells keep their centroid).
    Returns (CTE parts incl. the full-corpus assignment ``alla``, final
    centroid CTE name)."""
    d2 = ("list_sum(list_transform(generate_series(1, array_length(s.v)), "
          "j -> (s.v[j] - ct.v[j]) * (s.v[j] - ct.v[j])))")
    parts = [f"""
        samp AS MATERIALIZED (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS sid,
                 embedding::DOUBLE[] AS v
          FROM embeddings WHERE vec_id < {sample_n}),
        prm AS (SELECT least({k_cent}, count(*))::BIGINT AS k,
                       greatest(1, count(*) // {k_cent})::BIGINT AS stride
                FROM samp),
        c0 AS MATERIALIZED (SELECT (sid // stride)::INT AS c, v
               FROM samp, prm
               WHERE sid % stride = 0 AND sid // stride < k)"""]
    for i in range(iters):
        parts.append(f"""
        a{i} AS MATERIALIZED (
          SELECT sid, c FROM (
            SELECT sid, c, row_number() OVER (PARTITION BY sid
                                              ORDER BY d2, c) AS rn
            FROM (SELECT s.sid AS sid, ct.c AS c, {d2} AS d2
                  FROM samp s CROSS JOIN c{i} ct) z1) z2
          WHERE rn = 1),
        c{i + 1} AS MATERIALIZED (
          SELECT p.c, coalesce(m.v, p.v) AS v
          FROM c{i} p LEFT JOIN (
            SELECT c, list(mv ORDER BY dim) AS v FROM (
              SELECT aa.c AS c, g.dim AS dim, avg(s.v[g.dim]) AS mv
              FROM a{i} aa
              JOIN samp s ON s.sid = aa.sid
              CROSS JOIN (SELECT unnest(generate_series(1,
                              (SELECT array_length(v) FROM samp LIMIT 1)))
                          AS dim) g
              GROUP BY aa.c, g.dim) z3
            GROUP BY c) m ON m.c = p.c)""")
    cf = f"c{iters}"
    parts.append(f"""
        alla AS (
          SELECT vec_id, c FROM (
            SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY d2, c) AS rn
            FROM (SELECT s.vec_id AS vec_id, ct.c AS c,
                         list_sum(list_transform(
                             generate_series(1, array_length(s.v)),
                             j -> (s.v[j] - ct.v[j]) * (s.v[j] - ct.v[j])))
                             AS d2
                  FROM (SELECT vec_id, embedding::DOUBLE[] AS v
                        FROM embeddings) s
                  CROSS JOIN {cf} ct) z6) z7
          WHERE rn = 1)""")
    return parts, cf


def _ann_ivf_sql(k_cent: int = 16, iters: int = 10, nprobe: int = 4,
                 sample_n: int = 1024) -> str:
    """IVF top-k oracle: the shared trainer replay, probing the query's
    nprobe nearest cells and scoring survivors with the same
    float32-compatible cosine as ann_topk. The only divergence from the
    pipeline is float summation order, far inside the assignment
    margins."""
    parts, cf = _ivf_train_parts(k_cent, iters, sample_n)
    parts.append(f"""
        qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id = 0),
        probe AS (
          SELECT c FROM (
            SELECT c, row_number() OVER (ORDER BY d2, c) AS rn
            FROM (SELECT ct.c AS c,
                         list_sum(list_transform(
                             generate_series(1, array_length(s.v)),
                             j -> (s.v[j] - ct.v[j]) * (s.v[j] - ct.v[j])))
                             AS d2
                  FROM qv s CROSS JOIN {cf} ct) z4) z5
          WHERE rn <= {nprobe}),
        cand AS (SELECT vec_id FROM alla
                 WHERE c IN (SELECT c FROM probe))""")
    return ("WITH " + ",".join(parts) + """
        SELECT e.vec_id::BIGINT AS vec_id,
               round(list_cosine_similarity(e.embedding,
                   (SELECT embedding FROM embeddings WHERE vec_id = 0)
               )::DOUBLE, 4) AS sim
        FROM embeddings e JOIN cand USING (vec_id)
        ORDER BY sim DESC, vec_id ASC LIMIT 10
    """)


def _ivf_cluster_sizes_sql(k_cent: int = 16, iters: int = 10,
                           sample_n: int = 1024) -> str:
    """k-means cluster-size oracle: every embedding assigned to its
    nearest trained centroid (the same ``alla`` assignment the IVF top-k
    probe uses); empty cells report 0."""
    parts, cf = _ivf_train_parts(k_cent, iters, sample_n)
    return ("WITH " + ",".join(parts) + f"""
        SELECT ct.c::BIGINT AS centroid,
               coalesce(m.n, 0)::BIGINT AS n_vecs
        FROM {cf} ct LEFT JOIN (
          SELECT c, count(*) AS n FROM alla GROUP BY c) m ON m.c = ct.c
    """)


def _pca_top_sql(iters: int = 20) -> str:
    """PCA top-component oracle: the same mean-centered covariance and
    uniform-init power iteration as stages/ann.pca_top_component, unrolled
    ``iters`` rounds (each round MATERIALIZED — referenced twice by the
    next). Divergence from the pipeline is float summation order only,
    ~1e-11 against the 1e-4 rounding."""
    parts = ["""
        e AS MATERIALIZED (SELECT embedding::DOUBLE[] AS v FROM embeddings),
        nn AS (SELECT count(*)::DOUBLE AS n FROM e),
        dims AS MATERIALIZED (
          SELECT unnest(generate_series(1,
              (SELECT array_length(v) FROM e LIMIT 1))) AS i),
        m AS MATERIALIZED (
          SELECT d.i AS i, sum(e.v[d.i]) AS s
          FROM e CROSS JOIN dims d GROUP BY 1),
        s2 AS MATERIALIZED (
          SELECT a.i AS i, b.i AS j, sum(e.v[a.i] * e.v[b.i]) AS s
          FROM e CROSS JOIN dims a CROSS JOIN dims b GROUP BY 1, 2),
        cov AS MATERIALIZED (
          SELECT s2.i, s2.j,
                 s2.s / nn.n - (ma.s / nn.n) * (mb.s / nn.n) AS c
          FROM s2 JOIN m ma ON ma.i = s2.i JOIN m mb ON mb.i = s2.j
          CROSS JOIN nn),
        v0 AS MATERIALIZED (
          SELECT i, 1.0 / sqrt((SELECT count(*) FROM dims)) AS val
          FROM dims)"""]
    prev = "v0"
    for k in range(1, iters + 1):
        parts.append(f""",
        w{k} AS MATERIALIZED (
          SELECT cov.i, sum(cov.c * p.val) AS w
          FROM cov JOIN {prev} p ON p.i = cov.j GROUP BY 1),
        v{k} AS MATERIALIZED (
          SELECT i, w / sqrt((SELECT sum(w * w) FROM w{k})) AS val
          FROM w{k})""")
        prev = f"v{k}"
    parts.append(f"""
        SELECT (i - 1)::BIGINT AS dim, round(val, 4) AS loading
        FROM {prev}""")
    return "WITH " + "".join(parts)


def _ann_lsh_sql() -> str:
    """LSH top-k oracle: the hyperplane constants are data-independent
    (seeded RandomState(7), dim 64) and inlined as exact doubles of the
    float32 planes; signature/Hamming filtering is recomputed independently
    in SQL (sign margins are >6e-5 on the testdata — float32-safe)."""
    import numpy as np  # noqa: PLC0415

    from graphrag_ray.stages.ann import _planes

    planes = _planes(64)
    rows = ",".join(
        f"({r}, [{','.join(repr(float(v)) for v in planes[r])}]::DOUBLE[])"
        for r in range(planes.shape[0])
    )
    assert np.isfinite(planes).all()
    return f"""
        WITH planes(r, p) AS (VALUES {rows}),
        sigs AS (
          SELECT e.vec_id,
                 sum(CASE WHEN list_inner_product(e.embedding::DOUBLE[], pl.p) > 0
                          THEN (1::BIGINT << pl.r) ELSE 0 END)::BIGINT AS sig
          FROM embeddings e CROSS JOIN planes pl
          GROUP BY e.vec_id),
        qsig AS (SELECT sig FROM sigs WHERE vec_id = 0),
        cand AS (
          SELECT s.vec_id FROM sigs s, qsig
          WHERE bit_count(xor(s.sig, qsig.sig)) <= 2)
        SELECT e.vec_id::BIGINT AS vec_id,
               round(list_cosine_similarity(e.embedding,
                   (SELECT embedding FROM embeddings WHERE vec_id = 0))::DOUBLE,
                   4) AS sim
        FROM embeddings e JOIN cand USING (vec_id)
        ORDER BY sim DESC, vec_id ASC LIMIT 10
    """
