"""Pipeline configuration.

The reference drives operator selection through a large TOML/JSON5 ``Config``
struct (reference: graphrag-core/src/config/mod.rs:55-77); we use one frozen
dataclass with the same defaults where semantics overlap
(config/mod.rs:1307-1349: chunk 1000/200, min_confidence 0.7,
relationship_confidence 0.5, embedding dim 384, max_connections 10).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- chunking (reference: text/mod.rs:141-187, config/mod.rs:1307-1313)
    chunk_size: int = 1000
    chunk_overlap: int = 200
    # 'legacy' = sliding window + sentence snap (text/mod.rs:141-187);
    # 'hierarchical' = recursive-separator splitter (text/chunking.rs:6-152)
    chunking_strategy: str = "legacy"
    min_chunk_size: int = 50  # hierarchical only

    # --- extraction (reference: entity/mod.rs:114-173, config/mod.rs:1317)
    min_confidence: float = 0.7
    entity_types: tuple[str, ...] = ("PERSON", "ORGANIZATION", "LOCATION")
    extract_relationships: bool = True
    relationship_confidence: float = 0.5  # config/mod.rs:1344

    # --- canonicalization (reference: corpus/entity_linker.rs:379-429,
    #     entity/string_similarity_linker.rs:68-165)
    fuzzy_threshold: float = 0.85
    # 'fuzzy' = greedy seed-absorb clustering (entity_linker.rs:379-429);
    # 'lmcd' = confident-dedup: exact names merge, merely-similar names
    # become low-confidence singletons (entity_linker.rs:296-376)
    linking_strategy: str = "fuzzy"
    max_edit_distance: int = 2
    use_phonetic: bool = False
    # hot-key skew: number of salt partitions for the two-phase
    # canonicalization aggregate (0/1 disables the salted intermediate)
    salt_partitions: int = 8
    # partial-row volume below which the salted pre-merge exchange is
    # skipped (the finalize group merge collapses salts itself); the
    # pre-merge pays off only when hot keys make the final exchange wide
    salted_premerge_min_rows: int = 500_000
    # 'exact' carries per-key doc-id lists (exact doc_frequency);
    # 'hll' swaps in fixed-size HyperLogLog registers — bounded per-key
    # payload for Zipf-hot entities at corpus scale, ~1.04/sqrt(2^p) error
    doc_frequency_mode: str = "exact"
    hll_precision: int = 10
    # 'salted_groupby' (DEFAULT) = keyed (bucket, salt) exchange with
    # explicit hot-key salting — scales to key spaces beyond single-task
    # memory and is the benched flagship path;
    # 'tree' = sort-free hierarchical combine ending in a single driver
    # finalize (slightly cheaper while distinct entity keys fit one task)
    canonical_merge: str = "salted_groupby"

    # --- edges
    max_contexts_per_edge: int = 8  # provenance sample cap per edge
    # 'groupby' (DEFAULT) = local combine level + keyed shuffle — the
    # distinct-edge set never has to fit one task; benched flagship path;
    # 'tree' = sort-free reduce tree whose last level is a single task
    # (cheapest while the reduced edge set fits one task's memory)
    edge_merge: str = "groupby"

    # --- embeddings (reference: vector/mod.rs:573-660, config/mod.rs:1295)
    embedding_dim: int = 384

    # --- communities (reference: graph/leiden.rs:429-520)
    leiden_resolution: float = 1.0
    leiden_seed: int = 42
    leiden_max_iterations: int = 100
    community_summary_max_length: int = 2000

    # --- execution tuning
    chunk_batch_size: int = 64  # documents per chunker batch (chunks table)
    # documents per fused chunk+extract UDF call; also the docs-per-task
    # granularity of the hot stage (bigger → better combiner compression,
    # smaller → more parallelism)
    extract_batch_size: int = 48
    extract_concurrency: int | None = None  # None → let Ray elastically size

    # --- checkpointing
    out_dir: str = "/tmp/graphrag_ray_out"
    run_id: str = "run0"
    checkpoint: bool = False  # write per-stage parquet + manifest, resume on rerun

    def config_hash(self) -> str:
        """Stable hash over semantic fields; used to validate checkpoint reuse."""
        d = asdict(self)
        # execution-only knobs don't invalidate checkpoints
        for k in ("chunk_batch_size", "extract_batch_size", "extract_concurrency",
                  "out_dir", "run_id", "checkpoint", "salted_premerge_min_rows"):
            d.pop(k)
        return hashlib.sha256(json.dumps(d, sort_keys=True).encode()).hexdigest()[:16]


DEFAULT_CONFIG = PipelineConfig()
