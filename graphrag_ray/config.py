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
    # local-combine coalescing width for the fused rewrite->combine chain.
    # Ray bundles the whole fused chain at this row count, so it sets the
    # task count of the hottest edge stage: 2M bundles the bench corpus's
    # 23.8M partials into ~11 tasks (caps parallelism at 11 cores); 500k
    # gives ~48 tasks while each bundle still collapses to the ~60k
    # distinct edges (Zipf keys), keeping the AllToAll input small.
    edge_combine_batch_size: int = 500_000

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


# ---------------------------------------------------------------------------
# File-driven configuration (reference: config/loader.rs:28-107 — format by
# extension, sectioned tables flattened onto one config struct, defaults for
# missing keys, hard error on missing file; config/json5_loader.rs — JSON5
# comments + trailing commas).

_LIST_FIELDS = {"entity_types"}


def _strip_json5(text: str) -> str:
    """Minimal JSON5 → JSON: strip // and /* */ comments (outside strings)
    and trailing commas — the subset the reference's json5 configs use."""
    out: list[str] = []
    i, n = 0, len(text)
    in_str = False
    while i < n:
        c = text[i]
        if in_str:
            out.append(c)
            if c == "\\" and i + 1 < n:
                out.append(text[i + 1])
                i += 1
            elif c == '"':
                in_str = False
        elif c == '"':
            in_str = True
            out.append(c)
        elif c == "/" and i + 1 < n and text[i + 1] == "/":
            while i < n and text[i] != "\n":
                i += 1
            continue
        elif c == "/" and i + 1 < n and text[i + 1] == "*":
            i += 2
            while i + 1 < n and not (text[i] == "*" and text[i + 1] == "/"):
                i += 1
            i += 2
            continue
        else:
            out.append(c)
        i += 1
    import re

    return re.sub(r",(\s*[}\]])", r"\1", "".join(out))


def _flatten_sections(raw: dict) -> dict:
    """Reference configs group keys into sections ([chunking], [entities],
    ...); section names are organizational — keys map onto the one flat
    PipelineConfig. Nested dicts are flattened one level; a key defined in
    two sections is an error."""
    flat: dict = {}
    for key, value in raw.items():
        items = value.items() if isinstance(value, dict) else [(key, value)]
        for k, v in items:
            if k in flat:
                raise ValueError(f"config key defined twice: {k!r}")
            flat[k] = v
    return flat


def load_config(path: str, **overrides) -> PipelineConfig:
    """Load a PipelineConfig from a .toml / .json / .json5 file.

    Unknown keys are a hard error (lists them — a typo'd knob must not
    silently no-op); missing keys keep dataclass defaults; ``overrides``
    (e.g. CLI flags) win over file values. This is the ``ray job submit``
    config surface: ``python -m graphrag_ray.job --config pipeline.toml``.
    """
    import os

    if not os.path.exists(path):
        raise FileNotFoundError(f"Configuration file not found: {path}")
    ext = os.path.splitext(path)[1].lower()
    with open(path, "rb") as f:
        data = f.read()
    if ext == ".toml" or ext == "":
        import tomllib

        raw = tomllib.loads(data.decode())
    elif ext == ".json":
        raw = json.loads(data.decode())
    elif ext == ".json5":
        raw = json.loads(_strip_json5(data.decode()))
    else:
        raise ValueError(f"unsupported config format: {ext!r} "
                         "(supported: .toml, .json, .json5)")
    flat = _flatten_sections(raw)
    flat.update(overrides)
    valid = {f.name for f in PipelineConfig.__dataclass_fields__.values()}
    unknown = sorted(set(flat) - valid)
    if unknown:
        raise ValueError(f"unknown config keys: {unknown}; valid keys: "
                         f"{sorted(valid)}")
    for k in _LIST_FIELDS & set(flat):
        flat[k] = tuple(flat[k])
    return PipelineConfig(**flat)
