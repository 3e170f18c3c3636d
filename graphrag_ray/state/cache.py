"""LLM response cache (A7) — worker-local, keyed by (model, prompt hash).

Reference: caching/persistent.rs:19-215 (moka in-memory + bincode on-disk,
TTL) and caching/cache_key.rs (prompt-hash keys). In the actor-pool world
the cache lives INSIDE each actor (per-worker locality, zero coordination);
the optional disk tier makes nondeterministic (LLM) stages replayable for
checkpoint resume (SURVEY.md §7.5) — deterministic stages don't need it.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections import OrderedDict


def cache_key(model: str, prompt: str) -> str:
    return hashlib.sha256(f"{model}\x00{prompt}".encode()).hexdigest()


class ResponseCache:
    """LRU memory tier + optional JSON-file disk tier."""

    def __init__(self, capacity: int = 4096, disk_dir: str | None = None):
        self.capacity = capacity
        self.disk_dir = disk_dir
        self._mem: OrderedDict[str, str] = OrderedDict()
        self.hits = 0
        self.misses = 0
        if disk_dir:
            os.makedirs(disk_dir, exist_ok=True)

    def _disk_path(self, key: str) -> str:
        return os.path.join(self.disk_dir, key[:2], key + ".json")

    def get(self, model: str, prompt: str) -> str | None:
        key = cache_key(model, prompt)
        if key in self._mem:
            self._mem.move_to_end(key)
            self.hits += 1
            return self._mem[key]
        if self.disk_dir:
            p = self._disk_path(key)
            if os.path.exists(p):
                with open(p) as f:
                    value = json.load(f)["response"]
                self._put_mem(key, value)
                self.hits += 1
                return value
        self.misses += 1
        return None

    def put(self, model: str, prompt: str, response: str) -> None:
        key = cache_key(model, prompt)
        self._put_mem(key, response)
        if self.disk_dir:
            p = self._disk_path(key)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            tmp = p + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"response": response}, f)
            os.replace(tmp, p)

    def _put_mem(self, key: str, value: str) -> None:
        self._mem[key] = value
        self._mem.move_to_end(key)
        while len(self._mem) > self.capacity:
            self._mem.popitem(last=False)


class CachedLLM:
    """Wrap any ``complete(prompt) -> str`` client with the cache
    (caching/client.rs shape)."""

    def __init__(self, inner, model: str = "mock", cache: ResponseCache | None = None):
        self.inner = inner
        self.model = model
        self.cache = cache if cache is not None else ResponseCache()

    def complete(self, prompt: str) -> str:
        cached = self.cache.get(self.model, prompt)
        if cached is not None:
            return cached
        out = self.inner.complete(prompt)
        self.cache.put(self.model, prompt, out)
        return out


# ---------------------------------------------------------------------------
# Key generation strategies (caching/cache_key.rs)


class CacheKeyGenerator:
    """Deterministic cache-key generation (cache_key.rs:75-310).

    Strategies: 'simple' (normalized prompt only), 'with_parameters'
    (+serialized generation params), 'semantic' (punctuation/quote/dash
    normalization), 'content_based' (most aggressive: +stop-word removal,
    contraction expansion, +model name)."""

    STOP_WORDS = frozenset(("the", "a", "an", "and", "or", "but", "in",
                            "on", "at", "to", "for", "of", "with", "by"))

    def __init__(self, strategy: str = "simple",
                 normalize_whitespace: bool = True,
                 ignore_case: bool = False,
                 include_model_info: bool = True,
                 custom_normalizers=()):
        self.strategy = strategy
        self.normalize_whitespace = normalize_whitespace
        self.ignore_case = ignore_case
        self.include_model_info = include_model_info
        self.custom_normalizers = tuple(custom_normalizers)

    def _normalize_text(self, text: str) -> str:
        if self.normalize_whitespace:
            text = " ".join(text.split())
        if self.ignore_case:
            text = text.lower()
        for fn in self.custom_normalizers:
            text = fn(text)
        return text

    @staticmethod
    def _semantic(text: str) -> str:
        for ch in ".,!?;:":
            text = text.replace(ch, "")
        for ch in ('"', "“", "”", "'", "‘", "’"):
            text = text.replace(ch, "'")
        text = text.replace("–", "-").replace("—", "-")
        return " ".join(text.split())

    @classmethod
    def _content(cls, text: str) -> str:
        text = cls._semantic(text)
        words = [w for w in text.split()
                 if w.lower() not in cls.STOP_WORDS]
        if words:
            text = " ".join(words)
        for a, b in (("what's", "what is"), ("won't", "will not"),
                     ("can't", "cannot"), ("don't", "do not")):
            text = text.replace(a, b)
        return text

    @staticmethod
    def serialize_params(params: dict) -> str:
        """cache_key.rs:284-302 — deterministic 'k:v;k:v' with 3dp
        temperature/top_p."""
        parts = []
        if params.get("max_tokens") is not None:
            parts.append(f"max_tokens:{params['max_tokens']}")
        if params.get("temperature") is not None:
            parts.append(f"temp:{params['temperature']:.3f}")
        if params.get("top_p") is not None:
            parts.append(f"top_p:{params['top_p']:.3f}")
        if params.get("stop_sequences"):
            parts.append("stop:" + ",".join(params["stop_sequences"]))
        return ";".join(parts)

    def generate_key(self, prompt: str, params: dict | None = None,
                     model_name: str | None = None) -> str:
        normalized = self._normalize_text(prompt)
        if self.strategy == "simple":
            components = [normalized]
        elif self.strategy == "with_parameters":
            components = [normalized]
            if params is not None:
                components.append(self.serialize_params(params))
        elif self.strategy == "semantic":
            components = [self._semantic(normalized)]
            if params is not None:
                components.append(self.serialize_params(params))
        elif self.strategy == "content_based":
            components = [self._content(normalized)]
            if params is not None:
                components.append(self.serialize_params(params))
            if self.include_model_info and model_name is not None:
                components.append(model_name)
        else:
            raise ValueError(f"unknown key strategy: {self.strategy}")
        return hashlib.sha256("|".join(components).encode()).hexdigest()


# ---------------------------------------------------------------------------
# Cache statistics + health (caching/stats.rs)


class CacheStats:
    """Hit/miss/eviction accounting with the reference's efficiency score
    (stats.rs:53-305: 0.4·hit_rate + 0.3·memory + 0.3·(1-error_rate);
    memory normalized around 1 KiB per entry)."""

    def __init__(self):
        self.hits = 0
        self.misses = 0
        self.insertions = 0
        self.evictions = 0
        self.errors = 0
        self.current_size = 0
        self.memory_usage_bytes = 0
        self.time_saved_s = 0.0

    @property
    def total_requests(self) -> int:
        return self.hits + self.misses

    def record_hit(self, time_saved_s: float = 0.0) -> None:
        self.hits += 1
        self.time_saved_s += time_saved_s

    def record_miss(self) -> None:
        self.misses += 1

    def record_insertion(self, entry_size: int) -> None:
        self.insertions += 1
        self.current_size += 1
        self.memory_usage_bytes += entry_size

    def record_eviction(self, entry_size: int) -> None:
        self.evictions += 1
        self.current_size -= 1
        self.memory_usage_bytes -= entry_size

    def record_error(self) -> None:
        self.errors += 1

    def hit_rate(self) -> float:
        total = self.total_requests
        return self.hits / total if total else 0.0

    def miss_rate(self) -> float:
        return 1.0 - self.hit_rate()

    def efficiency_score(self) -> float:
        hit_score = self.hit_rate()
        if self.current_size == 0:
            memory_score = 1.0
        else:
            avg = self.memory_usage_bytes / self.current_size
            memory_score = min(1.0 / (1.0 + avg / 1024.0), 1.0)
        error_rate = (self.errors / self.total_requests
                      if self.total_requests else 0.0)
        return (hit_score * 0.4 + memory_score * 0.3
                + max(1.0 - error_rate, 0.0) * 0.3)

    def health(self) -> dict:
        """stats.rs:358-380-style advisory."""
        recommendations = []
        if self.hit_rate() < 0.5 and self.total_requests > 0:
            recommendations.append(
                "low hit rate: consider semantic/content key strategy "
                "or cache warming")
        if self.evictions > self.insertions // 2 and self.insertions:
            recommendations.append("high eviction pressure: raise capacity")
        return {
            "hit_rate": self.hit_rate(),
            "efficiency_score": self.efficiency_score(),
            "recommendations": recommendations,
        }


# ---------------------------------------------------------------------------
# Cache warming (caching/warming.rs)

PREDEFINED_WARMING_QUERIES = (
    "Summarize the main entities in this document.",
    "List the relationships between the key entities.",
    "Extract all person names from the text.",
    "What organizations are mentioned?",
    "Which locations appear in the document?",
)


class CacheWarmer:
    """Warm a CachedLLM before the hot path (warming.rs:1-120):
    'predefined' runs the stock extraction prompts, 'custom' a
    user-provided list; returns per-query outcomes (all deterministic —
    no time-based scheduling in this engine; the actor-pool __init__ is
    the natural warm point)."""

    def __init__(self, strategy: str = "predefined", max_queries: int = 100,
                 custom_queries=()):
        if strategy not in ("predefined", "custom"):
            raise ValueError(f"unknown warming strategy: {strategy}")
        self.strategy = strategy
        self.max_queries = max_queries
        self.custom_queries = tuple(custom_queries)

    def warm(self, cached_llm) -> dict:
        queries = (PREDEFINED_WARMING_QUERIES
                   if self.strategy == "predefined"
                   else self.custom_queries)[: self.max_queries]
        warmed = 0
        failed = 0
        for qtext in queries:
            try:
                cached_llm.complete(qtext)
                warmed += 1
            except Exception:
                failed += 1
        return {"strategy": self.strategy, "warmed": warmed,
                "failed": failed}
