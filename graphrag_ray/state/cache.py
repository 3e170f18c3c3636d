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
