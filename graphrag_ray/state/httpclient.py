"""HTTP model-backend plumbing: rate limiting + retry/backoff + clients.

Reference parity:
- RateLimiter: concurrency semaphore + per-second request window
  (async_processing/rate_limiting.rs:144-235 — two-tier strategy: a
  semaphore caps simultaneous calls, a per-second tracker throttles rate);
  synchronous transcription (Ray actors are processes, not a tokio
  runtime).
- OllamaEmbeddingBackend / OllamaLLMBackend: the public Ollama HTTP API
  (POST /api/embeddings {model, prompt} → {embedding}; POST /api/generate
  {model, prompt, stream:false} → {response}) as used by
  embeddings/ollama.rs — stdlib urllib only, no extra deps.
- Retry: exponential backoff on connection errors / HTTP 429 / 5xx with a
  bounded attempt budget.

No external network exists in this sandbox; tests exercise the full stack
against a loopback http.server (tests/test_httpclient.py). Real
deployments point base_url at an actual endpoint — nothing else changes.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pyarrow as pa


class RateLimiter:
    """Two-tier limiter: at most ``max_concurrent`` in-flight calls AND at
    most ``rate_per_second`` call starts per 1-second window."""

    def __init__(self, max_concurrent: int = 4, rate_per_second: float = 50.0):
        self._sem = threading.Semaphore(max_concurrent)
        self._lock = threading.Lock()
        self._rate = float(rate_per_second)
        self._window_start = time.monotonic()
        self._window_count = 0

    def _wait_for_rate_slot(self) -> None:
        while True:
            with self._lock:
                now = time.monotonic()
                if now - self._window_start >= 1.0:
                    self._window_start = now
                    self._window_count = 0
                if self._window_count < self._rate:
                    self._window_count += 1
                    return
                sleep_for = 1.0 - (now - self._window_start)
            time.sleep(max(0.001, sleep_for))

    def __enter__(self):
        self._sem.acquire()
        try:
            self._wait_for_rate_slot()
        except BaseException:  # pragma: no cover
            self._sem.release()
            raise
        return self

    def __exit__(self, *exc):
        self._sem.release()
        return False


class RetryingHttpClient:
    """POST-JSON client with bounded exponential-backoff retries on
    connection errors, HTTP 429 and 5xx."""

    def __init__(self, base_url: str, max_retries: int = 3,
                 backoff_base: float = 0.1, timeout: float = 10.0,
                 rate_limiter: RateLimiter | None = None):
        self.base_url = base_url.rstrip("/")
        self.max_retries = max_retries
        self.backoff_base = backoff_base
        self.timeout = timeout
        self.rate_limiter = rate_limiter or RateLimiter()
        self.n_requests = 0
        self.n_retries = 0

    def post_json(self, path: str, payload: dict) -> dict:
        body = json.dumps(payload).encode()
        url = f"{self.base_url}{path}"
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            if attempt:
                self.n_retries += 1
                time.sleep(self.backoff_base * (2 ** (attempt - 1)))
            try:
                with self.rate_limiter:
                    self.n_requests += 1
                    req = urllib.request.Request(
                        url, data=body,
                        headers={"Content-Type": "application/json"})
                    with urllib.request.urlopen(req, timeout=self.timeout) as r:
                        return json.loads(r.read().decode())
            except urllib.error.HTTPError as e:
                last_err = e
                if e.code not in (429,) and e.code < 500:
                    raise  # 4xx other than 429: not retryable
            except (urllib.error.URLError, ConnectionError, TimeoutError) as e:
                last_err = e
        raise RuntimeError(
            f"request to {url} failed after {self.max_retries + 1} attempts"
        ) from last_err


class OllamaEmbeddingBackend:
    """A6: real embedding backend shaped exactly like HashEmbedder —
    actor-pool map_batches stage, client built once per actor."""

    def __init__(self, base_url: str, model: str = "nomic-embed-text",
                 text_column: str = "content", id_column: str = "chunk_id",
                 max_retries: int = 3, rate_per_second: float = 50.0,
                 max_concurrent: int = 4):
        self.client = RetryingHttpClient(
            base_url, max_retries=max_retries,
            rate_limiter=RateLimiter(max_concurrent, rate_per_second))
        self.model = model
        self.text_column = text_column
        self.id_column = id_column

    def embed_text(self, text: str) -> np.ndarray:
        out = self.client.post_json(
            "/api/embeddings", {"model": self.model, "prompt": text or ""})
        return np.asarray(out["embedding"], dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        vecs = [self.embed_text(t).tolist() for t in texts]
        return pa.Table.from_pydict(
            {"id": batch.column(self.id_column),
             "vector": pa.array(vecs, pa.list_(pa.float32()))}
        )


class OllamaLLMBackend:
    """A6: completion backend for the LLM extraction stages — the
    ``complete(prompt)`` seam stages/llm_extract.py's MockLLM implements."""

    def __init__(self, base_url: str, model: str = "llama3",
                 max_retries: int = 3, rate_per_second: float = 10.0,
                 max_concurrent: int = 2):
        self.client = RetryingHttpClient(
            base_url, max_retries=max_retries,
            rate_limiter=RateLimiter(max_concurrent, rate_per_second))
        self.model = model

    def complete(self, prompt: str) -> str:
        out = self.client.post_json(
            "/api/generate",
            {"model": self.model, "prompt": prompt, "stream": False})
        return out.get("response", "")
