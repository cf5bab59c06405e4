"""HTTP embedding runtimes (OpenAI / Cohere wire formats) with the
reference's batching + retry semantics, stdlib-only (urllib).

Reference: lantern_cli/src/embeddings/core/ —
- ``post_with_retries`` (utils.rs:80-124): linear backoff
  ``starting_interval * (attempt+1)`` ms (4 s base), retrying BOTH
  transport errors and response-parse errors, with an aggregate
  "All N requests failed" error after the last attempt.
- OpenAI runtime (openai_runtime.rs): inputs are tokenized, truncated
  to the model's sequence length, and greedily grouped so each request
  stays under a max token count (group_vectors_by_token_count,
  openai_runtime.rs:282-307); deployment kind is detected from the
  base URL (Azure regex, openai_runtime.rs:73) and selects the auth
  header — OpenAI ``Authorization: Bearer <api_token>``; Azure
  ``api-key: <api_token>`` or ``Authorization: Bearer
  <azure_entra_token>`` (openai_runtime.rs:201-240).
- Cohere runtime (cohere_runtime.rs): same shape, count-based batching.

No tiktoken in this container: token counts use a whitespace+punct
approximation (documented; the grouping CONTRACT — no request exceeds
the cap, order preserved — is what's mirrored, not BPE token ids).

These runtimes are exercised offline against a local fake server in
tests/test_http_runtime.py; against real endpoints they only need
``api_token`` + the default base URLs.
"""

from __future__ import annotations

import json
import re
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

OPENAI_BASE_URL = "https://api.openai.com/v1/embeddings"
COHERE_BASE_URL = "https://api.cohere.ai/v1/embed"

# openai_runtime.rs:73 — Azure deployment detection
AZURE_OPENAI_RE = re.compile(
    r"^https://[a-zA-Z0-9_\-]+\.openai\.azure\.com/openai/deployments/"
    r"[a-zA-Z0-9_\-]+/embeddings\?api-version=2023-05-15$"
)

DEFAULT_STARTING_INTERVAL_MS = 4000  # utils.rs:87
DEFAULT_MAX_RETRIES = 5

_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def approx_token_count(text: str) -> int:
    """Whitespace+punctuation token approximation (no tiktoken in the
    container; same order of magnitude as cl100k for English text)."""
    return len(_TOKEN_RE.findall(text))


def truncate_tokens(text: str, sequence_len: int) -> str:
    """Truncate to the model's sequence length in approx tokens
    (openai_runtime.rs:334-341 truncates the token ids)."""
    toks = _TOKEN_RE.findall(text)
    if len(toks) <= sequence_len:
        return text
    # cut at the character position where the allowed tokens end
    m = list(_TOKEN_RE.finditer(text))[sequence_len - 1]
    return text[: m.end()]


def group_by_token_count(
    texts: Sequence[str], max_token_count: int
) -> List[List[int]]:
    """Greedy, order-preserving grouping of input indices so each
    group's summed (approx) token count stays ≤ max_token_count
    (group_vectors_by_token_count, openai_runtime.rs:282-307). A single
    over-long input gets its own group (it was already truncated)."""
    groups: List[List[int]] = []
    cur: List[int] = []
    cur_tokens = 0
    for i, t in enumerate(texts):
        n = max(approx_token_count(t), 1)
        if cur and cur_tokens + n > max_token_count:
            groups.append(cur)
            cur, cur_tokens = [], 0
        cur.append(i)
        cur_tokens += n
    if cur:
        groups.append(cur)
    return groups


def post_with_retries(
    url: str,
    body: bytes,
    headers: dict,
    parse_fn: Callable[[bytes], object],
    max_retries: int = DEFAULT_MAX_RETRIES,
    starting_interval_ms: int = DEFAULT_STARTING_INTERVAL_MS,
    timeout_s: float = 60.0,
):
    """utils.rs:80-124 parity: linear backoff (interval·(attempt+1)),
    retrying transport errors AND parse errors; aggregate error after
    the last attempt.

    Two refinements over the reference's loop (ADVICE r5): no sleep
    after the FINAL attempt (the backoff buys nothing once the error is
    being raised), and non-transient HTTP 4xx — everything but 408/429
    — fails fast: a bad api_token surfaces immediately instead of after
    the full ~60 s backoff ladder."""
    last_error = ""
    for i in range(max_retries):
        err = None
        raw = None
        try:
            req = urllib.request.Request(
                url, data=body, headers=headers, method="POST"
            )
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                raw = resp.read()
        except urllib.error.HTTPError as e:
            if 400 <= e.code < 500 and e.code not in (408, 429):
                raise RuntimeError(
                    f"Request failed with non-retryable status {e.code}: {e}"
                ) from e
            err = str(e)
        except (urllib.error.URLError, OSError) as e:
            err = str(e)
        if err is None:
            try:
                return parse_fn(raw)
            except Exception as e:  # parse errors also retry (utils.rs:104-111)
                err = str(e)
        last_error = err
        if i < max_retries - 1:
            time.sleep(starting_interval_ms * (i + 1) / 1000.0)
    raise RuntimeError(
        f"All {max_retries} requests failed. Last error was: {last_error}"
    )


@dataclass
class HttpRuntimeConfig:
    model: str = "text-embedding-ada-002"
    api_token: Optional[str] = None
    azure_entra_token: Optional[str] = None
    base_url: Optional[str] = None
    max_token_count: int = 8000   # per-request token budget
    sequence_len: int = 8192      # per-input truncation
    batch_size: int = 96          # count cap (cohere-style)
    max_retries: int = DEFAULT_MAX_RETRIES
    starting_interval_ms: int = DEFAULT_STARTING_INTERVAL_MS
    extra_headers: dict = field(default_factory=dict)
    # cohere body param (embeddings.rs input_type) — an explicit field,
    # NOT smuggled through extra_headers (ADVICE r5: a header sentinel
    # was sent to the endpoint as a literal header)
    input_type: str = "search_document"


class OpenAIEmbeddingRuntime:
    """OpenAI/Azure-OpenAI embeddings endpoint client
    (openai_runtime.rs parity: deployment detection, auth header
    selection, token-budget batching, retried POSTs)."""

    def __init__(self, cfg: HttpRuntimeConfig):
        self.cfg = cfg
        self.url = cfg.base_url or OPENAI_BASE_URL
        self.is_azure = bool(AZURE_OPENAI_RE.match(self.url))
        self.headers = {"Content-Type": "application/json"}
        if self.is_azure:
            # openai_runtime.rs:223-240
            if cfg.api_token:
                self.headers["api-key"] = cfg.api_token
            elif cfg.azure_entra_token:
                self.headers["Authorization"] = f"Bearer {cfg.azure_entra_token}"
            else:
                raise ValueError(
                    "'api_token' or 'azure_entra_token' is required for "
                    "Azure OpenAi runtime"
                )
        else:
            # openai_runtime.rs:215-221
            if not cfg.api_token:
                raise ValueError("'api_token' is required for OpenAi runtime")
            self.headers["Authorization"] = f"Bearer {cfg.api_token}"
        self.headers.update(cfg.extra_headers)

    def _request_body(self, inputs: List[str]) -> bytes:
        payload = {"input": inputs}
        if not self.is_azure:  # Azure carries the model in the URL path
            payload["model"] = self.cfg.model
        return json.dumps(payload).encode("utf-8")

    @staticmethod
    def _parse(raw: bytes) -> List[List[float]]:
        doc = json.loads(raw.decode("utf-8"))
        if "data" not in doc:
            raise ValueError(f"unexpected response shape: {doc}")
        rows = sorted(doc["data"], key=lambda d: d.get("index", 0))
        return [r["embedding"] for r in rows]

    def embed(self, texts: List[Optional[str]]) -> List[Optional[List[float]]]:
        """NULL/empty inputs skip (mod.rs:203-208); the rest are
        truncated, grouped under the token budget, and posted with
        retries; order is restored by input position."""
        cfg = self.cfg
        out: List[Optional[List[float]]] = [None] * len(texts)
        live_idx = [
            i
            for i, t in enumerate(texts)
            if t is not None and str(t).strip() != ""
        ]
        prepared = [
            truncate_tokens(str(texts[i]), cfg.sequence_len) for i in live_idx
        ]
        for group in group_by_token_count(prepared, cfg.max_token_count):
            inputs = [prepared[j] for j in group]
            vecs = post_with_retries(
                self.url,
                self._request_body(inputs),
                self.headers,
                self._parse,
                max_retries=cfg.max_retries,
                starting_interval_ms=cfg.starting_interval_ms,
            )
            if len(vecs) != len(inputs):
                raise RuntimeError(
                    f"endpoint returned {len(vecs)} embeddings for "
                    f"{len(inputs)} inputs"
                )
            for j, v in zip(group, vecs):
                out[live_idx[j]] = [float(x) for x in v]
        return out


class CohereEmbeddingRuntime:
    """Cohere embed endpoint client (cohere_runtime.rs parity:
    count-based batching, Bearer auth, retried POSTs)."""

    def __init__(self, cfg: HttpRuntimeConfig):
        if not cfg.api_token:
            raise ValueError("'api_token' is required for Cohere runtime")
        self.cfg = cfg
        self.url = cfg.base_url or COHERE_BASE_URL
        self.headers = {
            "Content-Type": "application/json",
            "Authorization": f"Bearer {cfg.api_token}",
        }
        self.headers.update(cfg.extra_headers)

    def _request_body(self, inputs: List[str]) -> bytes:
        return json.dumps(
            {
                "model": self.cfg.model,
                "texts": inputs,
                "input_type": self.cfg.input_type,
            }
        ).encode("utf-8")

    @staticmethod
    def _parse(raw: bytes) -> List[List[float]]:
        doc = json.loads(raw.decode("utf-8"))
        if "embeddings" not in doc:
            raise ValueError(f"unexpected response shape: {doc}")
        return doc["embeddings"]

    def embed(self, texts: List[Optional[str]]) -> List[Optional[List[float]]]:
        cfg = self.cfg
        out: List[Optional[List[float]]] = [None] * len(texts)
        live_idx = [
            i
            for i, t in enumerate(texts)
            if t is not None and str(t).strip() != ""
        ]
        prepared = [
            truncate_tokens(str(texts[i]), cfg.sequence_len) for i in live_idx
        ]
        for start in range(0, len(prepared), cfg.batch_size):
            sl = slice(start, start + cfg.batch_size)
            inputs = prepared[sl]
            vecs = post_with_retries(
                self.url,
                self._request_body(inputs),
                self.headers,
                self._parse,
                max_retries=cfg.max_retries,
                starting_interval_ms=cfg.starting_interval_ms,
            )
            if len(vecs) != len(inputs):
                raise RuntimeError(
                    f"endpoint returned {len(vecs)} embeddings for "
                    f"{len(inputs)} inputs"
                )
            for j, v in zip(live_idx[sl], vecs):
                out[j] = [float(x) for x in v]
        return out


def make_http_runtime(name: str, params: dict):
    """Factory used by the embed registry: name ∈ {openai, cohere},
    params → HttpRuntimeConfig fields."""
    cfg = HttpRuntimeConfig(
        **{k: v for k, v in params.items() if k in HttpRuntimeConfig.__dataclass_fields__}
    )
    if name == "openai":
        return OpenAIEmbeddingRuntime(cfg)
    if name == "cohere":
        return CohereEmbeddingRuntime(cfg)
    raise ValueError(f"unknown http runtime {name!r}")
