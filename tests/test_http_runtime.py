"""HTTP embedding runtime parity tests (openai_runtime.rs /
cohere_runtime.rs / utils.rs post_with_retries) against a local fake
server — no network."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from lantern_spark.operators.http_runtime import (
    CohereEmbeddingRuntime,
    HttpRuntimeConfig,
    OpenAIEmbeddingRuntime,
    approx_token_count,
    group_by_token_count,
    post_with_retries,
    truncate_tokens,
)

DIM = 4


class FakeHandler(BaseHTTPRequestHandler):
    """Serves OpenAI- or Cohere-shaped embedding responses; can be told
    to fail the first N requests (HTTP 500) or return garbage JSON."""

    fail_first = 0
    garbage_first = 0
    status_first: list = []  # explicit HTTP status codes, one per request
    requests: list = []

    def do_POST(self):
        cls = type(self)
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"]))
        )
        cls.requests.append(
            {"body": body, "headers": dict(self.headers.items())}
        )
        if cls.status_first:
            code = cls.status_first.pop(0)
            self.send_response(code)
            self.end_headers()
            self.wfile.write(b"err")
            return
        if cls.fail_first > 0:
            cls.fail_first -= 1
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b"boom")
            return
        if cls.garbage_first > 0:
            cls.garbage_first -= 1
            payload = b"{not json"
        else:
            inputs = body.get("input") or body.get("texts")
            vecs = [
                [float(len(t)), float(i), 0.0, 1.0]
                for i, t in enumerate(inputs)
            ]
            if "texts" in body:  # cohere shape
                payload = json.dumps({"embeddings": vecs}).encode()
            else:  # openai shape (deliberately out of order)
                data = [
                    {"index": i, "embedding": v}
                    for i, v in reversed(list(enumerate(vecs)))
                ]
                payload = json.dumps({"data": data}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def server():
    FakeHandler.fail_first = 0
    FakeHandler.garbage_first = 0
    FakeHandler.status_first = []
    FakeHandler.requests = []
    srv = HTTPServer(("127.0.0.1", 0), FakeHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/v1/embeddings"
    srv.shutdown()


def _cfg(url, **kw):
    kw.setdefault("api_token", "sk-test")
    kw.setdefault("starting_interval_ms", 1)  # fast tests
    return HttpRuntimeConfig(base_url=url, **kw)


class TestGrouping:
    def test_token_budget_grouping(self):
        texts = ["a b c", "d e", "f g h i", "j"]
        groups = group_by_token_count(texts, max_token_count=5)
        # greedy: [a b c + d e]=5, [f g h i + j]=5
        assert groups == [[0, 1], [2, 3]]
        # order-preserving cover of all indices
        flat = [i for g in groups for i in g]
        assert flat == [0, 1, 2, 3]

    def test_overlong_input_own_group(self):
        groups = group_by_token_count(["w " * 50, "x"], max_token_count=10)
        assert groups[0] == [0]

    def test_truncation(self):
        t = truncate_tokens("one two three four", 2)
        assert t == "one two"
        assert approx_token_count(t) == 2


class TestOpenAIRuntime:
    def test_embeds_and_restores_order(self, server):
        rt = OpenAIEmbeddingRuntime(_cfg(server))
        out = rt.embed(["alpha", None, "bee", ""])
        assert out[1] is None and out[3] is None  # skip semantics
        # fake server: first component = len(text); order restored from
        # the response's index field even though it arrives reversed
        assert out[0][0] == 5.0 and out[2][0] == 3.0

    def test_batching_respects_token_budget(self, server):
        rt = OpenAIEmbeddingRuntime(_cfg(server, max_token_count=3))
        texts = [f"w{i} w w" for i in range(4)]  # 3 tokens each
        out = rt.embed(texts)
        assert all(v is not None for v in out)
        assert len(FakeHandler.requests) == 4  # one request per input
        for r in FakeHandler.requests:
            assert approx_token_count(" ".join(r["body"]["input"])) <= 3

    def test_auth_header_and_model(self, server):
        rt = OpenAIEmbeddingRuntime(_cfg(server, model="m-x"))
        rt.embed(["hi"])
        req = FakeHandler.requests[-1]
        assert req["headers"]["Authorization"] == "Bearer sk-test"
        assert req["body"]["model"] == "m-x"

    def test_api_token_required(self):
        with pytest.raises(ValueError, match="api_token"):
            OpenAIEmbeddingRuntime(HttpRuntimeConfig(api_token=None))

    def test_azure_detection_headers(self):
        url = (
            "https://my-res.openai.azure.com/openai/deployments/"
            "my-dep/embeddings?api-version=2023-05-15"
        )
        rt = OpenAIEmbeddingRuntime(
            HttpRuntimeConfig(base_url=url, api_token="k1")
        )
        assert rt.is_azure and rt.headers["api-key"] == "k1"
        rt2 = OpenAIEmbeddingRuntime(
            HttpRuntimeConfig(base_url=url, azure_entra_token="tok")
        )
        assert rt2.headers["Authorization"] == "Bearer tok"
        with pytest.raises(ValueError, match="azure_entra_token"):
            OpenAIEmbeddingRuntime(HttpRuntimeConfig(base_url=url))

    def test_retry_on_http_error_then_success(self, server):
        FakeHandler.fail_first = 2
        rt = OpenAIEmbeddingRuntime(_cfg(server, max_retries=4))
        out = rt.embed(["hello"])
        assert out[0] is not None
        assert len(FakeHandler.requests) == 3  # 2 failures + 1 success

    def test_retry_on_parse_error(self, server):
        FakeHandler.garbage_first = 1
        rt = OpenAIEmbeddingRuntime(_cfg(server, max_retries=3))
        out = rt.embed(["hello"])
        assert out[0] is not None
        assert len(FakeHandler.requests) == 2

    def test_all_retries_exhausted(self, server):
        FakeHandler.fail_first = 99
        rt = OpenAIEmbeddingRuntime(_cfg(server, max_retries=3))
        with pytest.raises(RuntimeError, match="All 3 requests failed"):
            rt.embed(["hello"])
        assert len(FakeHandler.requests) == 3


class TestCohereRuntime:
    def test_count_batching(self, server):
        rt = CohereEmbeddingRuntime(_cfg(server, batch_size=2))
        out = rt.embed(["a", "bb", "ccc", None, "dddd"])
        assert out[3] is None
        assert [v[0] for i, v in enumerate(out) if i != 3] == [1.0, 2.0, 3.0, 4.0]
        assert len(FakeHandler.requests) == 2  # 4 live rows / batch 2

    def test_request_shape(self, server):
        rt = CohereEmbeddingRuntime(_cfg(server, model="embed-english-v3.0"))
        rt.embed(["x"])
        body = FakeHandler.requests[-1]["body"]
        assert body["model"] == "embed-english-v3.0"
        assert body["texts"] == ["x"]
        assert body["input_type"] == "search_document"


class TestBackoffTiming:
    def test_linear_backoff_intervals(self, server, monkeypatch):
        """utils.rs:87-97: sleep is starting_interval·(attempt+1) —
        but NOT after the final attempt (ADVICE r5: the last backoff
        bought nothing; the error is about to be raised)."""
        import lantern_spark.operators.http_runtime as hr

        sleeps = []
        monkeypatch.setattr(hr.time, "sleep", lambda s: sleeps.append(s))
        FakeHandler.fail_first = 99
        with pytest.raises(RuntimeError):
            post_with_retries(
                server, b"{}", {"Content-Type": "application/json"},
                json.loads, max_retries=3, starting_interval_ms=4000,
            )
        assert sleeps == [4.0, 8.0]

    def test_non_retryable_4xx_fails_fast(self, server, monkeypatch):
        """A bad api_token (401) must surface immediately — no retry,
        no sleep (ADVICE r5: the old loop burned the full backoff
        ladder on a deterministic auth failure)."""
        import lantern_spark.operators.http_runtime as hr

        sleeps = []
        monkeypatch.setattr(hr.time, "sleep", lambda s: sleeps.append(s))
        FakeHandler.status_first = [401]
        with pytest.raises(RuntimeError, match="non-retryable status 401"):
            post_with_retries(
                server, b"{}", {"Content-Type": "application/json"},
                json.loads, max_retries=5, starting_interval_ms=4000,
            )
        assert sleeps == []

    def test_429_retries(self, server, monkeypatch):
        """Rate limiting (429) IS transient — it must retry and then
        succeed."""
        import lantern_spark.operators.http_runtime as hr

        sleeps = []
        monkeypatch.setattr(hr.time, "sleep", lambda s: sleeps.append(s))
        FakeHandler.status_first = [429]
        out = post_with_retries(
            server,
            json.dumps({"texts": ["ab"]}).encode(),
            {"Content-Type": "application/json"},
            json.loads,
            max_retries=3,
            starting_interval_ms=4000,
        )
        assert out["embeddings"]
        assert sleeps == [4.0]


class TestSparkIntegration:
    def test_embed_column_via_http_runtime(self, spark, server):
        """The registry path: RuntimeSpec('openai') with credentials
        routes every Arrow batch through the HTTP runtime (driver-local
        URL so executors on this host can reach it)."""
        from lantern_spark.operators.embed import RuntimeSpec, embed_column

        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, None), (3, "gamma")],
            "id long, body string",
        )
        out = embed_column(
            df, "body", "emb",
            RuntimeSpec(
                "openai", dim=DIM, batch_size=50,
                params={
                    "api_token": "sk-test",
                    "base_url": server,
                    "starting_interval_ms": 1,
                },
            ),
        ).collect()
        by_id = {r["id"]: r["emb"] for r in out}
        assert by_id[2] is None
        assert by_id[1][0] == 10.0  # len("alpha beta")
        assert by_id[3][0] == 5.0

    def test_missing_credentials_not_implemented(self):
        from lantern_spark.operators.embed import RuntimeSpec, _runtime_fn

        with pytest.raises(NotImplementedError, match="api_token"):
            _runtime_fn(RuntimeSpec("openai", dim=4))
