"""Live-LLM client binding: wire format, retry/backoff, env gating, and
integration with the LLMCompiler fallback — all offline via an injected
transport (reference: ``No_Sql.py:189-237`` Groq binding + retry loop)."""

from __future__ import annotations

import json
import urllib.error

import pytest

from nlp_to_nosql_spark.compiler.client import (
    ChatCompletionsClient,
    LLMClientError,
    from_env,
)
from nlp_to_nosql_spark.compiler.llm import LLMCompiler
from pyspark.sql import types as T


def _completion(content: str) -> bytes:
    return json.dumps(
        {"choices": [{"message": {"role": "assistant", "content": content}}]}
    ).encode()


def _client(transport, **kw):
    kw.setdefault("sleep", lambda s: None)
    return ChatCompletionsClient(
        "https://api.groq.com/openai/v1", "sk-test", "llama-3.1-8b-instant",
        transport=transport, **kw,
    )


def test_happy_path_speaks_openai_wire_format():
    seen = {}

    def transport(url, body, headers):
        seen["url"], seen["body"], seen["headers"] = url, json.loads(body), headers
        return _completion('{"filter": {"salary": {"$gt": 1}}, "projection": {}}')

    out = _client(transport)("the prompt")
    assert out == '{"filter": {"salary": {"$gt": 1}}, "projection": {}}'
    assert seen["url"] == "https://api.groq.com/openai/v1/chat/completions"
    assert seen["body"]["model"] == "llama-3.1-8b-instant"
    assert seen["body"]["temperature"] == 0
    assert seen["body"]["messages"] == [{"role": "user", "content": "the prompt"}]
    assert seen["headers"]["Authorization"] == "Bearer sk-test"


def test_retries_transient_errors_with_backoff():
    calls, sleeps = [], []

    def transport(url, body, headers):
        calls.append(1)
        if len(calls) < 3:
            raise urllib.error.HTTPError(url, 429, "rate limited", {}, None)
        return _completion("ok")

    c = _client(transport, sleep=sleeps.append)
    assert c("p") == "ok"
    assert len(calls) == 3
    assert sleeps == [0.5, 1.0]  # exponential


def test_non_retryable_4xx_fails_fast():
    calls = []

    def transport(url, body, headers):
        calls.append(1)
        raise urllib.error.HTTPError(url, 401, "unauthorized", {}, None)

    with pytest.raises(LLMClientError):
        _client(transport)("p")
    assert len(calls) == 1


def test_exhausted_attempts_raise():
    def transport(url, body, headers):
        raise urllib.error.URLError("connection refused")

    with pytest.raises(LLMClientError, match="connection refused"):
        _client(transport)("p")


def test_from_env_gating():
    assert from_env({}) is None  # unconfigured → offline rule path
    c = from_env(
        {
            "NLP2NOSQL_LLM_ENDPOINT": "https://api.groq.com/openai/v1",
            "NLP2NOSQL_LLM_API_KEY": "k",
            "NLP2NOSQL_LLM_MODEL": "m",
        }
    )
    assert isinstance(c, ChatCompletionsClient)


SCHEMA = T.StructType([T.StructField("salary", T.LongType())])


def test_compiler_integration_and_fallback():
    # Working client → LLM-produced IR flows through the parse/repair path.
    ok = LLMCompiler(
        complete=_client(
            lambda *a: _completion(
                '{"filter": {"salary": {"$gt": 4000}}, "projection": {}}'
            )
        )
    )
    assert ok.compile_ir("employees earning over 4000", SCHEMA) == {
        "filter": {"salary": {"$gt": 4000}},
        "projection": {},
    }

    # Dead client → deterministic rule fallback, same IR contract.
    def refuse(url, body, headers):
        raise urllib.error.URLError("no network in this environment")

    dead = LLMCompiler(complete=_client(refuse))
    assert dead.compile_ir("employees earning over 4000", SCHEMA) == {
        "filter": {"salary": {"$gt": 4000.0}},
        "projection": {},
    }
