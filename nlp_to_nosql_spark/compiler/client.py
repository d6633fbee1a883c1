"""Live LLM client binding for the NL→IR front end.

The reference binds its prompt to Groq through langchain
(``No_Sql.py:189-237``: ``ChatGroq(model="llama-3.1-8b-instant")`` + a
3-attempt retry loop).  Groq serves the OpenAI-compatible
``/chat/completions`` contract, so this binding speaks that wire format
directly over stdlib ``urllib`` — no SDK dependency — and plugs into
:class:`~nlp_to_nosql_spark.compiler.llm.LLMCompiler` as its ``complete``
callable.  Everything stays offline-safe by default: no request is ever
made unless the caller constructs a client (or sets the env vars below),
and on any failure the compiler's deterministic rule fallback applies,
exactly like the reference on LLM failure (``No_Sql.py:257-267``).

Env configuration (``from_env``):

* ``NLP2NOSQL_LLM_ENDPOINT`` — e.g. ``https://api.groq.com/openai/v1``
* ``NLP2NOSQL_LLM_API_KEY``
* ``NLP2NOSQL_LLM_MODEL``    — e.g. ``llama-3.1-8b-instant``

The transport is injectable for tests (any ``(url, body_bytes, headers)
-> bytes``), keeping the retry/parse logic fully covered without a
network.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request
from typing import Callable

#: Reference parity: 3 attempts (``No_Sql.py:220``), short backoff.
DEFAULT_MAX_ATTEMPTS = 3
DEFAULT_BACKOFF_S = 0.5


class LLMClientError(RuntimeError):
    """All attempts failed; callers fall back to the rule compiler."""


def _urllib_transport(timeout_s: float) -> Callable[[str, bytes, dict], bytes]:
    def send(url: str, body: bytes, headers: dict) -> bytes:
        req = urllib.request.Request(url, data=body, headers=headers, method="POST")
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.read()

    return send


class ChatCompletionsClient:
    """Minimal OpenAI-compatible ``/chat/completions`` caller.

    Instances are callable ``str -> str`` — the exact ``complete``
    contract of :class:`LLMCompiler`.
    """

    def __init__(
        self,
        endpoint: str,
        api_key: str,
        model: str,
        timeout_s: float = 30.0,
        max_attempts: int = DEFAULT_MAX_ATTEMPTS,
        backoff_s: float = DEFAULT_BACKOFF_S,
        transport: Callable[[str, bytes, dict], bytes] | None = None,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.url = endpoint.rstrip("/") + "/chat/completions"
        self.api_key = api_key
        self.model = model
        self.max_attempts = max_attempts
        self.backoff_s = backoff_s
        self.transport = transport or _urllib_transport(timeout_s)
        self.sleep = sleep

    def __call__(self, prompt: str) -> str:
        body = json.dumps(
            {
                "model": self.model,
                # Deterministic decoding for a compiler, not a chat bot —
                # the reference uses temperature=0.1 (No_Sql.py:197); 0 is
                # the IR-stability choice.
                "temperature": 0,
                "messages": [{"role": "user", "content": prompt}],
            }
        ).encode()
        headers = {
            "Content-Type": "application/json",
            "Authorization": f"Bearer {self.api_key}",
        }

        last_error: Exception | None = None
        for attempt in range(self.max_attempts):
            try:
                raw = self.transport(self.url, body, headers)
                payload = json.loads(raw)
                return payload["choices"][0]["message"]["content"]
            except urllib.error.HTTPError as e:
                last_error = e
                # Retry only transient statuses; 4xx (except 429) is final.
                if e.code != 429 and e.code < 500:
                    break
            except (urllib.error.URLError, OSError, KeyError, IndexError,
                    TypeError, json.JSONDecodeError, ValueError) as e:
                # TypeError: a 200 whose JSON body isn't an object
                # (null/string/number) — payload["choices"] on a non-dict.
                last_error = e
            if attempt + 1 < self.max_attempts:
                self.sleep(self.backoff_s * (2**attempt))
        raise LLMClientError(f"chat completion failed: {last_error}")


def from_env(environ: dict | None = None) -> ChatCompletionsClient | None:
    """Build a client from ``NLP2NOSQL_LLM_*`` env vars; ``None`` (→ rule
    compiler only) when unconfigured — the offline-safe default."""
    env = os.environ if environ is None else environ
    endpoint = env.get("NLP2NOSQL_LLM_ENDPOINT")
    api_key = env.get("NLP2NOSQL_LLM_API_KEY")
    model = env.get("NLP2NOSQL_LLM_MODEL")
    if not (endpoint and api_key and model):
        return None
    return ChatCompletionsClient(endpoint, api_key, model)
