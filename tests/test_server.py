"""OpenAI-compatible server tests: live HTTP round-trips against the tiny model,
including the stage-2 assistant-partial-with-image pattern the reference client sends."""

import base64
import io
import json
import http.client

import numpy as np
import pytest
from PIL import Image

import jax

from zoomearth_tpu.agent.processor import Processor
from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.params import init_vlm_params
from zoomearth_tpu.serve.engine import ServingEngine
from zoomearth_tpu.serve.server import OpenAIServer, render_chat
from zoomearth_tpu.tokenizer import FakeTokenizer

CFG = VLMConfig.tiny()


def _data_url(seed=0, size=64):
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


class TestRenderChat:
    def test_simple_user(self):
        text, images, cont = render_chat([{"role": "user", "content": "hi"}])
        assert text == ("<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
                        "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n")
        assert images == [] and not cont

    def test_image_content(self):
        text, images, _ = render_chat([{
            "role": "user",
            "content": [
                {"type": "image_url", "image_url": {"url": _data_url()}},
                {"type": "text", "text": "what is this?"},
            ],
        }])
        assert "<|vision_start|><|image_pad|><|vision_end|>what is this?" in text
        assert len(images) == 1

    def test_assistant_partial_continued(self):
        """The reference stage-2 call: trailing assistant message with crop image
        (infer_vllm.py:201-216) must be continued, not answered."""
        text, images, cont = render_chat([
            {"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": _data_url(1)}},
                {"type": "text", "text": "q?"},
            ]},
            {"role": "assistant", "content": [
                {"type": "text", "text": "<think>so far</think>"},
                {"type": "image_url", "image_url": {"url": _data_url(2)}},
            ]},
        ])
        assert cont and len(images) == 2
        assert text.endswith("<|im_start|>assistant\n<think>so far</think>" +
                             "<|vision_start|><|image_pad|><|vision_end|>")

    def test_explicit_system_not_duplicated(self):
        text, _, _ = render_chat([
            {"role": "system", "content": "custom"},
            {"role": "user", "content": "x"},
        ])
        assert text.count("<|im_start|>system") == 1 and "custom" in text


@pytest.fixture(scope="module")
def server():
    params = init_vlm_params(jax.random.key(0), CFG)
    engine = ServingEngine(
        params, CFG, max_slots=2, max_seq_len=256, decode_chunk=2,
        cache_dtype="float32", length_buckets=(128, 256), patch_buckets=(0, 16, 64),
    )
    proc = Processor(FakeTokenizer(CFG.tokens), CFG, max_pixels=4 * 28 * 28)
    srv = OpenAIServer(engine, proc, port=0)
    srv.start()
    yield srv
    srv.stop()


def _post(server, path, payload):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
    conn.request("POST", path, json.dumps(payload), {"Content-Type": "application/json"})
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


def _get(server, path):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    conn.request("GET", path)
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


def test_models_and_health(server):
    status, body = _get(server, "/v1/models")
    assert status == 200 and body["data"][0]["id"] == "zoomearth-tpu"
    status, body = _get(server, "/health")
    assert status == 200 and body["status"] == "ok"


def test_chat_completion_text(server):
    status, body = _post(server, "/v1/chat/completions", {
        "model": "zoomearth-tpu",
        "messages": [{"role": "user", "content": "Hello"}],
        "max_tokens": 6,
        "temperature": 0.0,
    })
    assert status == 200
    choice = body["choices"][0]
    assert choice["message"]["role"] == "assistant"
    assert choice["finish_reason"] in ("stop", "length")
    assert body["usage"]["completion_tokens"] <= 6
    assert body["usage"]["total_tokens"] == body["usage"]["prompt_tokens"] + body["usage"]["completion_tokens"]


def test_chat_completion_with_image(server):
    status, body = _post(server, "/v1/chat/completions", {
        "messages": [{
            "role": "user",
            "content": [
                {"type": "image_url", "image_url": {"url": _data_url(3, 64)}},
                {"type": "text", "text": "what?"},
            ],
        }],
        "max_tokens": 4,
    })
    assert status == 200
    assert isinstance(body["choices"][0]["message"]["content"], str)


def test_two_stage_client_pattern(server):
    """Reference client two-call pattern: stage 1, then assistant-partial stage 2."""
    s1 = _post(server, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": _data_url(4, 64)}},
            {"type": "text", "text": "what is it?"},
        ]}],
        "max_tokens": 4,
    })[1]
    partial = s1["choices"][0]["message"]["content"]
    status, s2 = _post(server, "/v1/chat/completions", {
        "messages": [
            {"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": _data_url(4, 64)}},
                {"type": "text", "text": "what is it?"},
            ]},
            {"role": "assistant", "content": [
                {"type": "text", "text": partial},
                {"type": "image_url", "image_url": {"url": _data_url(5, 64)}},
            ]},
        ],
        "max_tokens": 4,
    })
    assert status == 200


def test_bad_request_schema(server):
    status, body = _post(server, "/v1/chat/completions", {"no_messages": True})
    assert status == 400 and "error" in body


def test_concurrent_requests(server):
    import threading

    results = {}

    def call(i):
        results[i] = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": f"request number {i}"}],
            "max_tokens": 4,
        })

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 4
    assert all(status == 200 for status, _ in results.values())


def test_streaming_sse(server):
    """`"stream": true` -> SSE chat.completion.chunk events whose deltas concatenate
    to the non-streaming answer for the same prompt, ending with a finish_reason
    chunk and `data: [DONE]`."""
    prompt = {"messages": [{"role": "user", "content": "Stream me"}],
              "max_tokens": 6, "temperature": 0.0}
    _, ref = _post(server, "/v1/chat/completions", prompt)
    ref_content = ref["choices"][0]["message"]["content"]

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
    conn.request("POST", "/v1/chat/completions",
                 json.dumps({**prompt, "stream": True}),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "text/event-stream"
    raw = resp.read().decode()  # Connection: close — read to EOF
    conn.close()
    events = [l[len("data: "):] for l in raw.split("\n\n") if l.startswith("data: ")]
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    assert chunks[0]["choices"][0]["delta"] == {"role": "assistant"}
    finish = chunks[-1]["choices"][0]["finish_reason"]
    assert finish in ("stop", "length")
    content = "".join(c["choices"][0]["delta"].get("content", "") for c in chunks)
    assert content.strip() == ref_content
    # incremental: a full-length 6-token answer must arrive over several chunks
    # (prefill first token + decode_chunk=2 batches), not as one blob
    n_content = sum(1 for c in chunks if c["choices"][0]["delta"].get("content"))
    if finish == "length":
        assert n_content >= 2
    elif ref_content:
        assert n_content >= 1


def test_streaming_timeout_terminates_in_protocol(server):
    """ADVICE r4 (low): a request that exceeds request_timeout after the SSE headers
    are on the wire must end with an in-protocol error event + [DONE] — never a JSON
    400 status line written into the open event stream."""
    orig_submit = server.engine.submit
    orig_timeout = server.request_timeout
    server.request_timeout = 0.6
    server.engine.submit = lambda req: None  # request never progresses
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
        conn.request("POST", "/v1/chat/completions",
                     json.dumps({"messages": [{"role": "user", "content": "hang"}],
                                 "max_tokens": 4, "stream": True}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        raw = resp.read().decode()
        conn.close()
    finally:
        server.engine.submit = orig_submit
        server.request_timeout = orig_timeout
    assert "HTTP/" not in raw  # no status line leaked mid-stream
    events = [l[len("data: "):] for l in raw.split("\n\n") if l.startswith("data: ")]
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]  # every event is valid JSON
    assert chunks[-1]["error"]["type"] == "TimeoutError"


def test_streaming_over_bucket_prompt_errors_in_protocol(server):
    """A submit-time rejection (prompt over the largest prefill bucket) lands AFTER
    the SSE headers; the stream must end with an in-protocol error event + [DONE],
    never an HTTP 400 status line."""
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    conn.request("POST", "/v1/chat/completions",
                 json.dumps({"messages": [{"role": "user", "content": "w " * 250}],
                             "max_tokens": 2, "stream": True}),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200  # headers were already committed
    raw = resp.read().decode()
    conn.close()
    assert "HTTP/" not in raw
    events = [l[len("data: "):] for l in raw.split("\n\n") if l.startswith("data: ")]
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert chunks[-1]["error"]["type"] == "ValueError"
    # either submit-time rejection (max_seq_len or largest-bucket) ends in-protocol
    assert "exceeds" in chunks[-1]["error"]["message"]
