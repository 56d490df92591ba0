"""LLM-judge reward: fallback behavior + live judging against our own server."""

import numpy as np
import pytest

import jax

from zoomearth_tpu.rewards.llm_judge import evaluate_answer_similarity, llm_reward


def test_fallback_exact_match(monkeypatch):
    monkeypatch.delenv("JUDGE_BASE_URL", raising=False)
    monkeypatch.delenv("OPENAI_API_BASE", raising=False)
    assert llm_reward("<answer>car</answer>", "<answer>car</answer>") == 1.0
    assert llm_reward("<answer>dog</answer>", "<answer>car</answer>") == 0.0


def test_answer_extraction_last_match():
    assert llm_reward("<answer>x</answer> later <answer>car</answer>", "car") == 1.0


class FakeJudgeClient:
    def __init__(self, reply):
        self.reply = reply
        self.calls = []

    def create(self, messages, **kw):
        self.calls.append(messages)
        return self.reply


def test_judge_client_used():
    c = FakeJudgeClient("1.0")
    assert evaluate_answer_similarity("vessel", "ship", client=c) == 1.0
    assert "Student's response: vessel" in c.calls[0][1]["content"]


def test_judge_garbage_reply_falls_back():
    c = FakeJudgeClient("I think yes")
    # float('I think yes') raises -> exact-match fallback
    assert evaluate_answer_similarity("ship", "ship", client=c) == 1.0
    assert evaluate_answer_similarity("boat", "ship", client=c) == 0.0


def test_live_endpoint_socket_level(monkeypatch):
    """Full request -> HTTP -> parse -> reward path against a LIVE local
    OpenAI-compatible endpoint (reference grpo_jsonl.py:49-52,164-197: an OpenAI
    client pointed at a local judge server). The stub judges deterministically so
    the assertion covers the whole wire path, not the judge model's quality."""
    import http.server
    import json
    import threading

    class JudgeHandler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            assert self.path == "/v1/chat/completions"
            req = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            # the judge prompt carries both answers; an actual judge compares them
            user = req["messages"][-1]["content"]
            student = user.split("Student's response: ")[1].split("\n")[0].strip()
            truth = user.split("Correct solution: ")[1].split("\n")[0].strip()
            synonyms = {("vessel", "ship"), ("auto", "car")}
            verdict = "1.0" if student == truth or (student, truth) in synonyms else "0.0"
            body = json.dumps({
                "choices": [{"message": {"role": "assistant", "content": verdict}}]
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), JudgeHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        monkeypatch.setenv("JUDGE_BASE_URL", f"http://127.0.0.1:{srv.server_port}")
        # env-configured client path (no injected client object)
        assert llm_reward("<answer>vessel</answer>", "<answer>ship</answer>") == 1.0
        assert llm_reward("<answer>truck</answer>", "<answer>ship</answer>") == 0.0
        # and through the generic accuracy dispatch, as GRPO uses it
        from zoomearth_tpu.rewards.generic import accuracy_reward

        out = accuracy_reward(
            ["<answer>auto</answer>", "<answer>plane</answer>"],
            ["<answer>car</answer>", "<answer>car</answer>"],
            accu_reward_method=["llm", "llm"],
        )
        assert out == [1.0, 0.0]
    finally:
        srv.shutdown()


def test_accuracy_dispatch_llm(monkeypatch):
    from zoomearth_tpu.rewards.generic import accuracy_reward

    monkeypatch.delenv("JUDGE_BASE_URL", raising=False)
    monkeypatch.delenv("OPENAI_API_BASE", raising=False)
    out = accuracy_reward(["<answer>a</answer>"], ["<answer>a</answer>"],
                          accu_reward_method=["llm"])
    assert out == [1.0]
