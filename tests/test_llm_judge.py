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


def test_accuracy_dispatch_llm(monkeypatch):
    from zoomearth_tpu.rewards.generic import accuracy_reward

    monkeypatch.delenv("JUDGE_BASE_URL", raising=False)
    monkeypatch.delenv("OPENAI_API_BASE", raising=False)
    out = accuracy_reward(["<answer>a</answer>"], ["<answer>a</answer>"],
                          accu_reward_method=["llm"])
    assert out == [1.0]
