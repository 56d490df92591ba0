"""Data-generation pipeline (distilabel equivalent, reference open_r1/generate.py):
engine backend, OpenAI-endpoint backend, and the CLI surface."""

import json

import pytest

import jax

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.agent.processor import Processor
from zoomearth_tpu.models.params import init_vlm_params
from zoomearth_tpu.serve.engine import ServingEngine
from zoomearth_tpu.serve.server import OpenAIServer
from zoomearth_tpu.tokenizer import FakeTokenizer
from zoomearth_tpu.train.datagen import generate_records, write_records

CFG = VLMConfig.tiny()


@pytest.fixture(scope="module")
def stack():
    params = init_vlm_params(jax.random.key(0), CFG)
    engine = ServingEngine(
        params, CFG, max_slots=4, max_seq_len=192, decode_chunk=2,
        cache_dtype="float32", length_buckets=(64, 128), patch_buckets=(0, 16),
    )
    proc = Processor(FakeTokenizer(CFG.tokens), CFG, max_pixels=4 * 28 * 28)
    srv = OpenAIServer(engine, proc, port=0)
    srv.start()
    yield engine, proc, srv
    srv.stop()


PROMPTS = ["describe the scene", "count the ships", "name the terrain"]


def test_engine_backend_shapes_and_sampling(stack):
    engine, proc, _ = stack
    recs = generate_records(
        PROMPTS, engine=engine, processor=proc, num_generations=2,
        max_new_tokens=5, temperature=0.9, top_p=0.9, model_name="tiny",
    )
    assert [r["instruction"] for r in recs] == PROMPTS
    for r in recs:
        assert len(r["generations"]) == 2
        assert all(isinstance(g, str) for g in r["generations"])
        assert r["model_name"] == "tiny" and r["num_generations"] == 2


def test_engine_backend_greedy_generations_identical(stack):
    engine, proc, _ = stack
    recs = generate_records(
        PROMPTS[:2], engine=engine, processor=proc, num_generations=2,
        max_new_tokens=4, temperature=0.0,
    )
    for r in recs:
        assert r["generations"][0] == r["generations"][1]  # greedy -> deterministic


def test_client_backend_matches_engine_schema(stack):
    from zoomearth_tpu.eval.client import ChatClient

    _, _, srv = stack
    client = ChatClient(f"http://127.0.0.1:{srv.port}")
    recs = generate_records(
        PROMPTS[:2], client=client, num_generations=2, max_new_tokens=4,
        temperature=0.0, concurrency=2,
    )
    assert len(recs) == 2 and all(len(r["generations"]) == 2 for r in recs)


def test_backend_selection_errors(stack):
    engine, proc, _ = stack
    with pytest.raises(ValueError):
        generate_records(PROMPTS)  # no backend
    with pytest.raises(ValueError):
        generate_records(PROMPTS, engine=engine, client=object())  # both
    with pytest.raises(ValueError):
        generate_records(PROMPTS, engine=engine)  # engine without processor


def test_cli_end_to_end(stack, tmp_path):
    from zoomearth_tpu.cli.generate import main as cli_main

    _, _, srv = stack
    src = tmp_path / "prompts.jsonl"
    with open(src, "w") as f:
        for p in PROMPTS:
            f.write(json.dumps({"prompt": p}) + "\n")
    out = tmp_path / "out.jsonl"
    cli_main([
        "--dataset", str(src), "--out", str(out),
        "--server-url", f"http://127.0.0.1:{srv.port}",
        "--num-generations", "2", "--max-new-tokens", "4",
        "--temperature", "0", "--concurrency", "2", "--limit", "2",
    ])
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 2 and all(len(r["generations"]) == 2 for r in rows)


def test_write_records_roundtrip(tmp_path):
    recs = [{"instruction": "a", "generations": ["x"], "model_name": "m",
             "num_generations": 1, "max_new_tokens": 4, "temperature": 0.0,
             "top_p": 1.0}]
    path = write_records(recs, str(tmp_path / "d" / "r.jsonl"))
    assert [json.loads(l) for l in open(path)] == recs
