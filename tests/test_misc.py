"""Tests: profiling timers, HF export round-trip, multi-host helpers, concurrent client."""

import json

import jax
import numpy as np
import pytest

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.params import (
    convert_hf_state_dict,
    export_hf_state_dict,
    init_vlm_params,
    save_hf_checkpoint,
)
from zoomearth_tpu.utils.profiling import PhaseTimer

CFG = VLMConfig.tiny()


class TestPhaseTimer:
    def test_accumulates(self):
        t = PhaseTimer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        with t.phase("b"):
            pass
        s = t.summary()
        assert s["a"]["count"] == 2 and s["b"]["count"] == 1
        assert json.loads(t.report())["a"]["total_s"] >= 0


class TestHFExportRoundTrip:
    def test_roundtrip_identity(self):
        params = init_vlm_params(jax.random.key(0), CFG)
        state = export_hf_state_dict(params, CFG)
        back = convert_hf_state_dict(state, CFG, dtype="float32")
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = {tuple(str(p) for p in path): leaf for path, leaf in jax.tree_util.tree_leaves_with_path(back)}
        for path, leaf in flat_a:
            key = tuple(str(p) for p in path)
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_b[key]), atol=1e-6, err_msg=str(key)
            )

    def test_export_loads_into_hf_model(self, tmp_path):
        """The exported checkpoint must load into transformers' Qwen2.5-VL."""
        import torch
        from safetensors.torch import load_file
        from transformers import Qwen2_5_VLForConditionalGeneration
        from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLConfig

        params = init_vlm_params(jax.random.key(1), CFG)
        path = save_hf_checkpoint(params, CFG, str(tmp_path / "ckpt"))
        state = load_file(path + "/model.safetensors")
        hf_cfg = Qwen2_5_VLConfig.from_pretrained(path)
        model = Qwen2_5_VLForConditionalGeneration(hf_cfg)
        missing, unexpected = model.load_state_dict(state, strict=False)
        # tied lm_head is derived; everything else must match
        assert not unexpected
        assert all("lm_head" in m for m in missing)


class TestMultihost:
    def test_single_process_noop(self):
        from zoomearth_tpu.parallel.multihost import initialize, process_info

        assert initialize() is False
        info = process_info()
        assert info["process_count"] == 1 and info["local_devices"] == 8

    def test_global_mesh_guard(self):
        from zoomearth_tpu.parallel.multihost import make_global_mesh

        mesh = make_global_mesh(fsdp=2, tensor=2)
        assert dict(mesh.shape) == {"data": 2, "fsdp": 2, "tensor": 2}
        with pytest.raises(ValueError):
            make_global_mesh(fsdp=16, tensor=2)


def test_concurrent_client_against_live_server():
    """eval.client two-stage loop against the real in-process server (tiny model)."""
    import tempfile

    from PIL import Image

    from zoomearth_tpu.agent.processor import Processor
    from zoomearth_tpu.eval.client import ChatClient, eval_concurrent
    from zoomearth_tpu.serve.engine import ServingEngine
    from zoomearth_tpu.serve.server import OpenAIServer
    from zoomearth_tpu.tokenizer import FakeTokenizer
    from zoomearth_tpu.train.data import LRSGROSample

    params = init_vlm_params(jax.random.key(0), CFG)
    engine = ServingEngine(
        params, CFG, max_slots=2, max_seq_len=2048, decode_chunk=2,
        cache_dtype="float32", length_buckets=(1024, 2048), patch_buckets=(0, 16, 64, 256),
    )
    proc = Processor(FakeTokenizer(CFG.tokens), CFG, max_pixels=4 * 28 * 28)
    srv = OpenAIServer(engine, proc, port=0)
    srv.start()
    try:
        client = ChatClient(f"http://127.0.0.1:{srv.port}")
        rng = np.random.default_rng(0)
        img = Image.fromarray(rng.integers(0, 255, (600, 600, 3), dtype=np.uint8))
        samples = [
            LRSGROSample(question_id=str(i), image_name=f"i{i}", category="c",
                         question="what?", higher_level="p", ground_truth="car",
                         bbox=[5, 5, 20, 20], type="object")
            for i in range(3)
        ]
        with tempfile.NamedTemporaryFile(suffix=".jsonl", delete=False) as f:
            out_path = f.name
        eval_concurrent(samples, client, out_path, max_workers=3,
                        image_loader=lambda s: img, max_tokens=4)
        recs = [json.loads(l) for l in open(out_path)]
        assert len(recs) == 3
        assert all(r["model_id"] == "zoomearth-tpu (serve)" for r in recs)
        # random model emits no bbox -> error records with stage1 text captured
        assert all(isinstance(r["stage1"], str) for r in recs)
    finally:
        srv.stop()


def test_metrics_logger_tensorboard(tmp_path):
    """jsonl + tensorboard sinks both receive scalars (wandb degrades to no-op)."""
    import json

    from zoomearth_tpu.utils.metrics_sinks import MetricsLogger

    lg = MetricsLogger(str(tmp_path), report_to=("jsonl", "tensorboard", "wandb"))
    lg.log({"loss": 1.5, "note": "text-skipped"}, step=1)
    lg.log({"loss": 1.2}, step=2)
    lg.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert [l["loss"] for l in lines] == [1.5, 1.2]
    import os

    tb_files = os.listdir(tmp_path / "tb")
    assert any("tfevents" in f for f in tb_files)
