"""Randomized engine stress: every submitted item must complete or error cleanly.

Property test for the continuous-batching scheduler (motivated by the r5 admission
bug: one over-bucket chunk used to kill the pump and hang all clients). A seeded
random mix of plain requests, hold_slot episodes + continuations (some deliberately
over-bucket), image requests, and slot releases flows through the background pump;
the invariants: (a) every request id reaches results within the timeout, (b) valid
requests finish stop/length with <= max_tokens, (c) invalid ones finish "error",
(d) the engine ends with no active slots, no leaked held slots, and still serves a
fresh request afterward.
"""

import numpy as np
import pytest

import jax

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.params import init_vlm_params
from zoomearth_tpu.serve.engine import Continuation, Request, ServingEngine

CFG = VLMConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return init_vlm_params(jax.random.key(0), CFG)


def _image(grid, rng):
    pv = rng.standard_normal(
        (grid[0] * grid[1] * grid[2], CFG.vision.patch_dim)
    ).astype(np.float32)
    return pv, grid


@pytest.mark.parametrize("seed", [0, 1])
def test_random_traffic_all_requests_resolve(params, seed):
    rng = np.random.default_rng(seed)
    tok = CFG.tokens
    engine = ServingEngine(
        params, CFG, max_slots=3, max_seq_len=256, decode_chunk=2,
        cache_dtype="float32", length_buckets=(32, 64), patch_buckets=(0, 16),
    )
    engine.start()
    expected = {}  # request_id -> "ok" | "error"
    held_parents = []
    try:
        for i in range(14):
            kind = rng.integers(0, 10)
            rid = f"s{seed}-r{i}"
            n_text = int(rng.integers(3, 20))
            ids = [tok.im_start] + list(rng.integers(1, 400, size=n_text))
            if kind < 2:  # image request
                pv, g = _image((1, 4, 4), rng)
                n = (g[0] * g[1] * g[2]) // CFG.vision.merge_unit
                ids += [tok.vision_start] + [tok.image_pad] * n + [tok.vision_end]
                engine.submit(Request(request_id=rid, token_ids=ids, images=[(pv, g)],
                                      max_tokens=int(rng.integers(2, 6))))
                expected[rid] = "ok"
            elif kind < 5 and len(held_parents) < 2:  # hold-slot episode starter
                # cap concurrent holders below max_slots: a pool fully held by
                # never-continued episodes starves new admissions BY CONTRACT (the
                # episode driver must continue or release its holds — same as a
                # vLLM client that pins KV forever)
                engine.submit(Request(request_id=rid, token_ids=ids, images=[],
                                      max_tokens=int(rng.integers(2, 6)),
                                      hold_slot=True))
                expected[rid] = "ok"
                held_parents.append(rid)
            elif kind < 7 and held_parents:  # continuation (maybe over-bucket)
                parent = held_parents.pop(0)
                # consumes the parent's result (get_completion pops) — resolve its
                # expectation here instead of in the final sweep
                c = engine.get_completion(parent, timeout=120)
                assert c.finish_reason in ("stop", "length"), (parent, c)
                expected.pop(parent)
                over = rng.integers(0, 2) == 1
                chunk = list(rng.integers(1, 400, size=100 if over else 5))
                engine.submit_continuation(Continuation(
                    request_id=rid, parent_request_id=parent, chunk_ids=chunk,
                    images=[], kept_tokens=1, max_tokens=3,
                ))
                expected[rid] = "error" if over else "ok"
            elif kind < 8 and held_parents:  # abandon a held episode
                parent = held_parents.pop(0)
                c = engine.get_completion(parent, timeout=120)
                assert c.finish_reason in ("stop", "length"), (parent, c)
                expected.pop(parent)
                engine.release_slot(parent)
            else:  # plain request
                engine.submit(Request(request_id=rid, token_ids=ids, images=[],
                                      max_tokens=int(rng.integers(2, 6))))
                expected[rid] = "ok"
        for rid, want in expected.items():
            c = engine.get_completion(rid, timeout=180)
            if want == "ok":
                assert c.finish_reason in ("stop", "length"), (rid, c)
            else:
                assert c.finish_reason == "error", (rid, c)
        # drain leftover held slots, then check for leaks
        for parent in held_parents:
            engine.release_slot(parent)
        engine.run_until_idle()
        assert not engine.active.any()
        assert not engine.held
        assert all(s.request is None or s.held is False for s in engine.slots)
        # the engine still serves after the storm
        engine.submit(Request(request_id=f"s{seed}-post", token_ids=[tok.im_start, 5, 6],
                              images=[], max_tokens=3))
        assert engine.get_completion(f"s{seed}-post", timeout=120).finish_reason in (
            "stop", "length")
    finally:
        engine.stop()
