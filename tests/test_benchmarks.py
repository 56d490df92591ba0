"""Benchmark registry + job runner (lighteval-over-Slurm equivalent,
reference open_r1/utils/evaluation.py)."""

import json

import pytest

from zoomearth_tpu.eval import benchmarks as BM


def test_default_registry():
    names = BM.get_benchmarks()
    assert "lrs_gro" in names and "lrs_gro_mini" in names


def test_register_custom_suite():
    BM.register_benchmark("custom_suite_t", data_file="x.jsonl", image_folder="im",
                          extra_infer_args=("--limit", "8"), score=False)
    try:
        job = BM.build_job("custom_suite_t", "/ckpt/step50", step=50)
        assert "--limit" in job["cmd"] and "8" in job["cmd"]
        assert "score_cmd" not in job
    finally:
        BM.BENCHMARKS.pop("custom_suite_t")


def test_run_benchmark_jobs_queue_and_all(tmp_path):
    jobs = BM.run_benchmark_jobs(["all"], "/ckpt/step10", step=10,
                                 output_dir=str(tmp_path))
    assert {j["benchmark"] for j in jobs} == set(BM.get_benchmarks())
    rows = [json.loads(l) for l in (tmp_path / "benchmark_jobs.jsonl").read_text().splitlines()]
    assert len(rows) == len(jobs)
    assert all(r["step"] == 10 and "zoomearth_tpu.cli.infer" in " ".join(r["cmd"])
               for r in rows)
    assert all("zoomearth_tpu.cli.eval" in " ".join(r["score_cmd"]) for r in rows)


def test_unknown_benchmark_raises(tmp_path):
    with pytest.raises(ValueError, match="unknown benchmark"):
        BM.run_benchmark_jobs(["nope"], "/ckpt", output_dir=str(tmp_path))


def test_overrides_applied(tmp_path):
    jobs = BM.run_benchmark_jobs(["lrs_gro"], "/ckpt", output_dir=str(tmp_path),
                                 data_file="/my/test.jsonl", image_folder="/my/imgs")
    cmd = jobs[0]["cmd"]
    assert "/my/test.jsonl" in cmd and "/my/imgs" in cmd


def test_job_cmds_parse_with_infer_cli():
    """Every registered benchmark's job cmd must be accepted by cli/infer's own
    argument parser (catches registry/CLI flag drift — the jobs run detached, so a
    bad flag would otherwise only surface as a silently dead subprocess)."""
    from zoomearth_tpu.cli.infer import build_parser

    parser = build_parser()
    for name in BM.get_benchmarks():
        job = BM.build_job(name, "/ckpt/step1", step=1)
        args = parser.parse_args(job["cmd"][3:])  # strip: python -m module
        assert args.model_name == "/ckpt/step1"


def test_queue_drainer_executes_and_is_idempotent(tmp_path, capsys):
    """cli/run_benchmarks plays the scheduler: executes pending job specs (cmd then
    score_cmd), ledgers results, and skips ledgered jobs on re-run."""
    import sys

    from zoomearth_tpu.cli.run_benchmarks import main as drain

    queue = tmp_path / "benchmark_jobs.jsonl"
    marker = tmp_path / "ran.txt"
    job = {
        "benchmark": "fake", "step": 7, "checkpoint": "/ckpt",
        "cmd": [sys.executable, "-c",
                f"open({str(marker)!r}, 'a').write('infer\\n')"],
        "score_cmd": [sys.executable, "-c",
                      f"open({str(marker)!r}, 'a').write('score\\n')"],
    }
    with open(queue, "w") as f:
        f.write(json.dumps(job) + "\n")
    drain(["--queue", str(queue)])
    assert marker.read_text() == "infer\nscore\n"
    ledger = tmp_path / "benchmark_results.jsonl"
    recs = [json.loads(l) for l in ledger.read_text().splitlines()]
    assert len(recs) == 1 and recs[0]["ok"] and recs[0]["rcs"] == [0, 0]
    # idempotent: second drain runs nothing
    drain(["--queue", str(queue)])
    assert marker.read_text() == "infer\nscore\n"
    assert len(ledger.read_text().splitlines()) == 1


def test_queue_drainer_failed_infer_skips_score(tmp_path):
    import sys

    from zoomearth_tpu.cli.run_benchmarks import main as drain

    queue = tmp_path / "q.jsonl"
    marker = tmp_path / "ran.txt"
    job = {
        "benchmark": "bad", "step": 1, "checkpoint": "/c",
        "cmd": [sys.executable, "-c", "import sys; sys.exit(2)"],
        "score_cmd": [sys.executable, "-c",
                      f"open({str(marker)!r}, 'a').write('score\\n')"],
    }
    with open(queue, "w") as f:
        f.write(json.dumps(job) + "\n")
    drain(["--queue", str(queue), "--ledger", str(tmp_path / "led.jsonl")])
    assert not marker.exists()  # score never ran
    rec = json.loads((tmp_path / "led.jsonl").read_text())
    assert rec["ok"] is False and rec["rcs"] == [2]


def test_queue_drainer_timeout_is_ledgered(tmp_path):
    """A hung job must be ledgered as failed (rc -9), or a cron-driven drainer
    re-picks it forever."""
    import sys

    from zoomearth_tpu.cli.run_benchmarks import main as drain

    queue = tmp_path / "q.jsonl"
    job = {"benchmark": "hang", "step": 1, "checkpoint": "/c",
           "cmd": [sys.executable, "-c", "import time; time.sleep(30)"]}
    with open(queue, "w") as f:
        f.write(json.dumps(job) + "\n")
    drain(["--queue", str(queue), "--ledger", str(tmp_path / "led.jsonl"),
           "--timeout", "1"])
    rec = json.loads((tmp_path / "led.jsonl").read_text())
    assert rec["ok"] is False and rec["rcs"] == [-9]
    # idempotent skip on the next drain
    drain(["--queue", str(queue), "--ledger", str(tmp_path / "led.jsonl"),
           "--timeout", "1"])
    assert len((tmp_path / "led.jsonl").read_text().splitlines()) == 1


def test_infer_cli_writes_where_score_cmd_reads(tmp_path):
    """The job's score_cmd must point at the exact file the infer cmd writes
    (out_dir + exp_name + rank suffix)."""
    from zoomearth_tpu.cli.infer import build_parser

    job = BM.build_job("lrs_gro", "/ckpt", step=5, out_dir=str(tmp_path))
    args = build_parser().parse_args(job["cmd"][3:])
    written = f"{args.out_dir}/{args.exp_name}{args.rank}.jsonl"
    scored = job["score_cmd"][job["score_cmd"].index("--results_file") + 1]
    assert written == scored, (written, scored)
