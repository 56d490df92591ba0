"""Checkpoint-save callbacks: HF-format export + benchmark job triggering.

Local-first equivalents of the reference's hub/benchmark plumbing
(utils/callbacks.py:28-85 `PushToHubRevisionCallback`: on_save pushes the checkpoint
to a HF Hub branch, then submits Slurm lighteval jobs via utils/evaluation.py:17-23).
This environment has no hub and no Slurm, so:

- `ExportHFCallback` writes an HF-layout checkpoint (safetensors + config) to
  `<export_dir>/<revision>-step<NNN>/` — the "push to a hub revision" with a local
  directory standing in for the hub (consumable by `VLMConfig.from_hf_dir` and by the
  reference's own tooling).
- `BenchmarkCallback` records a runnable benchmark job per save: either spawns the
  eval pipeline (`cli/infer.py` + `cli/eval.py`) as a detached subprocess right away
  (run_now=True, the Slurm-submission analog) or appends a job spec to
  `benchmark_jobs.jsonl` for an external scheduler to pick up.

Wire into training loops via `callbacks=[...]`; each is called as
`cb.on_save(step, ckpt_dir, params)`.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence


@dataclasses.dataclass
class ExportHFCallback:
    """Export an HF-format checkpoint at each save (hub revision push, local)."""

    export_dir: str
    cfg: object  # VLMConfig
    revision: str = "main"
    tokenizer_src: Optional[str] = None  # directory whose tokenizer files are copied

    def on_save(self, step: int, ckpt_dir: str, params) -> str:
        from ..models.params import save_hf_checkpoint

        out = os.path.join(self.export_dir, f"{self.revision}-step{step:06d}")
        save_hf_checkpoint(params, self.cfg, out)
        if self.tokenizer_src and os.path.isdir(self.tokenizer_src):
            import shutil

            for name in ("tokenizer.json", "tokenizer_config.json", "merges.txt", "vocab.json"):
                src = os.path.join(self.tokenizer_src, name)
                if os.path.exists(src):
                    shutil.copy(src, os.path.join(out, name))
        return out


@dataclasses.dataclass
class BenchmarkCallback:
    """Queue (or launch) the LRS-GRO eval pipeline against each saved checkpoint.

    The reference submits lighteval Slurm jobs per hub revision
    (utils/evaluation.py:76-91); here the job is the repo's own eval CLI pair. With
    run_now the subprocess detaches (fire-and-forget, like sbatch); otherwise the job
    spec lands in `<output_dir>/benchmark_jobs.jsonl` for an external runner.
    """

    output_dir: str
    data_file: str = ""
    image_folder: str = ""
    benchmarks: Sequence[str] = ("lrs_gro",)
    run_now: bool = False

    def on_save(self, step: int, ckpt_dir: str, params=None) -> list:
        """One job per registered benchmark via the eval.benchmarks registry (the
        lighteval task registry equivalent, reference evaluation.py:27-62);
        data_file/image_folder override the registered template paths."""
        from ..eval.benchmarks import run_benchmark_jobs

        return run_benchmark_jobs(
            self.benchmarks, ckpt_dir, step=step, output_dir=self.output_dir,
            run_now=self.run_now,
            data_file=self.data_file or None,
            image_folder=self.image_folder or None,
        )


def run_callbacks(callbacks, step: int, ckpt_dir: str, params=None):
    for cb in callbacks or ():
        cb.on_save(step, ckpt_dir, params)
