"""Checkpoint/resume: orbax-backed sharded pytree checkpoints + training_info.json.

Replaces the reference's two mechanisms (SURVEY.md §5.4): accelerate save_state +
training_info.json for SFT (SFT.py:208-226) and HF Trainer checkpoint-* dirs for GRPO
(grpo_jsonl.py:1006-1009). One implementation serves both: save(step) writes
checkpoint-{step}/ with params/opt_state/meta, latest() finds the newest, restore()
loads with the arrays placed on the current mesh shardings.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


class CheckpointManager:
    def __init__(self, output_dir: str):
        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)

    def _dir(self, step: int) -> str:
        return os.path.join(self.output_dir, f"checkpoint-{step}")

    def save(self, step: int, params, opt_state=None, extra: Optional[Dict[str, Any]] = None):
        ckpt_dir = self._dir(step)
        cp = _checkpointer()
        cp.save(os.path.join(ckpt_dir, "params"), params, force=True)
        if opt_state is not None:
            cp.save(os.path.join(ckpt_dir, "opt_state"), opt_state, force=True)
        info = {"step": step, "latest_checkpoint": ckpt_dir}
        if extra:
            info.update(extra)
        with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
            json.dump(info, f)
        # training_info.json mirrors the reference's resume pointer (SFT.py:211-219)
        with open(os.path.join(self.output_dir, "training_info.json"), "w") as f:
            json.dump(info, f)
        return ckpt_dir

    def latest(self) -> Optional[int]:
        """Newest checkpoint step (reference auto-detect, grpo_jsonl.py:1006-1009)."""
        steps = []
        for d in glob.glob(os.path.join(self.output_dir, "checkpoint-*")):
            m = re.match(r".*checkpoint-(\d+)$", d)
            if m and os.path.exists(os.path.join(d, "meta.json")):
                steps.append(int(m.group(1)))
        return max(steps) if steps else None

    def restore(
        self, step: int, params_template, opt_state_template=None
    ) -> Tuple[Any, Any, Dict]:
        """Restore with sharding/dtype taken from the provided templates (live arrays
        or ShapeDtypeStructs with .sharding)."""
        import orbax.checkpoint as ocp

        ckpt_dir = self._dir(step)
        cp = _checkpointer()

        def as_restore_args(tree):
            return jax.tree.map(
                lambda x: ocp.ArrayRestoreArgs(
                    sharding=getattr(x, "sharding", None), dtype=x.dtype
                ),
                tree,
            )

        params = cp.restore(
            os.path.join(ckpt_dir, "params"),
            item=params_template,
            restore_args=as_restore_args(params_template),
        )
        opt_state = None
        if opt_state_template is not None and os.path.exists(os.path.join(ckpt_dir, "opt_state")):
            opt_state = cp.restore(
                os.path.join(ckpt_dir, "opt_state"),
                item=opt_state_template,
                restore_args=as_restore_args(opt_state_template),
            )
        with open(os.path.join(ckpt_dir, "meta.json")) as f:
            meta = json.load(f)
        return params, opt_state, meta
