"""SFT training CLI (reference run_scripts/train_sft.sh -> src/train/SFT.py surface).

Flag names follow the reference argparse (SFT.py:228-257)."""

from __future__ import annotations

import argparse

import jax

from ..parallel.mesh import make_mesh
from ..train.data import load_sft_dataset
from ..train.sft import SFTConfig
from ..train.sft_loop import SFTLoopConfig, train_sft
from .common import load_model_and_processor


def main(argv=None):
    p = argparse.ArgumentParser(description="ZoomEarth-TPU SFT")
    p.add_argument("--model_name", required=True, help="local HF checkpoint directory")
    p.add_argument("--dataset_name_train", required=True, help="SFT jsonl file")
    p.add_argument("--img_folder", required=True)
    p.add_argument("--output_dir", default="./sft_out")
    p.add_argument("--num_train_epochs", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=8, help="GLOBAL batch size")
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--warmup_steps", type=int, default=500)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--save_steps", type=int, default=100)
    p.add_argument("--log_steps", type=int, default=10)
    p.add_argument("--max_pixels", type=int, default=64 * 64 * 28 * 28)  # train_sft.sh:22
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resume_from_checkpoint", action="store_true")
    p.add_argument("--report_to", nargs="+", default=["jsonl"],
                   help="metric sinks: jsonl, tensorboard, wandb (reference SFT.py:333-339)")
    p.add_argument("--fsdp", type=int, default=1, help="fsdp mesh axis size")
    p.add_argument("--tensor", type=int, default=1, help="tensor mesh axis size")
    # multi-host launch (torchrun --master_addr/--nnodes/--node_rank analog,
    # reference run_scripts/train_grpo.sh:34-36; on TPU pods all three may be
    # omitted — jax.distributed self-configures)
    p.add_argument("--coordinator_address", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    from .config import parse_with_yaml

    args = parse_with_yaml(p, argv)

    if args.coordinator_address or (args.num_processes or 1) > 1:
        from ..parallel.multihost import initialize

        initialize(args.coordinator_address, args.num_processes, args.process_id)
    params, cfg, processor = load_model_and_processor(args.model_name, max_pixels=args.max_pixels)
    mesh = make_mesh(data=-1, fsdp=args.fsdp, tensor=args.tensor) if len(jax.devices()) > 1 else None
    # jsonl file OR an HF dataset directory (the reference's load_from_disk format,
    # SFT.py:181) — auto-detected
    dataset = load_sft_dataset(args.dataset_name_train, args.img_folder)
    sft_cfg = SFTConfig(
        learning_rate=args.lr, warmup_steps=args.warmup_steps,
        weight_decay=args.weight_decay, max_grad_norm=args.max_grad_norm,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
    )
    loop_cfg = SFTLoopConfig(
        output_dir=args.output_dir, num_train_epochs=args.num_train_epochs,
        batch_size=args.batch_size, save_steps=args.save_steps, log_steps=args.log_steps,
        max_pixels=args.max_pixels, seed=args.seed,
        resume_from_checkpoint=args.resume_from_checkpoint,
        report_to=tuple(set(args.report_to) | {"jsonl"}),
    )
    train_sft(params, cfg, sft_cfg, loop_cfg, dataset, processor, mesh=mesh)


if __name__ == "__main__":
    main()
