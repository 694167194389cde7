"""Training subsystem: diffusion objectives, jitted train step, LoRA
fine-tuning, EMA, train-state checkpointing, data feeding.

New capability vs the inference-only reference (SURVEY.md §2.6). The
design mirrors the inference stack: pure functions over param pytrees,
one jitted step, sharding via the same TP rules (parallel/sharding.py)
plus data-parallel batches — GSPMD inserts the gradient all-reduce.
"""
from .losses import LossConfig, diffusion_loss, loss_weights, q_sample, \
    sample_timesteps
from .step import TrainState, default_optimizer, make_train_step
from .lora import DEFAULT_TARGETS, init_lora, make_lora_train_step, merge
from .checkpoint import load_train_state, save_train_state
from .data import (LatentDataset, NativeShardDataset,
                   make_global_batch, shard_batch, write_shard)

__all__ = [
    "LossConfig", "diffusion_loss", "loss_weights", "q_sample",
    "sample_timesteps", "TrainState", "default_optimizer",
    "make_train_step", "DEFAULT_TARGETS", "init_lora",
    "make_lora_train_step", "merge", "load_train_state",
    "save_train_state", "LatentDataset", "NativeShardDataset", "write_shard", "make_global_batch",
    "shard_batch",
]
