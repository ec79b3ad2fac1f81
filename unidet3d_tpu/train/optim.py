"""Optimizer + LR schedule.

Mirror of the reference training recipe (config:716-730): AdamW lr 2e-4,
weight decay 0.05, betas torch defaults, gradient clipping by global norm 10,
polynomial LR decay with power 0.9 over the full schedule.
"""
from __future__ import annotations

import optax


def poly_schedule(base_lr: float, total_steps: int, power: float = 0.9):
    def fn(step):
        frac = 1.0 - (step / max(total_steps, 1))
        return base_lr * (frac**power)

    return fn


def make_optimizer(
    base_lr: float = 2e-4,
    weight_decay: float = 0.05,
    total_steps: int = 100_000,
    power: float = 0.9,
    clip_norm: float = 10.0,
):
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(
            learning_rate=poly_schedule(base_lr, total_steps, power),
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=weight_decay,
        ),
    )
