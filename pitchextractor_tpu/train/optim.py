"""Optimizer and LR schedule.

Replicates the reference's AdamW + OneCycleLR stack (optimizers.py:54-76):
AdamW(lr, weight_decay=5e-4, betas=(0.9, 0.98), eps=1e-9) with a per-step
OneCycle schedule (cosine annealing, div_factor=25, final_div_factor=5,
pct_start default 0.0 — i.e. no warm-up, pure max→min cosine decay).

The ``MultiOptimizer`` dict-of-optimizers wrapper mirrors the reference API
surface (optimizers.py:11-47) even though the single-optimizer path is what
training uses (SURVEY.md §2.8: "dead code ... but part of the API surface").
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import optax


def onecycle_schedule(
    max_lr: float,
    epochs: int,
    steps_per_epoch: int,
    pct_start: float = 0.0,
    div_factor: float = 25.0,
    final_div_factor: float = 5.0,
) -> Callable:
    """torch.optim.lr_scheduler.OneCycleLR with anneal_strategy='cos'.

    torch semantics: total_steps = epochs·steps_per_epoch;
    initial_lr = max_lr / div_factor; min_lr = initial_lr / final_div_factor.
    Phase 1 (len = pct_start·total − 1 steps) anneals initial→max; phase 2
    anneals max→min over the remainder.  The reference always passes
    pct_start=0.0 (train.py:95), collapsing phase 1.
    """
    total_steps = int(epochs) * int(steps_per_epoch)
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    phase1_end = float(pct_start) * total_steps - 1.0

    def schedule(step):
        # torch places the phase-1 boundary at pct_start·total − 1; with
        # pct_start=0 that is −1, so step 0 already sits fractionally into
        # the cosine decay (lr(0) slightly below max_lr) — match it exactly.
        step = jnp.minimum(step, total_steps - 1).astype(jnp.float32)
        denom2 = max((total_steps - 1.0) - phase1_end, 1e-9)
        pct2 = jnp.clip((step - phase1_end) / denom2, 0.0, 1.0)
        lr2 = min_lr + (max_lr - min_lr) / 2.0 * (1.0 + jnp.cos(math.pi * pct2))
        if phase1_end > 0:
            pct1 = jnp.clip(step / phase1_end, 0.0, 1.0)
            lr1 = initial_lr + (max_lr - initial_lr) / 2.0 * (1.0 - jnp.cos(math.pi * pct1))
            return jnp.where(step <= phase1_end, lr1, lr2)
        return lr2

    return schedule


def build_optimizer(parameters: Dict) -> Tuple[optax.GradientTransformation, Callable]:
    """Factory with the reference's signature shape (optimizers.py:50-52):
    ``parameters = {"params": ..., "optimizer_params": {...},
    "scheduler_params": {...}}`` -> (optax transform, schedule fn).

    ``params`` is accepted for compatibility but unused — optax transforms
    are stateless w.r.t. the tree until ``init``.
    """
    optimizer_params = parameters.get("optimizer_params", {}) or {}
    sch_params = parameters.get("scheduler_params", {}) or {}

    schedule = onecycle_schedule(
        max_lr=float(sch_params.get("max_lr", 5e-4)),
        epochs=int(sch_params.get("epochs", 200)),
        steps_per_epoch=int(sch_params.get("steps_per_epoch", 1000)),
        pct_start=float(sch_params.get("pct_start", 0.0)),
        final_div_factor=float(sch_params.get("final_div_factor", 5.0)),
    )
    tx = optax.adamw(
        learning_rate=schedule,
        b1=0.9,
        b2=0.98,
        eps=1e-9,
        weight_decay=float(optimizer_params.get("weight_decay", 5e-4)),
    )
    return tx, schedule


class MultiOptimizer:
    """Dict-of-optimizers wrapper (reference optimizers.py:11-47).

    Holds independent (transform, schedule, state) per key; ``step`` applies
    one or all.  Provided for API parity with the reference's multi-model
    training hook.
    """

    def __init__(self, optimizers: Optional[Dict] = None, schedulers: Optional[Dict] = None):
        self.optimizers = optimizers or {}
        self.schedulers = schedulers or {}
        self.keys = list(self.optimizers.keys())
        self.states: Dict[str, optax.OptState] = {}

    def init(self, params_dict: Dict) -> None:
        for key in self.keys:
            self.states[key] = self.optimizers[key].init(params_dict[key])

    def state_dict(self):
        return [(key, self.states.get(key)) for key in self.keys]

    def load_state_dict(self, state_dict) -> None:
        for key, val in state_dict:
            if key in self.optimizers:
                self.states[key] = val
            else:
                print(f"Unloaded {key}")

    def step(self, grads_dict: Dict, params_dict: Dict, key: Optional[str] = None):
        keys = [key] if key is not None else self.keys
        new_params = dict(params_dict)
        for k in keys:
            updates, self.states[k] = self.optimizers[k].update(
                grads_dict[k], self.states[k], params_dict[k]
            )
            new_params[k] = optax.apply_updates(params_dict[k], updates)
        return new_params


def build_multi_optimizer(parameters_dict: Dict, scheduler_params: Dict) -> MultiOptimizer:
    """Reference optimizers.py:78-86."""
    optimizers = {}
    schedulers = {}
    for key in parameters_dict:
        schedule = onecycle_schedule(
            max_lr=float(scheduler_params.get("max_lr", 5e-4)),
            epochs=int(scheduler_params.get("epochs", 200)),
            steps_per_epoch=int(scheduler_params.get("steps_per_epoch", 1000)),
            pct_start=float(scheduler_params.get("pct_start", 0.0)),
        )
        optimizers[key] = optax.adamw(
            learning_rate=schedule, b1=0.9, b2=0.98, eps=1e-9, weight_decay=1e-6
        )
        schedulers[key] = schedule
    multi = MultiOptimizer(optimizers, schedulers)
    return multi
