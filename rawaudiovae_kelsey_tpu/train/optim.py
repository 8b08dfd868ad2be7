"""Optimizer.

The reference used ``optim.Adam(model.parameters(), lr)`` with every default —
betas (0.9, 0.999), eps 1e-8, no schedule, no clipping, no weight decay
(train.py:163, train_iterable.py:180).  optax.adam with the same
hyperparameters is update-for-update equivalent (bias-corrected moments,
eps outside the sqrt)."""

from __future__ import annotations

import optax

from rawaudiovae_kelsey_tpu.config.schema import Config


def build_optimizer(cfg: Config) -> optax.GradientTransformation:
    return optax.adam(
        learning_rate=cfg.training.learning_rate,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
    )
