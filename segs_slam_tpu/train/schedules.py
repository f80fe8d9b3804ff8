"""Learning-rate schedules.

expon_lr is the log-linear interpolation with optional sin-delay warmup used
for every scheduled group (reference: GaussianModel::getExponLrFunc,
src/gaussian_model.cpp:1393-1409). Works on traced step values so the whole
schedule evaluates inside the jitted train step.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ExponLR:
    lr_init: float
    lr_final: float
    lr_delay_steps: int = 0
    lr_delay_mult: float = 1.0
    max_steps: int = 30_000

    def __call__(self, step):
        if self.lr_init == 0.0 and self.lr_final == 0.0:
            return jnp.zeros_like(jnp.asarray(step, jnp.float32))
        step = jnp.asarray(step, jnp.float32)
        if self.lr_delay_steps > 0:
            delay_rate = self.lr_delay_mult + (1.0 - self.lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / self.lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / self.max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            jnp.log(self.lr_init) * (1.0 - t) + jnp.log(self.lr_final) * t
        )
        lr = delay_rate * log_lerp
        return jnp.where(step < 0, 0.0, lr)


@dataclasses.dataclass(frozen=True)
class ConstantLR:
    lr: float

    def __call__(self, step):
        return jnp.full((), self.lr, jnp.float32)
