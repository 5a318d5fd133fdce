"""Train state: params + optimizer + optional EMA and VQ codebook state.

One pytree threads through the jitted steps; orbax checkpoints it whole
(replacing the reference's four separate torch files,
train_vqvae.py:303-320 / train_latent.py:282-294).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from codlad_tpu.models.vq import VQState


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    vq_state: VQState | None = None
    ema_params: Any | None = None
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt)


def create_train_state(params, tx, vq_state=None, with_ema=False):
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        vq_state=vq_state,
        ema_params=jax.tree.map(jnp.copy, params) if with_ema else None,
        tx=tx,
    )


def update_ema(ema_params, params, decay=0.9999):
    return jax.tree.map(lambda e, p: e * decay + p * (1 - decay), ema_params, params)


def set_learning_rate(opt_state, lr):
    """Update the learning rate inside an optax.inject_hyperparams state
    (no retracing/recompilation — the LR is an opt-state leaf).  Works on a
    chain whose LAST element is the injected transform."""
    import jax.numpy as jnp

    inner = opt_state[-1]
    hp = dict(inner.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state[:-1] + (inner._replace(hyperparams=hp),)


def warmup_linear_schedule(lr, warmup, schedule_steps=None, final_lr=None):
    """Reference Stage-2 LR: linear warmup then linear decay to final_lr
    (train_latent.py:97-113)."""
    if warmup == 0:
        return lr

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        if schedule_steps is None or final_lr is None:
            return lr * jnp.minimum(step, warmup) / warmup
        final_ratio = final_lr / lr
        warm = step / warmup
        decay_ratio = (step - warmup) / (schedule_steps - warmup)
        decay = (1 - decay_ratio) + decay_ratio * final_ratio
        scale = jnp.where(step < warmup, warm,
                          jnp.where(step < schedule_steps, decay, final_ratio))
        return lr * scale

    return fn


def exp_decay_schedule(lr, total_steps=600000, final_div=5.0):
    """Reference Stage-1 'scheduler_flag' LR: exponential decay to lr/5 over
    600k steps (train_vqvae.py:163-166)."""
    import numpy as np

    log_alpha = np.log(1.0 / final_div) / total_steps

    def fn(step):
        return lr * jnp.exp(log_alpha * (jnp.asarray(step, jnp.float32) + 1))

    return fn
