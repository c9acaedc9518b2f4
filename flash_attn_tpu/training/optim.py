"""Optimizer + schedule construction.

Counterpart of `training/src/optim/param_grouping.py` (weight-decay
exemption for norms/biases/embeddings) and the Hydra optimizer/scheduler
groups; ZeRO-1 optimizer-state sharding (`training/src/utils/ddp_zero1.py`)
is a PartitionSpec on the optimizer pytree here — XLA shards the states
over the data axis with no wrapper class.
"""

from __future__ import annotations

import jax
import optax


def decay_mask(params):
    """True where weight decay applies: 2D+ kernels only
    (`param_grouping.py` semantics: no decay on bias/norm/embeddings)."""

    def f(path, x):
        names = "/".join(getattr(k, "key", str(k)) for k in path)
        if x.ndim < 2:
            return False
        if "embedding" in names or "wte" in names or "wpe" in names:
            return False
        return True

    return jax.tree_util.tree_map_with_path(f, params)


def make_schedule(cfg):
    """LR-multiplier schedule zoo (counterpart of the reference's
    `training/configs/scheduler/` group: cosine-warmup / linear / constant
    / step / multistep / invsqrt / poly; plateau is handled statefully in
    `make_optimizer` via inject_hyperparams)."""
    import jax.numpy as jnp

    warmup = optax.linear_schedule(0.0, 1.0, cfg.warmup_steps)
    if cfg.name == "constant":
        return lambda step: 1.0
    if cfg.name == "linear":
        return warmup
    if cfg.name == "step":
        # decay by `gamma` every `step_size` steps (torch StepLR)
        gamma = getattr(cfg, "gamma", 0.1)
        size = max(getattr(cfg, "step_size", cfg.decay_steps // 3), 1)
        return lambda step: gamma ** (step // size)
    if cfg.name == "multistep":
        gamma = getattr(cfg, "gamma", 0.1)
        miles = tuple(getattr(cfg, "milestones", None)
                      or (cfg.decay_steps // 2, 3 * cfg.decay_steps // 4))

        def multistep(step):
            n = sum(jnp.asarray(step >= m, jnp.float32) for m in miles)
            return gamma ** n

        return multistep
    if cfg.name == "invsqrt":
        # inverse-sqrt after warmup (T5/fairseq style)
        w = max(cfg.warmup_steps, 1)

        def invsqrt(step):
            s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
            return jnp.where(s < w, s / w, (w / s) ** 0.5)

        return invsqrt
    if cfg.name == "poly":
        power = getattr(cfg, "power", 1.0)
        decay = optax.polynomial_schedule(
            1.0, cfg.min_lr_ratio, power,
            max(cfg.decay_steps - cfg.warmup_steps, 1))
        return optax.join_schedules([warmup, decay], [cfg.warmup_steps])
    if cfg.name in ("cosine", "plateau"):
        # plateau uses the cosine base shape of 1.0 (constant after
        # warmup); the stateful factor lives in hyperparams
        if cfg.name == "plateau":
            return lambda step: jnp.where(
                jnp.asarray(step) < cfg.warmup_steps,
                jnp.asarray(step, jnp.float32) / max(cfg.warmup_steps, 1),
                1.0,
            )
        decay = optax.cosine_decay_schedule(
            1.0, max(cfg.decay_steps - cfg.warmup_steps, 1),
            alpha=cfg.min_lr_ratio)
        return optax.join_schedules([warmup, decay], [cfg.warmup_steps])
    raise ValueError(f"unknown scheduler {cfg.name!r}")


def make_optimizer(opt_cfg, sched_cfg, params):
    sched = make_schedule(sched_cfg)
    mask = decay_mask(params)

    def build(lr_mult):
        return optax.chain(
            optax.clip_by_global_norm(opt_cfg.grad_clip)
            if opt_cfg.grad_clip > 0
            else optax.identity(),
            optax.scale_by_adam(
                b1=opt_cfg.beta1, b2=opt_cfg.beta2, eps=opt_cfg.eps
            ),
            optax.add_decayed_weights(opt_cfg.weight_decay, mask=mask)
            if opt_cfg.weight_decay > 0
            else optax.identity(),
            optax.scale_by_schedule(lambda s: -opt_cfg.lr * lr_mult * sched(s)),
        )

    if sched_cfg.name == "plateau":
        # ReduceLROnPlateau: the multiplier is optimizer state
        # (`opt_state.hyperparams["lr_mult"]`), shrunk by the Trainer when
        # eval loss stops improving (torch ReduceLROnPlateau role).
        return optax.inject_hyperparams(build)(lr_mult=1.0)
    return build(1.0)


def ema_update(ema_params, params, decay: float):
    """One EMA step (counterpart of `training/src/callbacks/ema.py`)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params,
    )
