"""Optimizer registry over optax (reference: look2hear/system/optimizers.py).

The reference strings together torch.optim plus 15 torch_optimizer extras
(optimizers.py:8-26).  The optax equivalents cover every name used by the
shipped configs (adam) and the commonly reached extras; unknown names raise
with the known list.

All optimizers are wrapped in ``optax.inject_hyperparams`` so the learning
rate is a mutable leaf in the optimizer state — that is what lets a
host-side ReduceLROnPlateau adjust LR without re-jitting the train step.
"""

from __future__ import annotations

import optax


def _base(name: str, lr, weight_decay: float = 0.0, **kw):
    name = name.lower()
    wd = weight_decay or 0.0
    if name == "adam":
        if wd:
            return optax.adamw(lr, weight_decay=wd, **kw)
        return optax.adam(lr, **kw)
    if name == "adamw":
        return optax.adamw(lr, weight_decay=wd, **kw)
    if name == "sgd":
        opt = optax.sgd(lr, **kw)
    elif name == "rmsprop":
        opt = optax.rmsprop(lr, **kw)
    elif name == "adagrad":
        opt = optax.adagrad(lr, **kw)
    elif name == "adamax":
        opt = optax.adamax(lr, **kw)
    elif name == "lamb":
        return optax.lamb(lr, weight_decay=wd, **kw)
    elif name == "radam":
        opt = optax.radam(lr, **kw)
    elif name == "adabelief":
        opt = optax.adabelief(lr, **kw)
    elif name == "novograd":
        opt = optax.novograd(lr, weight_decay=wd, **kw)
        return opt
    elif name == "yogi":
        opt = optax.yogi(lr, **kw)
    elif name == "lars":
        return optax.lars(lr, weight_decay=wd, **kw)
    elif name == "sm3":
        opt = optax.sm3(lr, **kw)
    elif name == "adafactor":
        opt = optax.adafactor(lr, **kw)
    elif name == "ranger":
        # RAdam + Lookahead, the torch_optimizer Ranger recipe
        opt = optax.lookahead(optax.radam(lr, **kw), sync_period=6, slow_step_size=0.5)
    else:
        raise ValueError(
            f"Unknown optimizer {name!r}; known: adam, adamw, sgd, rmsprop, "
            "adagrad, adamax, lamb, radam, adabelief, novograd, yogi, lars, "
            "sm3, adafactor, ranger"
        )
    if wd:
        opt = optax.chain(optax.add_decayed_weights(wd), opt)
    return opt


def make_optimizer(
    optim_name: str = "adam",
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    grad_clip: float | None = None,
    **kw,
) -> optax.GradientTransformation:
    """Build the full update chain: [clip] → injected(base optimizer)."""
    _base(optim_name, lr, weight_decay, **kw)  # eager name/kwargs validation

    @optax.inject_hyperparams
    def injected(learning_rate):
        return _base(optim_name, learning_rate, weight_decay, **kw)

    tx = injected(learning_rate=lr)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def get_learning_rate(opt_state) -> float:
    """Read the injected LR back out of the optimizer state."""
    for s in jax.tree_util.tree_leaves_with_path(opt_state):
        pass
    return float(_find_hyperparams(opt_state)["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    """Return a new opt_state with the injected LR replaced."""
    import jax.numpy as jnp

    hp = _find_hyperparams(opt_state)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def _find_hyperparams(opt_state):
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    if isinstance(opt_state, (tuple, list)):
        for s in opt_state:
            try:
                return _find_hyperparams(s)
            except ValueError:
                continue
    raise ValueError("no injected hyperparams found in optimizer state")


import jax  # noqa: E402  (used by get_learning_rate)
