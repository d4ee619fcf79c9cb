"""Training-state pytrees and model apply helpers.

The reference keeps the generator in the server process and one discriminator
per worker process (reference ``src/bootstrap.py:70-124``).  Here all state
lives in one pytree: the generator replicated, the N discriminators *stacked*
along a leading ``workers`` axis (params, BatchNorm stats, and Adam state all
carry the axis) that the mesh shards.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax import linen as nn

from mdgan_tpu.core import prng


@struct.dataclass
class NetState:
    """One network: parameters, BatchNorm batch-stats collection (possibly
    empty), and optimizer state."""

    params: Any
    stats: Any
    opt: Any


@struct.dataclass
class MDGANState:
    g: NetState          # generator, replicated
    d: NetState          # discriminators, leaves stacked (N, ...)
    key: jax.Array       # root PRNG key for the run
    step: jax.Array      # int32 global round counter


@struct.dataclass
class StandaloneState:
    g: NetState
    d: NetState
    key: jax.Array
    step: jax.Array


def apply_train(model: nn.Module, params, stats, x, rng: Optional[jax.Array] = None):
    """Train-mode apply: batch-stat BN, live dropout.  Returns (out, new_stats).

    Works uniformly for models with or without BN/dropout collections.
    """
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    rngs = {"dropout": rng} if rng is not None else None
    out, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"], rngs=rngs)
    return out, mutated.get("batch_stats", stats)


def apply_train_pair(model: nn.Module, params, stats, x_pair, rng_pair):
    """Two train-mode applies (e.g. real batch then fake batch) fused into one
    batched pass.

    The reference discriminator step runs two forwards —
    ``D(real)`` then ``D(X_d)`` (reference ``worker.py:197-203``) — each
    normalizing with its OWN BatchNorm batch statistics.  Running both through
    one conv pass with a doubled batch would mix the statistics; vmapping over
    the pair axis with shared params keeps per-half statistics exact while
    letting XLA batch the convolutions (2x fewer kernel invocations).

    Running-average stats are combined with the closed-form chained update so
    the result is identical to sequential application (momentum m:
    ``s2 = m*s1' + sf' - m*s0`` where s1'/sf' are the vmapped one-step
    updates from s0).

    x_pair: (2, b, ...); rng_pair: (2,) keys. Returns ((2, b) outputs, stats).
    """
    out2, stats2 = jax.vmap(
        lambda x, r: apply_train(model, params, stats, x, r)
    )(x_pair, rng_pair)
    if stats:
        # The chained formula depends on the model's BatchNorm momentum.
        # Built-ins all use layers.BN_MOMENTUM; a custom registry model with a
        # different momentum MUST declare it via a ``bn_momentum`` attribute
        # (uniform across its BN layers) or its running stats would silently
        # be wrong here (verify_pair_momentum guards this at engine init).
        m = declared_momentum(model)
        new_stats = jax.tree.map(
            lambda s0, s12: m * s12[0] + s12[1] - m * s0, stats, stats2
        )
    else:
        new_stats = stats
    return out2, new_stats


def declared_momentum(model: nn.Module) -> float:
    """The BatchNorm momentum :func:`apply_train_pair` fuses with: the
    model's ``bn_momentum`` declaration, else the built-ins' default.  The
    single source of truth for both the fused update and its init-time guard
    (:func:`verify_pair_momentum`)."""
    from mdgan_tpu.models.layers import BN_MOMENTUM

    m = getattr(model, "bn_momentum", None)
    return BN_MOMENTUM if m is None else m


# (model class, declared momentum, instance hash) triples already verified in
# this process — engines re-init freely without re-paying the eval_shape
# trace.  The hash of a flax module (a frozen dataclass) covers its field
# values, so two instances of one class with different (even undeclared)
# momenta key differently — WITHOUT the cache holding a strong reference that
# would pin every verified module (and its pytree fields) for the process
# lifetime.  Unhashable instances simply re-verify each time.
_PAIR_MOMENTUM_VERIFIED: set = set()


def verify_pair_momentum(model: nn.Module, params, stats, sample_input,
                         key: jax.Array) -> None:
    """One-time runtime guard for :func:`apply_train_pair`'s chained-BN update.

    The closed-form ``s2 = m*s1' + sf' - m*s0`` is exact only when ``m`` is
    the model's TRUE BatchNorm momentum (declared via a ``bn_momentum``
    attribute, else ``layers.BN_MOMENTUM``).  A custom registry model with a
    different, undeclared momentum would silently accumulate wrong running
    stats — so engines call this once at init.

    Method: abstract trace.  ``jax.eval_shape`` runs the model's ``apply``
    with abstract values — no device compute, no backend init, sub-ms — while
    a flax method interceptor reads ``momentum`` off every live
    ``nn.BatchNorm`` submodule (including ones built inside ``nn.compact``).
    Any recorded momentum != the declared one raises.  Numeric approaches
    (fused-vs-sequential, EMA estimation) were tried and rejected: eager
    forwards on a remote/tunneled TPU take minutes, and cross-backend
    CPU-jit-inside-a-TPU-process proved deadlock-prone on tunneled runtimes.
    Verified model classes are cached per process.
    """
    if not stats:
        return
    try:
        cache_key = (type(model), declared_momentum(model), hash(model))
    except TypeError:  # unhashable field somewhere: just re-verify each time
        cache_key = None
    if cache_key is not None and cache_key in _PAIR_MOMENTUM_VERIFIED:
        return

    momenta: list = []

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if isinstance(mod, nn.BatchNorm):
            momenta.append(float(mod.momentum))
        return next_fun(*args, **kwargs)

    x = jax.ShapeDtypeStruct(jnp.shape(sample_input), jnp.float32)
    with nn.intercept_methods(interceptor):
        jax.eval_shape(
            lambda p, s, xx, kk: apply_train(model, p, s, xx, kk),
            params, stats, x, key)

    m = declared_momentum(model)
    bad = sorted({mm for mm in momenta if abs(mm - m) > 1e-6})
    if bad:
        raise ValueError(
            f"{type(model).__name__}: BatchNorm momentum {bad} != declared "
            f"{m:.4f} — apply_train_pair's chained running-stats update would "
            "be silently wrong. Set a ``bn_momentum`` class attribute "
            "matching the momentum used in its BatchNorm layers (see "
            "engine.state.apply_train_pair)."
        )
    if cache_key is not None:
        _PAIR_MOMENTUM_VERIFIED.add(cache_key)


def apply_eval(model: nn.Module, params, stats, x):
    """Eval-mode apply: running-average BN, no dropout."""
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return model.apply(variables, x, train=False)


def init_net(model: nn.Module, key: jax.Array, sample_input: jax.Array,
             tx: optax.GradientTransformation) -> NetState:
    kp, kd = jax.random.split(key)
    variables = model.init({"params": kp, "dropout": kd}, sample_input, train=True)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return NetState(params=params, stats=stats, opt=tx.init(params))


def init_stacked_net(model: nn.Module, key: jax.Array, sample_input: jax.Array,
                     tx: optax.GradientTransformation, n: int) -> NetState:
    """N independently-initialized replicas stacked on a leading axis.

    Matches the reference where each worker initializes its own discriminator
    with its own ``seed + rank`` stream (reference ``bootstrap.py:75-76,
    138-145``).

    Adam state is created by ``tx.init`` on the stacked params, so moment
    leaves are stacked too while the shared step counter stays scalar —
    valid because Adam is elementwise.
    """
    keys = jax.vmap(lambda w: prng.for_worker(key, w))(jnp.arange(n))

    def one(k):
        kp, kd = jax.random.split(k)
        variables = model.init({"params": kp, "dropout": kd}, sample_input, train=True)
        return variables["params"], variables.get("batch_stats", {})

    params, stats = jax.vmap(one)(keys)
    return NetState(params=params, stats=stats, opt=tx.init(params))


def _cast_nu(inner: optax.GradientTransformation, nu_dtype) -> optax.GradientTransformation:
    """Store the second Adam moment in ``nu_dtype`` (optax only exposes
    ``mu_dtype``).  The cast happens on the way INTO storage: ``inner.update``
    still computes the fresh nu, the bias correction, and the update in
    float32 (the stored low-precision value promotes against the float32
    g**2 term), so only the carried history rounds.  State structure is
    unchanged (``ScaleByAdamState``) — checkpoints, sharding specs, and the
    shard_map twin all treat it as the same pytree."""

    def init(params):
        st = inner.init(params)
        return st._replace(nu=jax.tree.map(lambda x: x.astype(nu_dtype), st.nu))

    def update(updates, state, params=None):
        updates, st = inner.update(updates, state, params)
        return updates, st._replace(
            nu=jax.tree.map(lambda x: x.astype(nu_dtype), st.nu))

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Adam matching torch.optim.Adam semantics (reference ``server.py:111-113``,
    ``worker.py:97-99``).  ``mu_dtype``/``nu_dtype`` = "bfloat16" store that
    moment in bf16 (REPORT.md §2 traffic floor); float32 is the parity
    default and keeps this literally ``optax.adam``."""
    mu_dtype = jnp.bfloat16 if getattr(cfg, "mu_dtype", "float32") == "bfloat16" else None
    if getattr(cfg, "nu_dtype", "float32") != "bfloat16":
        return optax.adam(cfg.lr, b1=cfg.beta_1, b2=cfg.beta_2, eps=cfg.eps,
                          mu_dtype=mu_dtype)
    inner = _cast_nu(
        optax.scale_by_adam(b1=cfg.beta_1, b2=cfg.beta_2, eps=cfg.eps,
                            mu_dtype=mu_dtype),
        jnp.bfloat16)
    # optax.adam == chain(scale_by_adam, scale(-lr)); same state structure.
    return optax.chain(inner, optax.scale(-cfg.lr))


def make_fused_adam(cfg):
    """Pallas fused-Adam twin of :func:`make_optimizer` (ops/adam.py)."""
    from mdgan_tpu.ops.adam import FusedAdam

    return FusedAdam(lr=cfg.lr, b1=cfg.beta_1, b2=cfg.beta_2, eps=cfg.eps)


def optimizer_step(tx, fused, grads, opt, params):
    """One Adam step via the Pallas fused kernel (fused is not None) or optax."""
    if fused is not None:
        return fused.update_in_place(grads, opt, params)
    updates, opt = tx.update(grads, opt, params)
    return optax.apply_updates(params, updates), opt
