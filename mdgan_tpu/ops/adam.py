"""Fused Adam update as a Pallas TPU kernel.

The MD-GAN step at the reference batch size (b=10) is HBM-bandwidth bound on
the optimizer: Adam state traffic (params + both moments, read and write, plus
gradient reads) is ~250 MB/round for the CIFAR-10 8-worker config — more than
half the step time.  The optax path materializes an intermediate ``updates``
tree between ``tx.update`` and ``apply_updates``; this kernel performs the
whole torch-semantics Adam step (reference ``torch.optim.Adam`` used at
``server.py:111-113`` / ``worker.py:97-99``) in ONE streaming pass per leaf:

    mu'  = b1*mu + (1-b1)*g
    nu'  = b2*nu + (1-b2)*g^2
    p'   = p - lr * (mu'/(1-b1^t)) / (sqrt(nu'/(1-b2^t)) + eps)

with params/moments aliased in-place (no extra allocation, minimal traffic).

Leaves whose flattened size is not lane-aligned (or tiny) fall back to the
identical jnp expression — with float32 moments the kernel is bit-compatible
with optax.adam (verified in tests/test_ops.py), so the two paths mix freely
within a tree.  Under ``--moment_dtype bfloat16`` the two optimizer paths are
close but NOT bit-identical (optax rounds ``b2*nu`` in bf16; this module
upcasts the stored moment to f32 before the product — tests/test_ops.py pins
rtol 2e-2 agreement), so a seeded bf16-moment trajectory reproduces only
under the same optimizer selection (the opt-in FusedAdam vs the default
optax); the Pallas kernel itself is additionally gated to f32 moments
(``update_in_place``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128
# per-grid-step chunk of a (rows, last_dim) leaf view: cap VMEM per ref ~0.5 MB
CHUNK_ELEMS = 128 * 1024


def _adam_kernel(b1: float, b2: float, eps: float,
                 scal_ref, g_ref, p_ref, mu_ref, nu_ref,
                 p_out, mu_out, nu_out):
    lr_c1 = scal_ref[0, 0]      # lr / (1 - b1^t)
    inv_c2 = scal_ref[0, 1]     # 1 / (1 - b2^t)
    g = g_ref[...]
    mu = b1 * mu_ref[...] + (1.0 - b1) * g
    nu = b2 * nu_ref[...] + (1.0 - b2) * g * g
    denom = jnp.sqrt(nu * inv_c2) + eps
    p_out[...] = p_ref[...] - lr_c1 * mu / denom
    mu_out[...] = mu
    nu_out[...] = nu


@functools.partial(jax.jit, static_argnames=("b1", "b2", "eps", "rows"))
def _leaf_update_pallas(g, p, mu, nu, scalars, *, b1, b2, eps, rows):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    last = p.shape[-1]
    block_rows = max(8, min(rows, max(1, CHUNK_ELEMS // last)))
    grid = (pl.cdiv(rows, block_rows),)  # ragged tail blocks are masked
    block = (block_rows, last)

    def idx(i):
        return (i, 0)

    vec_spec = pl.BlockSpec(block, idx, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_adam_kernel, b1, b2, eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars, whole (1,2)
            vec_spec, vec_spec, vec_spec, vec_spec,
        ],
        out_specs=(vec_spec, vec_spec, vec_spec),
        out_shape=(
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct(mu.shape, mu.dtype),
            jax.ShapeDtypeStruct(nu.shape, nu.dtype),
        ),
        input_output_aliases={2: 0, 3: 1, 4: 2},  # p, mu, nu updated in place
        interpret=jax.default_backend() == "cpu",
    )(scalars, g, p, mu, nu)
    return out


def _leaf_update_jnp(g, p, mu, nu, scalars, b1, b2, eps):
    lr_c1 = scalars[0, 0]
    inv_c2 = scalars[0, 1]
    mu2 = b1 * mu + (1.0 - b1) * g
    nu2 = b2 * nu + (1.0 - b2) * g * g
    p2 = p - lr_c1 * mu2 / (jnp.sqrt(nu2 * inv_c2) + eps)
    return p2, mu2, nu2


class FusedAdam(NamedTuple):
    """Drop-in for the engine's optimizer step: state layout == optax.adam."""

    lr: float
    b1: float
    b2: float
    eps: float
    use_pallas: bool = True

    def update_in_place(self, grads, opt_state, params):
        """(new_params, new_opt_state) with optax.adam state structure
        ((ScaleByAdamState(count, mu, nu), EmptyState))."""
        import optax

        inner = opt_state[0]
        count = optax.safe_increment(inner.count)
        t = count.astype(jnp.float32)
        c1 = 1.0 - jnp.power(jnp.float32(self.b1), t)
        c2 = 1.0 - jnp.power(jnp.float32(self.b2), t)
        scalars = jnp.stack([self.lr / c1, 1.0 / c2]).reshape(1, 2)

        flat_g, treedef = jax.tree.flatten(grads)
        flat_p = jax.tree.leaves(params)
        flat_mu = jax.tree.leaves(inner.mu)
        flat_nu = jax.tree.leaves(inner.nu)
        new_p, new_mu, new_nu = [], [], []
        for g, p, mu, nu in zip(flat_g, flat_p, flat_mu, flat_nu):
            n = p.size
            # Collapse leading dims, keep the native minor dim: this reshape is
            # layout-preserving on TPU (tiling covers the minor-most dims), so
            # no relayout copies are paid entering/leaving the kernel.
            last = p.shape[-1] if p.ndim >= 1 else 1
            rows = n // last if last else 0
            if (self.use_pallas and p.ndim >= 2 and last % LANE == 0
                    and rows >= 8 and p.dtype == jnp.float32
                    and mu.dtype == jnp.float32
                    and nu.dtype == jnp.float32):
                shape2 = (rows, last)
                p2, mu2, nu2 = _leaf_update_pallas(
                    g.astype(p.dtype).reshape(shape2), p.reshape(shape2),
                    mu.reshape(shape2), nu.reshape(shape2), scalars,
                    b1=self.b1, b2=self.b2, eps=self.eps, rows=rows)
                new_p.append(p2.reshape(p.shape))
                new_mu.append(mu2.reshape(p.shape))
                new_nu.append(nu2.reshape(p.shape))
            else:
                p2, mu2, nu2 = _leaf_update_jnp(
                    g.astype(p.dtype), p, mu.astype(p.dtype),
                    nu.astype(p.dtype), scalars,
                    self.b1, self.b2, self.eps)
                new_p.append(p2)
                # honor mu_dtype / nu_dtype (optax storage-cast parity)
                new_mu.append(mu2.astype(mu.dtype))
                new_nu.append(nu2.astype(nu.dtype))

        import optax

        new_inner = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree.unflatten(treedef, new_mu),
            nu=jax.tree.unflatten(treedef, new_nu),
        )
        return (jax.tree.unflatten(treedef, new_p),
                (new_inner,) + tuple(opt_state[1:]))
