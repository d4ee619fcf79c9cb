"""Fused shard sampling: uint8 row gather + [-1, 1] normalize, in Pallas.

The step's input stage reads b rows per worker from the HBM-resident uint8
shard stack and normalizes them (the on-device replacement for the reference's
DataLoader + ``ToTensor + Normalize(0.5, 0.5)`` transform — reference
``src/datasets/CIFAR10.py:29-36``, ``worker.py:161-167``).  The XLA form is a
gather followed by a convert/scale; this kernel does it in one pass per
worker: batch indices arrive via scalar prefetch, each row is DMA'd
HBM -> VMEM, and the uint8 -> float conversion + affine normalize happens in
VMEM on the way out — the uint8 bytes cross HBM exactly once and the f32
image tensor is written exactly once.

Numerics are identical to ``losses.normalize_uint8`` (same affine form);
tests/test_ops.py checks bit-equality.  Used by the engine when
``use_pallas`` is on and the run is single-device (a pallas_call is not
auto-partitioned over a sharded mesh; the XLA gather handles that case).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sample_kernel(b: int, out_dtype,
                   idx_ref, data_ref, out_ref, scratch, sem):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    worker = pl.program_id(0)

    def start_dma(j):
        # rows are flat (h*w*c,) byte vectors — 128-aligned DMA slices
        return pltpu.make_async_copy(
            data_ref.at[worker, idx_ref[worker, j]],
            scratch.at[j],
            sem.at[j],
        )

    for j in range(b):
        start_dma(j).start()
    for j in range(b):
        start_dma(j).wait()
    # Mosaic lacks a direct uint8->f32 cast; hop through int32
    x = scratch[...].astype(jnp.int32).astype(jnp.float32)
    out_ref[0] = (x * (2.0 / 255.0) - 1.0).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def sample_normalize(data: jax.Array, idx: jax.Array, out_dtype=jnp.float32):
    """data: (N, S, h, w, c) uint8; idx: (N, b) int32 -> (N, b, h, w, c) float.

    Equivalent to ``normalize_uint8(vmap(lambda s, i: s[i])(data, idx))``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if data.ndim == 4:
        # pre-tiled (n, s, row//128, 128) — see pretile_shards
        n, s, r128, _ = data.shape
        row = r128 * 128
        h = w = c = None
        flat = data
    else:
        n, s, h, w, c = data.shape
        row = h * w * c
        if row % 128 != 0:
            raise ValueError(f"row bytes {row} must be 128-aligned for the DMA path")
        # Rows are viewed as (row//128, 128) tiles so the per-row DMA slices
        # only untiled leading dims (Mosaic requires tile-aligned slices on the
        # minor two dims).  NB: this reshape RELAYOUTS the whole dataset — do
        # it once via pretile_shards, never per step.
        flat = data.reshape(n, s, row // 128, 128)
    b = idx.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # idx
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # data stays in HBM
        out_specs=pl.BlockSpec((1, b, row // 128, 128),
                               lambda i, idx_ref: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((b, row // 128, 128), jnp.uint8),
            pltpu.SemaphoreType.DMA((b,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_sample_kernel, b, out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, b, row // 128, 128), out_dtype),
        interpret=jax.default_backend() == "cpu",
    )(idx, flat)
    return out.reshape(n, b, row)


def pretile_shards(shards, image_shape):
    """One-time relayout of (N, S, h, w, c) uint8 shards into the DMA-tile
    view (N, S, row//128, 128) consumed by :func:`sample_normalize`."""
    import jax.numpy as jnp

    n, s = shards.shape[:2]
    h, w, c = image_shape
    return jnp.asarray(shards).reshape(n, s, (h * w * c) // 128, 128)
