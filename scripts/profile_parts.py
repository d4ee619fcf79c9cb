"""Per-component round breakdown for the MD-GAN step (REPORT.md §2 table).

Times each phase of one round in isolation — generator forward, generator
VJP + Adam, the worker-local D region (local training + feedback), a
feedback-only pass, and the full fused round — on the real device, with
per-iteration varying inputs so XLA's loop-invariant code motion cannot hoist
the work out of the timing loop (see .claude/skills/verify/SKILL.md).

A zero-work jitted dispatch is timed as a baseline and subtracted, so the
numbers approximate pure device execution even on remote/tunneled runtimes
where per-call dispatch overhead is large.

Usage:  PYTHONPATH=. python scripts/profile_parts.py  [--workers 8]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, inputs, iters: int) -> float:
    """Mean seconds per call: dispatch `iters` chained calls with varying
    inputs, force completion via a device fetch of the last output."""
    out = None
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*inputs[i % len(inputs)])
    jax.tree.map(lambda a: np.asarray(a), jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--batch", type=int, default=10)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--json", dest="json_out", default=None,
                   help="also write the breakdown as a JSON artifact "
                        "(committed under artifacts/bench/ so the REPORT §2 "
                        "per-component table is auditable — VERDICT r4 #4)")
    args = p.parse_args()

    from mdgan_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from mdgan_tpu.core import prng
    from mdgan_tpu.core.config import TrainConfig
    from mdgan_tpu.core.registry import get as get_spec
    from mdgan_tpu.data.partitioner import shard_data
    from mdgan_tpu.data.sampler import ShardSampler
    from mdgan_tpu.engine import state as state_lib
    from mdgan_tpu.engine.mdgan import MDGANEngine

    n, b = args.workers, args.batch
    spec = get_spec("CIFAR10")
    # donate=False: the timing loop reuses the same state across calls
    cfg = TrainConfig(batch_size=b, chunk_size=1, compute_dtype="bfloat16",
                      donate=False)
    eng = MDGANEngine(spec, cfg, num_workers=n)
    st = eng.init_state(seed=1)
    data, _ = spec.load("data", max_examples=50000)
    shards_np, _ = shard_data(data, n, iid=True, seed=0)
    shards = eng.shard_data(shards_np)
    sampler = ShardSampler(n, shards_np.shape[1], b, seed=0)
    k = eng.k
    h, w, c = spec.shape
    zd = spec.z_dim
    keys = [jax.random.key(1000 + i) for i in range(16)]

    @jax.jit
    def noop(x):
        return x

    @jax.jit
    def g_fwd(params, stats, z):
        return state_lib.apply_train(eng.g_model, params, stats, z)

    @jax.jit
    def g_fwd_vjp_adam(params, stats, opt, z, cot):
        def fwd(p):
            return state_lib.apply_train(eng.g_model, p, stats, z)

        (out, new_stats), vjp = jax.vjp(fwd, params)
        grad = vjp((cot, jax.tree.map(jnp.zeros_like, new_stats)))[0]
        new_params, new_opt = state_lib.optimizer_step(
            eng.g_tx, eng.g_fused, grad, opt, params)
        return new_params, new_opt, new_stats

    @jax.jit
    def d_region(d_params, d_stats, d_opt, x_k, idx, kdrop):
        return eng._d_region(d_params, d_stats, d_opt, x_k, shards, idx,
                             kdrop, jnp.arange(n), eng._constrain)

    @jax.jit
    def feedback_only(d_params, d_stats, x_k, kdrop):
        w_ids = jnp.arange(n)

        def one(wid, params, stats):
            xg = x_k[wid % k]

            def loss(x):
                logits, _ = state_lib.apply_train(
                    eng.d_model, params, stats,
                    x.astype(getattr(jnp, cfg.compute_dtype)))
                from mdgan_tpu.ops import losses as losses_lib

                return losses_lib.bce_real(logits), None

            (lo, _), gr = jax.value_and_grad(loss, has_aux=True)(xg)
            return lo, gr

        return jax.vmap(one, in_axes=(0, 0, 0))(w_ids, d_params, d_stats)

    full = eng.chunk_fn(1)

    # varying per-iter inputs (LICM defeat)
    zs = [jax.random.normal(keys[i], (k * b, zd)) for i in range(8)]
    cots = [jax.random.normal(keys[i + 8], (k * b, h, w, c)) / (b * n)
            for i in range(8)]
    xks = [jax.random.normal(keys[i], (k, b, h, w, c)) for i in range(8)]
    idxs = [jnp.asarray(sampler.next_chunk(1)) for _ in range(8)]
    kdrops = [prng.for_step(st.key, prng.DROPOUT, jnp.int32(i))
              for i in range(8)]

    rows = []

    def bench(name, fn, inputs, warm=3):
        for i in range(warm):
            jax.tree.map(lambda a: np.asarray(a),
                         jax.tree.leaves(fn(*inputs[i % len(inputs)]))[0])
        rows.append((name, timed(fn, inputs, args.iters)))

    bench("dispatch baseline (noop)", noop, [(zs[i],) for i in range(8)])
    bench("G forward (k*b imgs)", g_fwd,
          [(st.g.params, st.g.stats, zs[i]) for i in range(8)])
    bench("G fwd+VJP+Adam", g_fwd_vjp_adam,
          [(st.g.params, st.g.stats, st.g.opt, zs[i], cots[i])
           for i in range(8)])
    bench(f"D region (train+feedback, {n} workers)", d_region,
          [(st.d.params, st.d.stats, st.d.opt, xks[i], idxs[i][0], kdrops[i])
           for i in range(8)])
    bench("feedback-only pass", feedback_only,
          [(st.d.params, st.d.stats, xks[i], kdrops[i]) for i in range(8)])
    bench("FULL round (chunk_fn(1))", full,
          [(st, shards, idxs[i]) for i in range(8)])

    base = rows[0][1]
    print(f"\n{'component':44s} {'us/call':>10s} {'minus dispatch':>14s}")
    for name, sec in rows:
        print(f"{name:44s} {sec * 1e6:10.1f} {(sec - base) * 1e6:14.1f}")
    print("\nderived:")
    by = {name: sec - base for name, sec in rows}
    gf = by["G forward (k*b imgs)"]
    print(f"  G VJP+Adam ~= {1e6 * (by['G fwd+VJP+Adam'] - gf):.1f} us")
    print(f"  D local train ~= "
          f"{1e6 * (by[f'D region (train+feedback, {n} workers)'] - by['feedback-only pass']):.1f} us")

    if args.json_out:
        import json

        payload = {
            "config": {"workers": n, "batch": b, "iters": args.iters,
                       "compute_dtype": cfg.compute_dtype},
            "device": str(jax.devices()[0]),
            "dispatch_baseline_us": round(base * 1e6, 2),
            # per-component device time, dispatch-subtracted (see timed())
            "components_us": {name: round(sec * 1e6, 2)
                              for name, sec in by.items()},
            "derived_us": {
                "g_vjp_adam": round(1e6 * (by["G fwd+VJP+Adam"] - gf), 2),
                "d_local_train": round(
                    1e6 * (by[f"D region (train+feedback, {n} workers)"]
                           - by["feedback-only pass"]), 2),
            },
        }
        from pathlib import Path

        Path(args.json_out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.json_out).write_text(json.dumps(payload, indent=1) + "\n")
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
