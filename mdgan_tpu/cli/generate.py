"""Sample-generation CLI — the reference's ``src/gen_images.ipynb`` as a command.

Loads a saved generator (weights-only npz from training, or a full
checkpoint), samples latents, and writes image grids; with ``--filmstrip`` it
renders one sample per checkpointed epoch into a training-progress strip
(notebook cells 3-6).

Usage:
    python -m mdgan_tpu.cli.generate --dataset CIFAR10 \
        --weights weights/generator_final.npz --num 100 --out grid.png
    python -m mdgan_tpu.cli.generate --dataset CIFAR10 \
        --weights_glob 'weights/generator_*.npz' --filmstrip progress.png
    python -m mdgan_tpu.cli.generate --dataset CIFAR10 \
        --checkpoint checkpoints/mdgan.8.CIFAR10 --num 64 --out grid.png
"""

from __future__ import annotations

import argparse
import glob
import re
from pathlib import Path

import jax
import numpy as np

from mdgan_tpu.core.registry import get as get_spec
from mdgan_tpu.engine import state as state_lib
from mdgan_tpu.obs import images as images_lib
from mdgan_tpu.ops import losses
from mdgan_tpu.utils import checkpoint as ckpt_lib


def _sample(spec, params, stats, num: int, seed: int) -> np.ndarray:
    model = spec.make_generator()
    z = jax.random.normal(jax.random.key(seed), (num, spec.z_dim))
    out, _ = state_lib.apply_train(model, params, stats, z)
    return np.asarray(losses.denormalize_to_unit(out))


def _load_from_checkpoint(directory: str, step: int | None):
    """Generator params/stats out of a full training checkpoint.

    Restores the raw name-keyed state dict (no template needed — flax
    ``model.apply`` consumes plain nested dicts) and picks the generator
    subtree; works for both trainer modes since each stores ``state.g``
    (``utils/checkpoint.CheckpointManager.save`` layout).
    """
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(Path(directory).absolute())
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint steps under {directory}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore(None))
    g = restored["state"]["g"]
    print(f"loaded generator from step {step} of {directory}")
    return g["params"], g["stats"]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", type=str, default="CIFAR10")
    p.add_argument("--weights", type=str, default=None,
                   help="single generator npz (save_weights_only format)")
    p.add_argument("--weights_glob", type=str, default=None,
                   help="glob over generator_<epoch>.npz for --filmstrip")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="full orbax checkpoint directory from training "
                        "(e.g. checkpoints/mdgan.8.CIFAR10); samples from "
                        "the generator inside the latest (or --step) save")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step to load (default: latest)")
    p.add_argument("--num", type=int, default=100)
    p.add_argument("--nrow", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="generated_grid.png")
    p.add_argument("--filmstrip", type=str, default=None,
                   help="output path for the per-epoch progress strip")
    args = p.parse_args(argv)

    spec = get_spec(args.dataset)

    if args.filmstrip:
        paths = sorted(
            glob.glob(args.weights_glob or "weights/generator_*.npz"),
            key=lambda s: int(re.findall(r"(\d+)", Path(s).stem)[-1])
            if re.findall(r"(\d+)", Path(s).stem) else -1,
        )
        if not paths:
            raise FileNotFoundError(f"no weights matched {args.weights_glob}")
        frames = []
        for path in paths:
            params, stats = ckpt_lib.load_weights_only(path)
            frames.append(_sample(spec, params, stats, 1, args.seed)[0])
        images_lib.save_image_grid(np.stack(frames), args.filmstrip,
                                   nrow=len(frames))
        print(f"wrote {args.filmstrip} ({len(frames)} frames)")
        return 0

    if args.checkpoint:
        params, stats = _load_from_checkpoint(args.checkpoint, args.step)
    elif args.weights:
        params, stats = ckpt_lib.load_weights_only(args.weights)
    else:
        raise SystemExit(
            "--weights or --checkpoint is required (or use --filmstrip)")
    imgs = _sample(spec, params, stats, args.num, args.seed)
    images_lib.save_image_grid(imgs, args.out, nrow=args.nrow)
    print(f"wrote {args.out} ({args.num} samples)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
