"""Convert reference torch checkpoints to mdgan_tpu npz weights and back.

The reference's trained artifacts are plain ``torch.save(state_dict())``
files (``src/actors/server.py:367,374``, ``worker.py:292``,
``standalone_gan.py:277-278``); ours are flat npz trees
(``utils/checkpoint.py:save_weights_only``).  This CLI moves weights in
either direction — direction is inferred from the input extension:

    # import a reference checkpoint (torch -> npz); feed cli.generate with it
    python -m mdgan_tpu.cli.convert_weights --dataset CIFAR10 --role generator \\
        --input results/weights/CIFAR10.10/generator.pt --out generator.npz
    python -m mdgan_tpu.cli.generate --dataset CIFAR10 --weights generator.npz

    # export our weights for the reference's tooling (npz -> torch)
    python -m mdgan_tpu.cli.convert_weights --dataset CIFAR10 --role generator \\
        --input weights/generator_final.npz --out generator.pt

Converted trees are validated against the flax model's own init structure
(keys and shapes) unless ``--no_validate``; exported state dicts load with
``strict=True`` into the reference's models (pinned in
``tests/test_weight_interop.py``).  Note this is weights-only interop, like
the reference's files themselves: optimizer moments are not part of either
format, so training continued from an imported checkpoint starts with fresh
Adam state (the reference's own swap protocol makes the same choice —
``worker.py:239-284``).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

TORCH_EXTS = {".pt", ".pth"}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--dataset", required=True,
                   help="registry name: MNIST | CIFAR10 | CelebA")
    p.add_argument("--role", required=True,
                   choices=["generator", "discriminator"])
    p.add_argument("--input", required=True,
                   help="source checkpoint (.pt/.pth = torch, .npz = ours)")
    p.add_argument("--out", required=True,
                   help="destination (the opposite format)")
    p.add_argument("--no_validate", action="store_true",
                   help="skip structural validation against the flax model")
    args = p.parse_args(argv)

    from mdgan_tpu.models.torch_interop import (flax_to_torch, torch_to_flax,
                                                validate_against_model)
    from mdgan_tpu.utils.checkpoint import load_weights_only, save_weights_only

    src, dst = Path(args.input), Path(args.out)
    if src.suffix in TORCH_EXTS and dst.suffix == ".npz":
        import torch

        try:
            sd = torch.load(src, map_location="cpu", weights_only=True)
        except TypeError:  # torch < 2.0: no weights_only kwarg
            sd = torch.load(src, map_location="cpu")
        params, stats = torch_to_flax(sd, args.dataset, args.role)
        if not args.no_validate:
            validate_against_model(params, stats, args.dataset, args.role)
        save_weights_only(dst, params, stats or None)
        print(f"wrote {dst} ({len(sd)} torch keys -> npz)")
    elif src.suffix == ".npz" and dst.suffix in TORCH_EXTS:
        import torch

        params, stats = load_weights_only(src)
        if not args.no_validate:
            validate_against_model(params, stats, args.dataset, args.role)
        sd = flax_to_torch(params, stats, args.dataset, args.role)
        dst.parent.mkdir(parents=True, exist_ok=True)
        torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
                   dst)
        print(f"wrote {dst} ({len(sd)} torch keys)")
    else:
        p.error(f"cannot infer direction from {src.suffix!r} -> {dst.suffix!r}"
                f" (expected .pt/.pth <-> .npz)")


if __name__ == "__main__":
    main()
