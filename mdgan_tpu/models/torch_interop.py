"""Reference-checkpoint interop: torch ``state_dict`` <-> flax trees.

The reference saves trained weights as plain ``torch.save(model.state_dict())``
files — ``generator_<epoch>.pt`` / ``generator.pt`` from the server
(reference ``src/actors/server.py:367,374``), ``discriminator.pth`` from each
worker (``worker.py:292``), and ``netG/netD_epoch_<e>.pth`` from the
standalone baseline (``standalone_gan.py:277-278``) — and commits real runs'
files under ``src/results/weights/``.  This module converts those
checkpoints losslessly into this framework's flax param/batch-stat trees
(and back), so a reference user can bring trained models along.

Mapping ground truth: the layer tables are the reference model definitions
(``src/datasets/CIFAR10.py:76-140``, ``CelebA.py:75-140``,
``MNIST.py:74-120``), whose forward-pass equivalence to our flax modules is
numerically pinned in ``tests/test_torch_parity.py``; the kernel-layout
transforms below are the same ones those tests use, inverted:

  * ``nn.Conv2d``           (O, I, kh, kw)  <->  flax ``Conv``          (kh, kw, I, O)
  * ``nn.ConvTranspose2d``  (I, O, kh, kw)  <->  flax ``ConvTranspose`` (kh, kw, I, O)
    **spatially flipped** — ``lax.conv_transpose`` convolves the kernel
    unflipped where torch's gradient-of-conv definition flips it
  * ``nn.Linear``           (O, I)          <->  flax ``Dense``         (I, O)
  * ``nn.BatchNorm2d``  weight/bias/running_mean/running_var  <->
    params ``scale``/``bias`` + batch_stats ``mean``/``var``
    (``num_batches_tracked`` has no flax counterpart: dropped on import,
    emitted as 0 on export — it only feeds torch's ``momentum=None`` mode,
    which the reference never uses)

Value caveat (documented divergence, README "Algorithm semantics"): torch
tracks the *unbiased* batch variance in ``running_var``, flax the biased
one.  Conversion copies values verbatim — correct for inference either way,
and invisible to every reference-produced number (all its forwards run in
train-mode BN).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# (torch key prefix, layer kind, flax params path) per model, in the
# reference's own attribute/Sequential-index naming.
_Entry = Tuple[str, str, Tuple[str, ...]]

MAPS: Dict[Tuple[str, str], List[_Entry]] = {
    # reference src/datasets/CIFAR10.py:108-140 (self.main Sequential)
    ("CIFAR10", "generator"): [
        ("main.0", "convt", ("ConvTransposeBlock_0", "ConvTranspose_0")),
        ("main.1", "bn", ("ConvTransposeBlock_0", "BatchNorm_0")),
        ("main.3", "convt", ("ConvTransposeBlock_1", "ConvTranspose_0")),
        ("main.4", "bn", ("ConvTransposeBlock_1", "BatchNorm_0")),
        ("main.6", "convt", ("ConvTransposeBlock_2", "ConvTranspose_0")),
        ("main.7", "bn", ("ConvTransposeBlock_2", "BatchNorm_0")),
        ("main.9", "convt", ("ConvTranspose_0",)),
    ],
    # reference src/datasets/CIFAR10.py:76-106
    ("CIFAR10", "discriminator"): [
        ("main.0", "conv", ("ConvBlock_0", "Conv_0")),
        ("main.2", "conv", ("ConvBlock_1", "Conv_0")),
        ("main.3", "bn", ("ConvBlock_1", "BatchNorm_0")),
        ("main.5", "conv", ("ConvBlock_2", "Conv_0")),
        ("main.6", "bn", ("ConvBlock_2", "BatchNorm_0")),
        ("main.8", "conv", ("Conv_0",)),
    ],
    # reference src/datasets/CelebA.py:104-140 (named attributes)
    ("CelebA", "generator"): [
        ("tconv1", "convt", ("ConvTransposeBlock_0", "ConvTranspose_0")),
        ("bn1", "bn", ("ConvTransposeBlock_0", "BatchNorm_0")),
        ("tconv2", "convt", ("ConvTransposeBlock_1", "ConvTranspose_0")),
        ("bn2", "bn", ("ConvTransposeBlock_1", "BatchNorm_0")),
        ("tconv3", "convt", ("ConvTransposeBlock_2", "ConvTranspose_0")),
        ("bn3", "bn", ("ConvTransposeBlock_2", "BatchNorm_0")),
        ("tconv4", "convt", ("ConvTransposeBlock_3", "ConvTranspose_0")),
        ("bn4", "bn", ("ConvTransposeBlock_3", "BatchNorm_0")),
        ("tconv5", "convt", ("ConvTranspose_0",)),
    ],
    # reference src/datasets/CelebA.py:75-101 (cv2/cv3 carry biases — the
    # preserved reference quirk; see models/dcgan64.py)
    ("CelebA", "discriminator"): [
        ("cv1", "conv", ("ConvBlock_0", "Conv_0")),
        ("cv2", "conv", ("ConvBlock_1", "Conv_0")),
        ("bn2", "bn", ("ConvBlock_1", "BatchNorm_0")),
        ("cv3", "conv", ("ConvBlock_2", "Conv_0")),
        ("bn3", "bn", ("ConvBlock_2", "BatchNorm_0")),
        ("cv4", "conv", ("ConvBlock_3", "Conv_0")),
        ("bn4", "bn", ("ConvBlock_3", "BatchNorm_0")),
        ("cv5", "conv", ("Conv_0",)),
    ],
    # reference src/datasets/MNIST.py:99-120 / 74-96 (fc1..fc4 attributes)
    ("MNIST", "generator"): [
        (f"fc{i + 1}", "linear", (f"Dense_{i}",)) for i in range(4)
    ],
    ("MNIST", "discriminator"): [
        (f"fc{i + 1}", "linear", (f"Dense_{i}",)) for i in range(4)
    ],
}


def _nest(flat: Dict[Tuple[str, ...], np.ndarray]) -> Dict:
    from flax.traverse_util import unflatten_dict

    return unflatten_dict(flat)


def _get(tree: Dict, path: Tuple[str, ...], what: str) -> Dict:
    node = tree
    for i, p in enumerate(path):
        try:
            node = node[p]
        except (KeyError, TypeError):
            raise KeyError(
                f"{what} tree lacks {'/'.join(path)!r} (missing at "
                f"{'/'.join(path[: i + 1])!r}) — not a weights export of "
                f"this (dataset, role) model?") from None
    return node


def _map_for(dataset: str, role: str) -> List[_Entry]:
    try:
        return MAPS[(dataset, role)]
    except KeyError:
        supported = sorted({d for d, _ in MAPS})
        raise ValueError(
            f"no torch interop map for ({dataset!r}, {role!r}); the reference "
            f"ships torch models only for {supported} "
            f"(role 'generator' or 'discriminator')") from None


def torch_to_flax(state_dict: Dict, dataset: str, role: str
                  ) -> Tuple[Dict, Dict]:
    """Reference ``state_dict`` (tensors or ndarrays) -> (params, batch_stats).

    Strict: every torch key must be consumed (``num_batches_tracked`` aside)
    and every mapped weight must be present — a key mismatch means the file
    is not a checkpoint of the reference's ``(dataset, role)`` model.
    """
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "cpu") else v)
          for k, v in state_dict.items()}
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}

    def take(key: str) -> np.ndarray:
        try:
            return sd.pop(key)
        except KeyError:
            raise KeyError(
                f"state dict lacks {key!r} — not a reference "
                f"({dataset}, {role}) checkpoint?") from None

    for prefix, kind, path in _map_for(dataset, role):
        if kind == "conv":
            params[path + ("kernel",)] = take(f"{prefix}.weight").transpose(2, 3, 1, 0)
            if f"{prefix}.bias" in sd:
                params[path + ("bias",)] = take(f"{prefix}.bias")
        elif kind == "convt":
            k = take(f"{prefix}.weight").transpose(2, 3, 0, 1)  # -> (kh,kw,I,O)
            params[path + ("kernel",)] = np.ascontiguousarray(k[::-1, ::-1])
            if f"{prefix}.bias" in sd:
                params[path + ("bias",)] = take(f"{prefix}.bias")
        elif kind == "linear":
            params[path + ("kernel",)] = np.ascontiguousarray(
                take(f"{prefix}.weight").T)
            params[path + ("bias",)] = take(f"{prefix}.bias")
        else:  # bn
            params[path + ("scale",)] = take(f"{prefix}.weight")
            params[path + ("bias",)] = take(f"{prefix}.bias")
            stats[path + ("mean",)] = take(f"{prefix}.running_mean")
            stats[path + ("var",)] = take(f"{prefix}.running_var")
            sd.pop(f"{prefix}.num_batches_tracked", None)
    if sd:
        raise KeyError(f"unconsumed torch keys {sorted(sd)} — not a reference "
                       f"({dataset}, {role}) checkpoint?")
    return _nest(params), _nest(stats)


def flax_to_torch(params: Dict, stats: Dict, dataset: str, role: str) -> Dict:
    """(params, batch_stats) -> a state dict loadable with ``strict=True``
    into the reference's torch model (plain ndarrays; callers `torch.save`
    after wrapping in tensors — see ``cli/convert_weights.py``)."""
    out: Dict[str, np.ndarray] = {}
    for prefix, kind, path in _map_for(dataset, role):
        leaf = _get(params, path, f"({dataset}, {role}) params")
        if kind == "conv":
            out[f"{prefix}.weight"] = np.ascontiguousarray(
                np.asarray(leaf["kernel"]).transpose(3, 2, 0, 1))
            if "bias" in leaf:
                out[f"{prefix}.bias"] = np.asarray(leaf["bias"])
        elif kind == "convt":
            k = np.asarray(leaf["kernel"])[::-1, ::-1]  # unflip kh, kw
            out[f"{prefix}.weight"] = np.ascontiguousarray(k.transpose(2, 3, 0, 1))
            if "bias" in leaf:
                out[f"{prefix}.bias"] = np.asarray(leaf["bias"])
        elif kind == "linear":
            out[f"{prefix}.weight"] = np.ascontiguousarray(
                np.asarray(leaf["kernel"]).T)
            out[f"{prefix}.bias"] = np.asarray(leaf["bias"])
        else:  # bn
            out[f"{prefix}.weight"] = np.asarray(leaf["scale"])
            out[f"{prefix}.bias"] = np.asarray(leaf["bias"])
            s = _get(stats, path, f"({dataset}, {role}) batch_stats")
            out[f"{prefix}.running_mean"] = np.asarray(s["mean"])
            out[f"{prefix}.running_var"] = np.asarray(s["var"])
            out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)
    return out


def validate_against_model(params: Dict, stats: Dict, dataset: str,
                           role: str) -> None:
    """Assert a converted tree has exactly the structure (keys AND shapes)
    the named flax model initializes — catches truncated/mismatched files
    before they fail deep inside a jitted apply."""
    import flax
    import jax
    import jax.numpy as jnp

    from mdgan_tpu.core.registry import get as get_spec

    spec = get_spec(dataset)
    model = (spec.make_generator() if role == "generator"
             else spec.make_discriminator())
    x = (jnp.zeros((1, spec.z_dim), jnp.float32) if role == "generator"
         else jnp.zeros((1, *spec.shape), jnp.float32))
    ref = model.init({"params": jax.random.key(0),
                      "dropout": jax.random.key(1)}, x, train=True)

    def shapes(tree):
        return {k: np.shape(v) for k, v in
                flax.traverse_util.flatten_dict(tree, sep="/").items()}

    got = shapes({"params": params} | ({"batch_stats": stats} if stats else {}))
    want = shapes(ref)
    if got != want:
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        wrong = sorted(k for k in set(got) & set(want) if got[k] != want[k])
        raise ValueError(
            f"converted tree does not match {dataset} {role}: "
            f"missing={missing} extra={extra} shape-mismatch={wrong}")
