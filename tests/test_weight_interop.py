"""Reference-checkpoint interop (models/torch_interop.py, cli/convert_weights).

Three layers of proof:
  * pure round-trips (flax -> torch layout -> flax) are bit-exact for every
    mapped (dataset, role) — no torch needed;
  * exported state dicts load with ``strict=True`` into literal rebuilds of
    the reference's torch models (``src/datasets/{CIFAR10,CelebA,MNIST}.py``)
    and the two frameworks' forwards then agree numerically — i.e. the key
    NAMES, layouts, and values are all right;
  * a real committed reference artifact
    (``src/results/weights/CIFAR10.10/worker_1/discriminator.pth``, a trained
    10-worker run's discriminator) imports cleanly and computes the same
    scores in both frameworks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdgan_tpu.models.torch_interop import (MAPS, flax_to_torch,
                                            torch_to_flax,
                                            validate_against_model)

CASES = sorted(MAPS)


def _init(dataset, role, seed=0):
    from mdgan_tpu.core.registry import get as get_spec

    spec = get_spec(dataset)
    model = (spec.make_generator() if role == "generator"
             else spec.make_discriminator())
    x = (jnp.zeros((2, spec.z_dim), jnp.float32) if role == "generator"
         else jnp.zeros((2, *spec.shape), jnp.float32))
    v = model.init({"params": jax.random.key(seed),
                    "dropout": jax.random.key(seed + 1)}, x, train=True)
    return spec, model, dict(v["params"]), dict(v.get("batch_stats", {}))


def _leaves(tree, prefix=()):
    for k, v in sorted(tree.items()):
        if isinstance(v, dict):
            yield from _leaves(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


@pytest.mark.parametrize("dataset,role", CASES)
def test_roundtrip_bit_exact(dataset, role):
    _, _, params, stats = _init(dataset, role)
    # randomize BN stats so the round-trip can't pass on init constants
    rng = np.random.default_rng(7)
    stats = jax.tree.map(lambda v: rng.normal(size=v.shape).astype(v.dtype),
                         stats)
    sd = flax_to_torch(params, stats, dataset, role)
    params2, stats2 = torch_to_flax(sd, dataset, role)
    validate_against_model(params2, stats2, dataset, role)
    for (k1, v1), (k2, v2) in zip(_leaves(params), _leaves(params2)):
        assert k1 == k2
        np.testing.assert_array_equal(v1, v2)
    for (k1, v1), (k2, v2) in zip(_leaves(stats), _leaves(stats2)):
        assert k1 == k2
        np.testing.assert_array_equal(v1, v2)


def test_unknown_dataset_and_bad_state_dict_error():
    with pytest.raises(ValueError, match="no torch interop map"):
        torch_to_flax({}, "FFHQ128", "generator")
    _, _, params, stats = _init("CIFAR10", "discriminator")
    sd = flax_to_torch(params, stats, "CIFAR10", "discriminator")
    sd.pop("main.3.running_mean")
    with pytest.raises(KeyError, match="main.3.running_mean"):
        torch_to_flax(sd, "CIFAR10", "discriminator")
    sd["main.3.running_mean"] = sd["main.3.running_var"]
    sd["main.99.weight"] = np.zeros(3, np.float32)
    with pytest.raises(KeyError, match="unconsumed"):
        torch_to_flax(sd, "CIFAR10", "discriminator")


def test_validate_catches_shape_mismatch():
    _, _, params, stats = _init("CIFAR10", "generator")
    params["ConvTranspose_0"]["kernel"] = params["ConvTranspose_0"]["kernel"][:2]
    with pytest.raises(ValueError, match="shape-mismatch"):
        validate_against_model(params, stats, "CIFAR10", "generator")


# ---------------------------------------------------------------- torch side

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def _tensors(sd):
    return {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}


class _RefCifarG(tnn.Module):
    """reference src/datasets/CIFAR10.py:108-140, verbatim architecture
    (``self.main`` Sequential => the committed files' ``main.N.*`` keys)."""

    def __init__(self):
        super().__init__()
        from mdgan_tpu.models.dcgan32 import NGF, Z_DIM

        self.main = tnn.Sequential(
            tnn.ConvTranspose2d(Z_DIM, NGF * 8, 4, 1, 0, bias=False),
            tnn.BatchNorm2d(NGF * 8), tnn.ReLU(),
            tnn.ConvTranspose2d(NGF * 8, NGF * 4, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(NGF * 4), tnn.ReLU(),
            tnn.ConvTranspose2d(NGF * 4, NGF * 2, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(NGF * 2), tnn.ReLU(),
            tnn.ConvTranspose2d(NGF * 2, 3, 4, 2, 1, bias=False), tnn.Tanh(),
        )

    def forward(self, z):
        return self.main(z)


class _RefCelebaD(tnn.Module):
    """reference src/datasets/CelebA.py:75-101 incl. the cv2/cv3 bias and
    default-slope-on-cv1 quirks."""

    def __init__(self):
        super().__init__()
        from mdgan_tpu.models.dcgan64 import NDF

        self.cv1 = tnn.Conv2d(3, NDF, 4, 2, 1, bias=False)
        self.cv2 = tnn.Conv2d(NDF, NDF * 2, 4, 2, 1)
        self.bn2 = tnn.BatchNorm2d(NDF * 2)
        self.cv3 = tnn.Conv2d(NDF * 2, NDF * 4, 4, 2, 1)
        self.bn3 = tnn.BatchNorm2d(NDF * 4)
        self.cv4 = tnn.Conv2d(NDF * 4, NDF * 8, 4, 2, 1, bias=False)
        self.bn4 = tnn.BatchNorm2d(NDF * 8)
        self.cv5 = tnn.Conv2d(NDF * 8, 1, 4, 1, 0, bias=False)

    def forward(self, x):
        h = F.leaky_relu(self.cv1(x))
        h = F.leaky_relu(self.bn2(self.cv2(h)), 0.2)
        h = F.leaky_relu(self.bn3(self.cv3(h)), 0.2)
        h = F.leaky_relu(self.bn4(self.cv4(h)), 0.2)
        return torch.sigmoid(self.cv5(h)).view(-1)


class _RefMnistD(tnn.Module):
    """reference src/datasets/MNIST.py:74-96 (fc1..fc4 attribute keys);
    dropout is inert in eval mode."""

    def __init__(self):
        super().__init__()
        self.fc1 = tnn.Linear(784, 1024)
        self.fc2 = tnn.Linear(1024, 512)
        self.fc3 = tnn.Linear(512, 256)
        self.fc4 = tnn.Linear(256, 1)

    def forward(self, x):
        x = x.view(x.shape[0], -1)
        x = F.leaky_relu(self.fc1(x), 0.2)
        x = F.leaky_relu(self.fc2(x), 0.2)
        x = F.leaky_relu(self.fc3(x), 0.2)
        return torch.sigmoid(self.fc4(x)).flatten()


class _RefCifarD(tnn.Module):
    """reference src/datasets/CIFAR10.py:76-106."""

    def __init__(self):
        super().__init__()
        from mdgan_tpu.models.dcgan32 import NDF

        self.main = tnn.Sequential(
            tnn.Conv2d(3, NDF, 4, 2, 1, bias=False), tnn.LeakyReLU(0.2),
            tnn.Conv2d(NDF, NDF * 2, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(NDF * 2), tnn.LeakyReLU(0.2),
            tnn.Conv2d(NDF * 2, NDF * 4, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(NDF * 4), tnn.LeakyReLU(0.2),
            tnn.Conv2d(NDF * 4, 1, 4, 1, 0, bias=False), tnn.Sigmoid(),
        )

    def forward(self, x):
        return self.main(x).view(-1)


@pytest.mark.slow
def test_export_loads_strict_and_matches_forward_cifar10_generator():
    _, model, params, stats = _init("CIFAR10", "generator", seed=3)
    tm = _RefCifarG()
    tm.load_state_dict(_tensors(
        flax_to_torch(params, stats, "CIFAR10", "generator")), strict=True)
    tm.train()
    z = np.random.default_rng(0).normal(size=(4, 100)).astype(np.float32)
    ours, _ = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(z), train=True, mutable=["batch_stats"])
    theirs = tm(torch.from_numpy(z.reshape(4, 100, 1, 1))
                ).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_export_loads_strict_and_matches_forward_celeba_discriminator():
    _, model, params, stats = _init("CelebA", "discriminator", seed=5)
    tm = _RefCelebaD()
    tm.load_state_dict(_tensors(
        flax_to_torch(params, stats, "CelebA", "discriminator")), strict=True)
    tm.train()
    x = np.random.default_rng(1).normal(size=(2, 64, 64, 3)).astype(np.float32)
    logits, _ = model.apply({"params": params, "batch_stats": stats},
                            jnp.asarray(x), train=True,
                            mutable=["batch_stats"])
    ours = np.asarray(jax.nn.sigmoid(logits))
    theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_export_loads_strict_and_matches_forward_mnist_discriminator():
    _, model, params, stats = _init("MNIST", "discriminator", seed=7)
    tm = _RefMnistD()
    tm.load_state_dict(_tensors(
        flax_to_torch(params, stats, "MNIST", "discriminator")), strict=True)
    tm.eval()
    x = np.random.default_rng(2).normal(size=(4, 28, 28, 1)).astype(np.float32)
    ours = np.asarray(jax.nn.sigmoid(
        model.apply({"params": params}, jnp.asarray(x), train=False)))
    theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_import_committed_reference_discriminator():
    """A REAL trained artifact from the reference repo's committed 10-worker
    CIFAR-10 run imports cleanly and scores images identically."""
    from pathlib import Path

    src = Path("/root/reference/src/results/weights/CIFAR10.10/worker_1/"
               "discriminator.pth")
    if not src.exists():
        pytest.skip("reference checkpoint not available")
    sd = torch.load(src, map_location="cpu", weights_only=True)
    params, stats = torch_to_flax(sd, "CIFAR10", "discriminator")
    validate_against_model(params, stats, "CIFAR10", "discriminator")

    tm = _RefCifarD()
    tm.load_state_dict({k: v for k, v in sd.items()}, strict=True)
    tm.train()
    from mdgan_tpu.core.registry import get as get_spec

    model = get_spec("CIFAR10").make_discriminator()
    x = np.random.default_rng(3).normal(size=(8, 32, 32, 3)).astype(np.float32)
    logits, _ = model.apply({"params": params, "batch_stats": stats},
                            jnp.asarray(x), train=True,
                            mutable=["batch_stats"])
    ours = np.asarray(jax.nn.sigmoid(logits))
    theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
    # trained (non-init) weights actually flowed through: scores separate
    assert ours.std() > 1e-3


@pytest.mark.slow
def test_cli_roundtrip_and_generate(tmp_path):
    """torch -> npz -> torch through the CLI is bit-exact, and the imported
    npz drives cli.generate."""
    from mdgan_tpu.cli.convert_weights import main as convert
    from mdgan_tpu.cli.generate import main as generate

    _, _, params, stats = _init("CIFAR10", "generator", seed=9)
    pt0 = tmp_path / "g.pt"
    torch.save(_tensors(flax_to_torch(params, stats, "CIFAR10", "generator")),
               pt0)
    npz = tmp_path / "g.npz"
    convert(["--dataset", "CIFAR10", "--role", "generator",
             "--input", str(pt0), "--out", str(npz)])
    pt1 = tmp_path / "g_back.pt"
    convert(["--dataset", "CIFAR10", "--role", "generator",
             "--input", str(npz), "--out", str(pt1)])
    sd0 = torch.load(pt0, map_location="cpu", weights_only=True)
    sd1 = torch.load(pt1, map_location="cpu", weights_only=True)
    assert sorted(sd0) == sorted(sd1)
    for k in sd0:
        np.testing.assert_array_equal(sd0[k].numpy(), sd1[k].numpy())

    out = tmp_path / "grid.png"
    generate(["--dataset", "CIFAR10", "--weights", str(npz),
              "--num", "4", "--out", str(out)])
    assert out.exists() and out.stat().st_size > 0
