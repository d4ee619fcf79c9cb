"""Model shape / init / dtype tests.

Shape contracts follow the reference architectures:
DCGAN-32 (reference ``src/datasets/CIFAR10.py:76-140``), DCGAN-64
(``CelebA.py:75-142``), MLP-GAN (``MNIST.py:74-120``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdgan_tpu.models.dcgan32 import DCGANDiscriminator32, DCGANGenerator32
from mdgan_tpu.models.dcgan64 import DCGANDiscriminator64, DCGANGenerator64
from mdgan_tpu.models.mlp_gan import MLPDiscriminator, MLPGenerator


CASES = [
    (DCGANGenerator32, DCGANDiscriminator32, (32, 32, 3), 100),
    (DCGANGenerator64, DCGANDiscriminator64, (64, 64, 3), 100),
    (MLPGenerator, MLPDiscriminator, (28, 28, 1), 100),
]


@pytest.mark.parametrize("G,D,shape,zdim", CASES)
def test_shapes(G, D, shape, zdim):
    b = 4
    g, d = G(), D()
    z = jnp.zeros((b, zdim))
    gv = g.init({"params": jax.random.key(0)}, z, train=True)
    x, _ = g.apply(gv, z, train=True, mutable=["batch_stats"])
    assert x.shape == (b, *shape)
    assert x.dtype == jnp.float32
    # tanh output range
    assert float(jnp.max(jnp.abs(x))) <= 1.0

    dv = d.init({"params": jax.random.key(1), "dropout": jax.random.key(2)}, x, train=True)
    logits, _ = d.apply(dv, x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.key(3)})
    assert logits.shape == (b,)
    assert logits.dtype == jnp.float32


def test_dcgan_init_statistics():
    """Conv weights ~ N(0, 0.02), BN scale ~ N(1, 0.02) — reference
    ``bootstrap.py:17-27``."""
    g = DCGANGenerator32()
    gv = g.init({"params": jax.random.key(0)}, jnp.zeros((2, 100)), train=True)
    conv_stds, bn_means = [], []
    flat = jax.tree_util.tree_leaves_with_path(gv["params"])
    for keypath, leaf in flat:
        name = jax.tree_util.keystr(keypath)
        if "kernel" in name and leaf.ndim == 4:
            conv_stds.append(float(jnp.std(leaf)))
        if "scale" in name:
            bn_means.append(float(jnp.mean(leaf)))
    assert conv_stds and bn_means
    for s in conv_stds:
        assert 0.015 < s < 0.025, s
    for m in bn_means:
        assert 0.9 < m < 1.1, m


def test_mlp_linear_init_matches_torch_default():
    """Linear layers keep torch's default U(±1/sqrt(fan_in)) — the reference's
    DCGAN init never matches nn.Linear (``bootstrap.py:22-27``)."""
    g = MLPGenerator()
    gv = g.init({"params": jax.random.key(0)}, jnp.zeros((2, 100)), train=True)
    flat = jax.tree_util.tree_leaves_with_path(gv["params"])
    checked = 0
    for keypath, leaf in flat:
        if "kernel" in jax.tree_util.keystr(keypath):
            fan_in = leaf.shape[0]
            bound = 1.0 / np.sqrt(fan_in)
            assert float(jnp.max(jnp.abs(leaf))) <= bound + 1e-6
            # uniform on [-a, a] has std a/sqrt(3)
            assert abs(float(jnp.std(leaf)) - bound / np.sqrt(3)) < 0.15 * bound
            checked += 1
    assert checked == 4


def test_bfloat16_compute_path():
    g = DCGANGenerator32(dtype=jnp.bfloat16)
    z = jnp.zeros((2, 100))
    gv = g.init({"params": jax.random.key(0)}, z, train=True)
    # params stay f32
    for leaf in jax.tree_util.tree_leaves(gv["params"]):
        assert leaf.dtype == jnp.float32
    x, _ = g.apply(gv, z, train=True, mutable=["batch_stats"])
    assert x.dtype == jnp.float32  # outputs cast back at the head


def test_conv_transpose_shape_parity_with_torch():
    """Cross-check our SAME/VALID choices against torch.nn.ConvTranspose2d
    output shapes for the reference's (k, s, p) configurations."""
    torch = pytest.importorskip("torch")
    for (kk, s, p, hin) in [(4, 1, 0, 1), (4, 2, 1, 4), (4, 2, 1, 16)]:
        m = torch.nn.ConvTranspose2d(8, 8, kk, s, p, bias=False)
        hout = m(torch.zeros(1, 8, hin, hin)).shape[-1]
        import flax.linen as fnn

        pad = "VALID" if p == 0 else "SAME"
        layer = fnn.ConvTranspose(8, (kk, kk), strides=(s, s), padding=pad, use_bias=False)
        v = layer.init(jax.random.key(0), jnp.zeros((1, hin, hin, 8)))
        out = layer.apply(v, jnp.zeros((1, hin, hin, 8)))
        assert out.shape[1] == hout, (kk, s, p, hin, out.shape, hout)


@pytest.mark.slow
def test_stylegan2_shapes_and_grads():
    """Stretch family: StyleGAN2-128 G/D forward shapes, grad flow, and
    noise-optional synthesis (deterministic without a dropout rng)."""
    from mdgan_tpu.models.stylegan2 import (
        StyleGAN2Discriminator, StyleGAN2Generator, Z_DIM,
    )

    b = 2
    g = StyleGAN2Generator(max_res=32, base_features=32, map_layers=2)  # tiny for test speed
    z = jax.random.normal(jax.random.key(0), (b, Z_DIM))
    gv = g.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                z, train=True)
    x, _ = g.apply(gv, z, train=True, mutable=["batch_stats"],
                   rngs={"dropout": jax.random.key(3)})
    assert x.shape == (b, 32, 32, 3)
    assert float(jnp.max(jnp.abs(x))) <= 1.0
    # deterministic without noise rng
    x1, _ = g.apply(gv, z, train=True, mutable=["batch_stats"])
    x2, _ = g.apply(gv, z, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))

    d = StyleGAN2Discriminator(max_res=32, base_features=32)
    dv = d.init({"params": jax.random.key(4)}, x, train=True)
    logits = d.apply(dv, x, train=True, mutable=["batch_stats"])[0]
    assert logits.shape == (b,)

    # gradient flows end to end
    def loss(gp):
        img, _ = g.apply({"params": gp}, z, train=True, mutable=["batch_stats"])
        out = d.apply(dv, img, train=True, mutable=["batch_stats"])[0]
        return jnp.mean(out)

    grads = jax.grad(loss)(gv["params"])
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


@pytest.mark.slow
def test_stylegan2_mdgan_engine_compat():
    """The MD-GAN engine must train the stretch family unmodified."""
    from mdgan_tpu.core.config import TrainConfig
    from mdgan_tpu.core.registry import get as get_spec
    from mdgan_tpu.data.partitioner import shard_data
    from mdgan_tpu.data.sampler import ShardSampler
    from mdgan_tpu.engine.mdgan import MDGANEngine

    spec = get_spec("FFHQ128")
    # shrink resolution via the model factories for test speed
    import dataclasses

    from mdgan_tpu.models import stylegan2 as sg

    small = dataclasses.replace(
        spec, shape=(32, 32, 3),
        make_generator=lambda **kw: sg.StyleGAN2Generator(max_res=32, base_features=32, map_layers=2, **kw),
        make_discriminator=lambda **kw: sg.StyleGAN2Discriminator(max_res=32, base_features=32, **kw),
        load=lambda data_dir, split="train", fallback="synthetic", max_examples=None:
            __import__("mdgan_tpu.data.builtin", fromlist=["synthesize"]).synthesize(
                (32, 32, 3), max_examples or 64, seed=5),
    )
    cfg = TrainConfig(batch_size=2, chunk_size=2, compute_dtype="float32",
                      donate=False)
    eng = MDGANEngine(small, cfg, num_workers=2)
    data, _ = small.load("data", max_examples=32)
    from mdgan_tpu.data.partitioner import shard_data as sd

    shards, _ = sd(data, 2, iid=True, seed=0)
    st = eng.init_state(seed=0)
    sampler = ShardSampler(2, shards.shape[1], 2, seed=0)
    st, m = eng.chunk_fn(2)(st, jnp.asarray(shards), jnp.asarray(sampler.next_chunk(2)))
    assert np.isfinite(np.asarray(m["mean_d_loss"])).all()
    assert int(st.step) == 2
