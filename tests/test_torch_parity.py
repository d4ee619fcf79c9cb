"""Numerical forward parity against literal torch builds of the reference
models.

The strongest architecture-parity evidence available: construct the
reference's torch ``nn.Sequential`` models exactly (``src/datasets/
CIFAR10.py:83-133``), copy THIS framework's initialized weights into them
(flax HWIO -> torch OIHW for conv; spatially-flipped (in,out,kh,kw) for
conv-transpose — lax.conv_transpose's kernel convention), and assert the
forward outputs agree to float32 tolerance on random inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def conv_w(flax_kernel):
    """flax (kh, kw, in, out) -> torch Conv2d (out, in, kh, kw)."""
    return _t(np.asarray(flax_kernel).transpose(3, 2, 0, 1))


def convT_w(flax_kernel):
    """flax ConvTranspose (kh, kw, in, out) -> torch ConvTranspose2d
    (in, out, kh, kw), undoing lax.conv_transpose's spatial flip."""
    k = np.asarray(flax_kernel)[::-1, ::-1]          # unflip kh, kw
    return _t(k.transpose(2, 3, 0, 1))


def load_bn(bn: tnn.BatchNorm2d, params):
    with torch.no_grad():
        bn.weight.copy_(_t(np.asarray(params["scale"])))
        bn.bias.copy_(_t(np.asarray(params["bias"])))


@pytest.mark.slow
def test_dcgan32_discriminator_matches_torch():
    from mdgan_tpu.models.dcgan32 import NDF, DCGANDiscriminator32

    model = DCGANDiscriminator32()
    x = np.asarray(jax.random.normal(jax.random.key(0), (4, 32, 32, 3)),
                   np.float32)
    variables = model.init({"params": jax.random.key(1)}, jnp.asarray(x),
                           train=True)
    p = variables["params"]

    # reference src/datasets/CIFAR10.py:83-98, verbatim architecture
    tm = tnn.Sequential(
        tnn.Conv2d(3, NDF, 4, 2, 1, bias=False), tnn.LeakyReLU(0.2),
        tnn.Conv2d(NDF, NDF * 2, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(NDF * 2), tnn.LeakyReLU(0.2),
        tnn.Conv2d(NDF * 2, NDF * 4, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(NDF * 4), tnn.LeakyReLU(0.2),
        tnn.Conv2d(NDF * 4, 1, 4, 1, 0, bias=False), tnn.Sigmoid(),
    ).train()
    with torch.no_grad():
        tm[0].weight.copy_(conv_w(p["ConvBlock_0"]["Conv_0"]["kernel"]))
        tm[2].weight.copy_(conv_w(p["ConvBlock_1"]["Conv_0"]["kernel"]))
        load_bn(tm[3], p["ConvBlock_1"]["BatchNorm_0"])
        tm[5].weight.copy_(conv_w(p["ConvBlock_2"]["Conv_0"]["kernel"]))
        load_bn(tm[6], p["ConvBlock_2"]["BatchNorm_0"])
        tm[8].weight.copy_(conv_w(p["Conv_0"]["kernel"]))

    logits, _ = model.apply(variables, jnp.asarray(x), train=True,
                            mutable=["batch_stats"])
    ours = np.asarray(jax.nn.sigmoid(logits))
    theirs = tm(_t(x.transpose(0, 3, 1, 2))).view(-1).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dcgan32_generator_matches_torch():
    from mdgan_tpu.models.dcgan32 import NGF, Z_DIM, DCGANGenerator32

    model = DCGANGenerator32()
    z = np.asarray(jax.random.normal(jax.random.key(2), (4, Z_DIM)), np.float32)
    variables = model.init({"params": jax.random.key(3)}, jnp.asarray(z),
                           train=True)
    p = variables["params"]

    # reference src/datasets/CIFAR10.py:116-133, verbatim architecture
    tm = tnn.Sequential(
        tnn.ConvTranspose2d(Z_DIM, NGF * 8, 4, 1, 0, bias=False),
        tnn.BatchNorm2d(NGF * 8), tnn.ReLU(),
        tnn.ConvTranspose2d(NGF * 8, NGF * 4, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(NGF * 4), tnn.ReLU(),
        tnn.ConvTranspose2d(NGF * 4, NGF * 2, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(NGF * 2), tnn.ReLU(),
        tnn.ConvTranspose2d(NGF * 2, 3, 4, 2, 1, bias=False), tnn.Tanh(),
    ).train()
    with torch.no_grad():
        tm[0].weight.copy_(convT_w(p["ConvTransposeBlock_0"]["ConvTranspose_0"]["kernel"]))
        load_bn(tm[1], p["ConvTransposeBlock_0"]["BatchNorm_0"])
        tm[3].weight.copy_(convT_w(p["ConvTransposeBlock_1"]["ConvTranspose_0"]["kernel"]))
        load_bn(tm[4], p["ConvTransposeBlock_1"]["BatchNorm_0"])
        tm[6].weight.copy_(convT_w(p["ConvTransposeBlock_2"]["ConvTranspose_0"]["kernel"]))
        load_bn(tm[7], p["ConvTransposeBlock_2"]["BatchNorm_0"])
        tm[9].weight.copy_(convT_w(p["ConvTranspose_0"]["kernel"]))

    out, _ = model.apply(variables, jnp.asarray(z), train=True,
                         mutable=["batch_stats"])
    ours = np.asarray(out)
    theirs = tm(_t(z.reshape(4, Z_DIM, 1, 1))).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dcgan64_discriminator_matches_torch():
    """CelebA discriminator with the reference's quirks: default-slope (0.01)
    LeakyReLU on cv1, BIASED cv2/cv3 (reference CelebA.py:78-101)."""
    import torch.nn.functional as F

    from mdgan_tpu.models.dcgan64 import NDF, DCGANDiscriminator64

    model = DCGANDiscriminator64()
    x = np.asarray(jax.random.normal(jax.random.key(4), (2, 64, 64, 3)),
                   np.float32)
    variables = model.init({"params": jax.random.key(5)}, jnp.asarray(x),
                           train=True)
    p = variables["params"]

    cv1 = tnn.Conv2d(3, NDF, 4, 2, 1, bias=False)
    cv2 = tnn.Conv2d(NDF, NDF * 2, 4, 2, 1)
    bn2 = tnn.BatchNorm2d(NDF * 2).train()
    cv3 = tnn.Conv2d(NDF * 2, NDF * 4, 4, 2, 1)
    bn3 = tnn.BatchNorm2d(NDF * 4).train()
    cv4 = tnn.Conv2d(NDF * 4, NDF * 8, 4, 2, 1, bias=False)
    bn4 = tnn.BatchNorm2d(NDF * 8).train()
    cv5 = tnn.Conv2d(NDF * 8, 1, 4, 1, 0, bias=False)
    with torch.no_grad():
        cv1.weight.copy_(conv_w(p["ConvBlock_0"]["Conv_0"]["kernel"]))
        cv2.weight.copy_(conv_w(p["ConvBlock_1"]["Conv_0"]["kernel"]))
        cv2.bias.copy_(_t(np.asarray(p["ConvBlock_1"]["Conv_0"]["bias"])))
        load_bn(bn2, p["ConvBlock_1"]["BatchNorm_0"])
        cv3.weight.copy_(conv_w(p["ConvBlock_2"]["Conv_0"]["kernel"]))
        cv3.bias.copy_(_t(np.asarray(p["ConvBlock_2"]["Conv_0"]["bias"])))
        load_bn(bn3, p["ConvBlock_2"]["BatchNorm_0"])
        cv4.weight.copy_(conv_w(p["ConvBlock_3"]["Conv_0"]["kernel"]))
        load_bn(bn4, p["ConvBlock_3"]["BatchNorm_0"])
        cv5.weight.copy_(conv_w(p["Conv_0"]["kernel"]))

    xt = _t(x.transpose(0, 3, 1, 2))
    h = F.leaky_relu(cv1(xt))                     # default slope 0.01
    h = F.leaky_relu(bn2(cv2(h)), 0.2)
    h = F.leaky_relu(bn3(cv3(h)), 0.2)
    h = F.leaky_relu(bn4(cv4(h)), 0.2)
    theirs = torch.sigmoid(cv5(h)).view(-1).detach().numpy()

    logits, _ = model.apply(variables, jnp.asarray(x), train=True,
                            mutable=["batch_stats"])
    ours = np.asarray(jax.nn.sigmoid(logits))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dcgan64_generator_matches_torch():
    from mdgan_tpu.models.dcgan64 import NGF, Z_DIM, DCGANGenerator64

    model = DCGANGenerator64()
    z = np.asarray(jax.random.normal(jax.random.key(6), (2, Z_DIM)), np.float32)
    variables = model.init({"params": jax.random.key(7)}, jnp.asarray(z),
                           train=True)
    p = variables["params"]

    tm = tnn.Sequential(
        tnn.ConvTranspose2d(Z_DIM, NGF * 8, 4, 1, 0, bias=False),
        tnn.BatchNorm2d(NGF * 8), tnn.ReLU(),
        tnn.ConvTranspose2d(NGF * 8, NGF * 4, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(NGF * 4), tnn.ReLU(),
        tnn.ConvTranspose2d(NGF * 4, NGF * 2, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(NGF * 2), tnn.ReLU(),
        tnn.ConvTranspose2d(NGF * 2, NGF, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(NGF), tnn.ReLU(),
        tnn.ConvTranspose2d(NGF, 3, 4, 2, 1, bias=False), tnn.Tanh(),
    ).train()
    with torch.no_grad():
        for i, blk in enumerate(
                ["ConvTransposeBlock_0", "ConvTransposeBlock_1",
                 "ConvTransposeBlock_2", "ConvTransposeBlock_3"]):
            tm[3 * i].weight.copy_(convT_w(p[blk]["ConvTranspose_0"]["kernel"]))
            load_bn(tm[3 * i + 1], p[blk]["BatchNorm_0"])
        tm[12].weight.copy_(convT_w(p["ConvTranspose_0"]["kernel"]))

    out, _ = model.apply(variables, jnp.asarray(z), train=True,
                         mutable=["batch_stats"])
    theirs = tm(_t(z.reshape(2, Z_DIM, 1, 1))).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_mlp_gan_matches_torch():
    """MNIST MLP pair (reference MNIST.py:74-120). D compared in eval mode
    (dropout off both sides); with c=1 the NHWC/NCHW flatten orders agree."""
    import torch.nn.functional as F

    from mdgan_tpu.models.mlp_gan import SHAPE, Z_DIM, MLPDiscriminator, MLPGenerator

    n_pix = SHAPE[0] * SHAPE[1] * SHAPE[2]

    gm = MLPGenerator()
    z = np.asarray(jax.random.normal(jax.random.key(8), (4, Z_DIM)), np.float32)
    gv = gm.init({"params": jax.random.key(9)}, jnp.asarray(z), train=True)

    tg = tnn.Sequential(tnn.Linear(Z_DIM, 256), tnn.Linear(256, 512),
                        tnn.Linear(512, 1024), tnn.Linear(1024, n_pix))
    with torch.no_grad():
        for i, name in enumerate(["Dense_0", "Dense_1", "Dense_2", "Dense_3"]):
            tg[i].weight.copy_(_t(np.asarray(gv["params"][name]["kernel"]).T))
            tg[i].bias.copy_(_t(np.asarray(gv["params"][name]["bias"])))
    h = _t(z)
    for i in range(3):
        h = F.leaky_relu(tg[i](h), 0.2)
    theirs = torch.tanh(tg[3](h)).detach().numpy().reshape(4, *SHAPE)
    ours = np.asarray(gm.apply(gv, jnp.asarray(z), train=True,
                               mutable=["batch_stats"])[0])
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    dm = MLPDiscriminator()
    x = theirs.astype(np.float32)
    dv = dm.init({"params": jax.random.key(10)}, jnp.asarray(x), train=False)
    td = tnn.Sequential(tnn.Linear(n_pix, 1024), tnn.Linear(1024, 512),
                        tnn.Linear(512, 256), tnn.Linear(256, 1))
    with torch.no_grad():
        for i, name in enumerate(["Dense_0", "Dense_1", "Dense_2", "Dense_3"]):
            td[i].weight.copy_(_t(np.asarray(dv["params"][name]["kernel"]).T))
            td[i].bias.copy_(_t(np.asarray(dv["params"][name]["bias"])))
    h = _t(x.reshape(4, -1))
    for i in range(3):
        h = F.leaky_relu(td[i](h), 0.2)   # eval mode: dropout is identity
    theirs_d = torch.sigmoid(td[3](h)).view(-1).detach().numpy()
    ours_d = np.asarray(jax.nn.sigmoid(
        dm.apply(dv, jnp.asarray(x), train=False)))
    np.testing.assert_allclose(ours_d, theirs_d, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_full_mdgan_round_matches_torch():
    """One COMPLETE MD-GAN round cross-checked against a literal torch
    implementation of the reference algorithm (worker.py:157-286 +
    server.py:213-313): per-worker D Adam step on BCE(real,1)+BCE(X_d,0),
    post-update feedback grads w.r.t. X_g, scatter-add, one G VJP scaled
    1/(b*N), Adam updates on both sides.

    Losses and feedback norms must match tightly.  Post-Adam parameters are
    compared with a sign-flip-aware tolerance: with one optimizer step,
    update ~= lr * sign(grad) elementwise, so elements whose |grad| sits at
    cross-backend float noise may legitimately flip — bounded below 0.5%.
    """
    import torch.nn.functional as F

    from mdgan_tpu.core import prng
    from mdgan_tpu.core.config import TrainConfig
    from mdgan_tpu.core.registry import get as get_spec
    from mdgan_tpu.data.partitioner import shard_data
    from mdgan_tpu.data.sampler import ShardSampler
    from mdgan_tpu.engine.mdgan import MDGANEngine
    from mdgan_tpu.models.dcgan32 import NDF, NGF, Z_DIM

    N, b, lr = 2, 4, 2e-4
    spec = get_spec("CIFAR10")
    cfg = TrainConfig(batch_size=b, chunk_size=1, compute_dtype="float32",
                      donate=False)
    eng = MDGANEngine(spec, cfg, num_workers=N)
    assert eng.k == 2
    data, _ = spec.load("data", max_examples=64)
    shards, _ = shard_data(data, N, iid=True, seed=0)
    sampler = ShardSampler(N, shards.shape[1], b, seed=0)
    idx = np.asarray(sampler.next_chunk(1))          # (1, N, b)
    st = eng.init_state(seed=3)

    # ---- torch replicas of G and stacked D, loaded with the SAME weights
    def build_torch_g(p):
        tm = tnn.Sequential(
            tnn.ConvTranspose2d(Z_DIM, NGF * 8, 4, 1, 0, bias=False),
            tnn.BatchNorm2d(NGF * 8), tnn.ReLU(),
            tnn.ConvTranspose2d(NGF * 8, NGF * 4, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(NGF * 4), tnn.ReLU(),
            tnn.ConvTranspose2d(NGF * 4, NGF * 2, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(NGF * 2), tnn.ReLU(),
            tnn.ConvTranspose2d(NGF * 2, 3, 4, 2, 1, bias=False), tnn.Tanh(),
        ).train()
        with torch.no_grad():
            for i, blk in enumerate(["ConvTransposeBlock_0", "ConvTransposeBlock_1",
                                     "ConvTransposeBlock_2"]):
                tm[3 * i].weight.copy_(convT_w(p[blk]["ConvTranspose_0"]["kernel"]))
                load_bn(tm[3 * i + 1], p[blk]["BatchNorm_0"])
            tm[9].weight.copy_(convT_w(p["ConvTranspose_0"]["kernel"]))
        return tm

    def build_torch_d(p):
        tm = tnn.Sequential(
            tnn.Conv2d(3, NDF, 4, 2, 1, bias=False), tnn.LeakyReLU(0.2),
            tnn.Conv2d(NDF, NDF * 2, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(NDF * 2), tnn.LeakyReLU(0.2),
            tnn.Conv2d(NDF * 2, NDF * 4, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(NDF * 4), tnn.LeakyReLU(0.2),
            tnn.Conv2d(NDF * 4, 1, 4, 1, 0, bias=False),
        ).train()
        with torch.no_grad():
            tm[0].weight.copy_(conv_w(p["ConvBlock_0"]["Conv_0"]["kernel"]))
            tm[2].weight.copy_(conv_w(p["ConvBlock_1"]["Conv_0"]["kernel"]))
            load_bn(tm[3], p["ConvBlock_1"]["BatchNorm_0"])
            tm[5].weight.copy_(conv_w(p["ConvBlock_2"]["Conv_0"]["kernel"]))
            load_bn(tm[6], p["ConvBlock_2"]["BatchNorm_0"])
            tm[8].weight.copy_(conv_w(p["Conv_0"]["kernel"]))
        return tm

    tg = build_torch_g(st.g.params)
    tds = [build_torch_d(jax.tree.map(lambda a, n_=n: a[n_], st.d.params))
           for n in range(N)]

    # ---- the reference round in torch (betas (0, 0.999) = effective ref)
    kz = prng.for_step(st.key, prng.LATENT, st.step)
    z = np.asarray(jax.random.normal(kz, (eng.k * b, Z_DIM), jnp.float32))
    zt = _t(z.reshape(eng.k * b, Z_DIM, 1, 1))
    x_all = tg(zt)                                        # (k*b, 3, 32, 32)
    x_k = x_all.view(eng.k, b, 3, 32, 32)

    d_losses_t, feedbacks = [], []
    for n in range(N):
        real = shards[n][idx[0, n]].astype(np.float32) * (2.0 / 255.0) - 1.0
        real_t = _t(real.transpose(0, 3, 1, 2))
        x_d = x_k[(n + 1) % eng.k].detach()
        opt = torch.optim.Adam(tds[n].parameters(), lr=lr, betas=(0.0, 0.999))
        lr_real = F.binary_cross_entropy_with_logits(
            tds[n](real_t).view(-1), torch.ones(b))
        lr_fake = F.binary_cross_entropy_with_logits(
            tds[n](x_d).view(-1), torch.zeros(b))
        loss = lr_real + lr_fake
        opt.zero_grad(); loss.backward(); opt.step()
        d_losses_t.append(float(loss.detach()))

        x_g = x_k[n % eng.k].detach().requires_grad_(True)
        fb_loss = F.binary_cross_entropy_with_logits(
            tds[n](x_g).view(-1), torch.ones(b))
        (e_n,) = torch.autograd.grad(fb_loss, x_g)
        feedbacks.append(e_n)

    cot = torch.cat(feedbacks, dim=0) / (b * N)           # workers 0,1 -> K0,K1
    g_opt = torch.optim.Adam(tg.parameters(), lr=lr, betas=(0.0, 0.999))
    g_opt.zero_grad()
    x_all.backward(cot)
    g_opt.step()

    # ---- the engine's fused round
    st1, m = eng.chunk_fn(1)(st, eng.shard_data(shards), jnp.asarray(idx))

    np.testing.assert_allclose(np.asarray(m["mean_d_loss"])[0], d_losses_t,
                               rtol=2e-4)
    fb_norm_t = float(torch.cat(feedbacks).pow(2).sum().sqrt())
    np.testing.assert_allclose(float(np.asarray(m["feedback_norm"])[0]),
                               fb_norm_t, rtol=2e-3)

    def check_params(flax_new, flax_old, torch_new_w, torch_old_w, what):
        """Per-tensor comparison with sign-flip-aware tolerance."""
        d_ours = np.asarray(flax_new) - np.asarray(flax_old)
        d_torch = torch_new_w - torch_old_w
        close = np.isclose(d_ours, d_torch, rtol=1e-2, atol=1e-6)
        frac_bad = 1.0 - close.mean()
        assert frac_bad < 0.005, (what, frac_bad)
        assert np.abs(d_ours - d_torch).max() <= 2.05 * lr + 1e-6, what

    # G: first conv-transpose kernel as representative deep tensor + final
    g_new = st1.g.params
    pairs = [
        ("ConvTransposeBlock_0", 0), ("ConvTransposeBlock_1", 3),
        ("ConvTransposeBlock_2", 6),
    ]
    for blk, ti in pairs:
        tw_new = tg[ti].weight.detach().numpy()
        tw_new = tw_new[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)  # -> flax layout
        check_params(g_new[blk]["ConvTranspose_0"]["kernel"],
                     st.g.params[blk]["ConvTranspose_0"]["kernel"],
                     tw_new,
                     np.asarray(st.g.params[blk]["ConvTranspose_0"]["kernel"]),
                     f"G {blk}")
    # D worker 0 first conv
    d_new0 = jax.tree.map(lambda a: a[0], st1.d.params)
    d_old0 = jax.tree.map(lambda a: a[0], st.d.params)
    tw_new = tds[0][0].weight.detach().numpy().transpose(2, 3, 1, 0)
    check_params(d_new0["ConvBlock_0"]["Conv_0"]["kernel"],
                 d_old0["ConvBlock_0"]["Conv_0"]["kernel"],
                 tw_new,
                 np.asarray(d_old0["ConvBlock_0"]["Conv_0"]["kernel"]),
                 "D0 ConvBlock_0")
