"""InceptionV3 feature network in Flax (for FID / Inception Score).

The reference computes FID/IS through torchmetrics' pretrained InceptionV3
(reference ``src/actors/server.py:20-43``, ``src/standalone_gan.py:32-55``).
This is a faithful InceptionV3 (aux-logits-free) producing the 2048-d pool
features (FID) and class logits (IS), in two selectable graph variants:

  * ``fid_variant=False`` (default): torchvision's ``inception_v3`` graph —
    branch avg-pools use ``count_include_pad=True`` (torch's
    ``F.avg_pool2d`` default), 1000 classes.  **Numerically validated** leaf
    by leaf against a literal raw-torch rebuild of the torchvision graph in
    ``tests/test_inception_parity.py`` (same converted weights on both
    sides, pool features + logits compared on real-shaped inputs, including
    the resize-to-299 + [-1, 1] preprocessing vs torch's
    ``interpolate(mode='bilinear', align_corners=False)`` semantics).
  * ``fid_variant=True``: the FID-Inception graph torchmetrics actually
    routes through (torch-fidelity / pytorch-fid "inception-v3-compat", a
    port of the original TF-slim FID network): branch avg-pools use
    ``count_include_pad=False``, ``Mixed_7c``'s pool branch is a MAX pool,
    and ``fc`` has 1008 classes.  Also validated in
    ``tests/test_inception_parity.py``.

The variant is auto-detected from converted weights (a 1008-way ``fc`` ⇒
FID-compat); absolute FID values differ slightly between the two backbones —
a well-known cross-implementation delta in the FID literature — so
:func:`feature_source` reports which one produced the numbers.

Pretrained weights cannot be downloaded in this environment (zero egress), so:
  * if a converted weight file exists (``inception_v3.npz`` with torch
    state-dict keys, see :func:`load_torch_npz` and
    ``cli/convert_inception.py`` — both torchvision's ImageNet checkpoint
    and pytorch-fid's ``pt_inception-2015-12-05`` convert), it is used and
    FID numbers are literature-comparable;
  * otherwise a *deterministic randomly-initialized* network is used.  FID
    over random CNN features is still a valid, widely-studied distributional
    distance (it ranks model quality consistently), but its absolute scale is
    not comparable to published FID values — callers are told which mode they
    got via :func:`feature_source`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv(nn.Module):
    """conv(bias=False) + BN(eps=1e-3, frozen stats at inference) + relu.

    ``train=True`` is used only for BN-stat *calibration* of the random-init
    fallback network (momentum 0 => one pass writes batch stats as the frozen
    stats); the pretrained path never trains.
    """

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str | Tuple = "VALID"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.0,
                         epsilon=1e-3, name="bn")(x)
        return nn.relu(x)


def _avgpool3(x, count_include_pad: bool = True):
    """3x3/s1/p1 branch avg-pool.  torchvision's graph uses torch's
    ``F.avg_pool2d`` default ``count_include_pad=True``; the FID-compat
    graph (torch-fidelity/pytorch-fid) patches it to ``False``."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=count_include_pad)


class InceptionA(nn.Module):
    pool_features: int
    fid_variant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x, train)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x, train)
        b5 = BasicConv(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2")(b5, train)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x, train)
        b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(b3, train)
        b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3")(b3, train)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(
            _avgpool3(x, not self.fid_variant), train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), name="branch3x3")(x, train)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x, train)
        bd = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd, train)
        bd = BasicConv(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    fid_variant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x, train)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x, train)
        b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7, train)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7, train)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x, train)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd, train)
        bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd, train)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd, train)
        bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd, train)
        bp = BasicConv(192, (1, 1), name="branch_pool")(
            _avgpool3(x, not self.fid_variant), train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x, train)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3, train)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x, train)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7, train)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7, train)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # FID-compat quirk: the compat graph's SECOND E block (Mixed_7c,
    # pytorch-fid's ``FIDInceptionE_2``) uses a MAX pool for the pool branch
    # where torchvision (and the compat Mixed_7b) use an avg pool.
    fid_variant: bool = False
    max_branch_pool: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x, train)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x, train)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3, train)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x, train)
        bd = BasicConv(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd, train)
        bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd, train)
        bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.max_branch_pool:
            pooled = nn.max_pool(x, (3, 3), strides=(1, 1),
                                 padding=((1, 1), (1, 1)))
        else:
            pooled = _avgpool3(x, not self.fid_variant)
        bp = BasicConv(192, (1, 1), name="branch_pool")(pooled, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns (pool_features[2048], logits[num_classes]).

    ``fid_variant`` selects the FID-Inception graph (see module docstring);
    the module/weight-key layout is identical in both variants, only three
    pooling semantics and the ``fc`` width differ.
    """

    num_classes: int = 1000
    fid_variant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (b, 299, 299, 3) in [-1, 1]
        fid = self.fid_variant
        x = BasicConv(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x, train)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x, train)
        x = BasicConv(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x, train)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, fid, name="Mixed_5b")(x, train)
        x = InceptionA(64, fid, name="Mixed_5c")(x, train)
        x = InceptionA(64, fid, name="Mixed_5d")(x, train)
        x = InceptionB(name="Mixed_6a")(x, train)
        x = InceptionC(128, fid, name="Mixed_6b")(x, train)
        x = InceptionC(160, fid, name="Mixed_6c")(x, train)
        x = InceptionC(160, fid, name="Mixed_6d")(x, train)
        x = InceptionC(192, fid, name="Mixed_6e")(x, train)
        x = InceptionD(name="Mixed_7a")(x, train)
        x = InceptionE(fid, name="Mixed_7b")(x, train)
        x = InceptionE(fid, max_branch_pool=fid, name="Mixed_7c")(x, train)
        feats = jnp.mean(x, axis=(1, 2))  # global average pool -> (b, 2048)
        logits = nn.Dense(self.num_classes, name="fc")(feats)
        return feats, logits


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------

_CACHED = None


def feature_source() -> str:
    """Which weights/graph produced the features.

    ``'random-init'`` (deterministic random weights, BN-calibrated per
    tracker), ``'pretrained:torchvision'`` (converted torchvision ImageNet
    checkpoint on the torchvision graph), or ``'pretrained:fid-compat'``
    (converted pytorch-fid / torch-fidelity FID weights on the compat
    graph — the backbone torchmetrics uses, so those FIDs compare directly
    to the reference's numbers).  Stamped into every run's ``summary.json``
    so committed artifacts record which mode produced their FID columns.
    """
    get_inception()
    return _CACHED[2]


def feature_source_if_loaded() -> Optional[str]:
    """:func:`feature_source` without forcing network construction.

    Returns ``None`` when no FID/IS computation has touched the inception
    net in this process (e.g. a run with evals disabled) — used by the
    trainers to stamp ``summary.json`` truthfully without paying an
    InceptionV3 init on eval-free runs.
    """
    return None if _CACHED is None else _CACHED[2]


def load_torch_npz(path, variables) -> dict:
    """Map a torch inception_v3 state dict (saved as npz) onto our variables.

    torch keys look like ``Mixed_5b.branch1x1.conv.weight`` /
    ``...bn.{weight,bias,running_mean,running_var}`` / ``fc.{weight,bias}``.
    Conv weights are OIHW -> HWIO; Dense (out,in) -> (in,out).
    ``path`` may be a filesystem path or an already-loaded ``{key: array}``
    mapping (``get_inception`` reads the file once and passes the dict).
    """
    import flax

    if isinstance(path, dict):
        flat = path
    else:
        with np.load(path) as npz:
            flat = dict(npz)
    params = flax.traverse_util.flatten_dict(variables["params"], sep=".")
    stats = flax.traverse_util.flatten_dict(variables["batch_stats"], sep=".")

    def fetch(torch_key):
        if torch_key not in flat:
            raise KeyError(f"missing torch weight {torch_key}")
        return flat[torch_key]

    new_params, new_stats = {}, {}
    for key, val in params.items():
        mod, leaf = key.rsplit(".", 1)
        if leaf == "kernel" and mod.endswith(".conv"):
            w = fetch(mod[: -len(".conv")] + ".conv.weight")
            new_params[key] = np.transpose(w, (2, 3, 1, 0))
        elif mod == "fc" and leaf == "kernel":
            new_params[key] = np.transpose(fetch("fc.weight"))
        elif mod == "fc" and leaf == "bias":
            new_params[key] = fetch("fc.bias")
        elif leaf == "scale":
            new_params[key] = fetch(mod.replace(".bn", "") + ".bn.weight")
        elif leaf == "bias":
            new_params[key] = fetch(mod.replace(".bn", "") + ".bn.bias")
        else:
            raise KeyError(f"unmapped param {key}")
        assert new_params[key].shape == val.shape, (key, new_params[key].shape, val.shape)
    for key, val in stats.items():
        mod, leaf = key.rsplit(".", 1)
        torch_leaf = {"mean": "running_mean", "var": "running_var"}[leaf]
        new_stats[key] = fetch(mod + "." + torch_leaf)
        assert new_stats[key].shape == val.shape
    return {
        "params": flax.traverse_util.unflatten_dict(new_params, sep="."),
        "batch_stats": flax.traverse_util.unflatten_dict(new_stats, sep="."),
    }


def get_inception(weights_path: Optional[str] = None):
    """(model, variables, source). Cached after first call.

    The graph variant is auto-detected from the converted weights: a
    1008-way ``fc`` is the TF-slim class count ⇒ the FID-compat graph
    (pytorch-fid's ``pt_inception-2015-12-05`` weights); a 1000-way ``fc``
    ⇒ torchvision's graph (its ImageNet checkpoint).  Without weights the
    torchvision graph with deterministic random init is used.
    """
    global _CACHED
    if _CACHED is not None and weights_path is None:
        return _CACHED[0], _CACHED[1], _CACHED[2]
    candidates = [weights_path] if weights_path else []
    candidates += ["data/inception_v3.npz", "inception_v3.npz"]
    found = next((Path(c) for c in candidates if c and Path(c).exists()), None)
    if found is not None:
        with np.load(found) as npz:
            flat = dict(npz)  # one read; load_torch_npz consumes the dict
        if "fc.bias" not in flat:
            raise KeyError(
                f"{found}: missing 'fc.bias' — not an InceptionV3 state-dict "
                "npz (expected the cli.convert_inception export layout)")
        n_classes = int(flat["fc.bias"].shape[0])
        fid_variant = n_classes == 1008
        model = InceptionV3(num_classes=n_classes, fid_variant=fid_variant)
        variables = model.init(jax.random.key(42), jnp.zeros((1, 299, 299, 3)))
        variables = load_torch_npz(flat, variables)
        # the loader yields host numpy arrays; put them on device ONCE —
        # the jitted extractor takes variables as an argument, so host
        # leaves would otherwise re-upload the full ~90 MB pytree on
        # every batch call
        variables = jax.tree.map(jnp.asarray, variables)
        source = "pretrained:fid-compat" if fid_variant else "pretrained:torchvision"
    else:
        model = InceptionV3()
        variables = model.init(jax.random.key(42), jnp.zeros((1, 299, 299, 3)))
        source = "random-init"
    _CACHED = (model, variables, source)
    _RUN_CACHE.clear()  # drop any jitted extractor closed over an old model
    _CALIB_CACHE.clear()  # calibrations derive from the old base weights
    return model, variables, source


# Calibration uses at most this many images (taken in canonical order from
# the front of the set): enough for stable per-layer batch statistics while
# bounding memory (a train-mode pass materializes the full 299x299 batch) and
# keeping the calibration INDEPENDENT of the caller's sample count.
_CALIBRATION_CAP = 64

# content-hash -> calibrated variables; bounded, see _calibration_key
_CALIB_CACHE: dict = {}


def _calibration_key(x: np.ndarray) -> str:
    import hashlib

    h = hashlib.sha1(x.tobytes())
    h.update(repr((x.shape, str(x.dtype))).encode())
    return h.hexdigest()


def calibrated_variables(images01) -> dict:
    """Variables with BatchNorm statistics calibrated on ``images01``.

    A freshly-initialized InceptionV3 in frozen-BN mode has mean-0/var-1
    running stats everywhere, so deep activations collapse and FID over its
    features degenerates toward 0.  One train-mode pass with momentum-0 BN
    writes each layer's *actual* batch statistics (over the first
    ``_CALIBRATION_CAP`` images, canonical order) into the frozen stats,
    making the random-feature FID discriminative.

    PURE: the result depends only on (base weights, calibration images) —
    never on what else the process evaluated earlier.  Two recordings of the
    same seeded run therefore produce identical FID/IS columns regardless of
    process history (this replaces a first-caller-wins global calibration
    that made committed golden FIDs unreproducible).  Returns the base
    variables unchanged for pretrained weights.  Results are cached by
    content hash.
    """
    model, variables, source = get_inception()
    if source != "random-init":
        return variables
    x = np.asarray(images01, np.float32)[:_CALIBRATION_CAP]
    if x.shape[-1] == 1:
        x = np.repeat(x, 3, axis=-1)
    key = _calibration_key(x)
    if key in _CALIB_CACHE:
        return _CALIB_CACHE[key]

    # jitted once per (model, input shape) and cached alongside the
    # extractor — callers that calibrate a fresh tracker every eval round
    # (the standalone per-round FID protocol) must not retrace per round
    if "calibrate" not in _RUN_CACHE:
        @jax.jit
        def _calibrate(variables, x):
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
            x = x * 2.0 - 1.0
            return model.apply(variables, x, True, mutable=["batch_stats"])[1]

        _RUN_CACHE["calibrate"] = _calibrate
    mutated = _RUN_CACHE["calibrate"](variables, jnp.asarray(x))
    out = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}
    if len(_CALIB_CACHE) >= 8:  # a run holds at most a couple of trackers
        _CALIB_CACHE.pop(next(iter(_CALIB_CACHE)))
    _CALIB_CACHE[key] = out
    return out


_RUN_CACHE: dict = {}


def _run_fn():
    """Jitted extractor, cached so repeated evals never retrace.

    Takes the variables as an ARGUMENT (not a closure) so one compiled
    executable serves the base weights and every per-tracker calibrated
    variant (same shapes/dtypes -> same program)."""
    if "run" not in _RUN_CACHE:
        model, _, _ = get_inception()

        @jax.jit
        def run(variables, x):
            if x.shape[-1] == 1:
                x = jnp.repeat(x, 3, axis=-1)
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
            x = x * 2.0 - 1.0
            feats, logits = model.apply(variables, x)
            return feats, jax.nn.softmax(logits, axis=-1)

        _RUN_CACHE["run"] = run
    return _RUN_CACHE["run"]


def inception_features(images: jax.Array, batch: Optional[int] = None,
                       variables: Optional[dict] = None,
                       window_bytes: int = 256 << 20,
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Pool features + softmax probs for images in [0, 1], any HxW, 1 or 3 ch.

    Handles the reference's preprocessing: grayscale channel-repeat
    (``server.py:137-138``), resize to 299, and the inception [-1, 1] scaling.
    Short batches are zero-padded to the bucket size so only a handful of
    shapes ever compile; tiny inputs (the reference's 5-sample protocol)
    use an 8-wide bucket (8x less padded compute), mid-size ones 64, and
    standard-protocol-size sets (>=512 images) a 256-wide bucket.

    Batches are DISPATCHED ahead and fetched in few large ``device_get``
    windows: on remote/tunneled runtimes a per-batch fetch costs a full
    round trip, which serialized a 10k-image standard eval into ~160 round
    trips (the same fix as the trainer's batched metrics fetch).  Every
    not-yet-executed batch holds its INPUT buffer in HBM, so the window is
    bounded by input bytes (~256 MB): a CIFAR-sized 10k eval (~123 MB)
    still fetches exactly once, while 128px+ images flush every few
    batches instead of parking GBs of inputs on an 8-16 GB chip.  Outputs
    are small (features + probs, ~125 MB at 10k images).

    ``variables`` selects the weight set (e.g. a tracker's calibrated
    variables from :func:`calibrated_variables`); defaults to the base
    (pretrained or deterministic random-init) weights.
    """
    run = _run_fn()
    if variables is None:
        variables = get_inception()[1]
    n = images.shape[0]
    if batch is None:
        batch = 8 if n <= 8 else (256 if n >= 512 else 64)
    fs, ps = [], []
    outs, takes, pending = [], [], 0

    def _flush():
        nonlocal outs, takes, pending
        for (f, p), take in zip(jax.device_get(outs), takes):
            fs.append(np.asarray(f[:take], np.float64))
            ps.append(np.asarray(p[:take], np.float64))
        outs, takes, pending = [], [], 0

    for s in range(0, n, batch):
        part = images[s : s + batch]
        take = part.shape[0]
        if take < batch:
            pad = np.zeros((batch - take, *part.shape[1:]), part.dtype)
            part = np.concatenate([np.asarray(part), pad])
        outs.append(run(variables, part))  # async dispatch, no sync here
        takes.append(take)
        pending += int(np.prod(part.shape)) * np.dtype(part.dtype).itemsize
        if pending >= window_bytes:
            _flush()
    _flush()
    return np.concatenate(fs), np.concatenate(ps)
