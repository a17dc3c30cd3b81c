"""Forward parity of the ASSEMBLED FID-Inception and I3D graphs.

The converter/roundtrip tests in test_pretrained.py prove naming; these
tests prove the *computation*: torch oracles transcribed independently
from the reference definitions (pytorch_fid/inception.py:16-300 block
structure = torchvision InceptionV3 with FID pool tweaks; kinetics-i3d
sonnet graph used by reference evaluation/metrics/fvd.py:67-126) run the
same random weights as the JAX graphs and must agree elementwise.  Each
test also runs a deliberately mutated oracle (swapped pool type) and
asserts the mismatch is detected — so a mis-padded pool or swapped branch
order in the JAX graph cannot silently pass.

Reduced input sizes (128px / 64px) keep CPU compile time sane while
exercising every block; the pool windows stay >1x1 at the deepest blocks
so pool-type mutations remain observable.  Input resizing (the only
size-dependent stage) is parity-tested separately against
F.interpolate(bilinear, align_corners=False), the reference's resizer
(pytorch_fid/inception.py:144-147, evaluation/metrics/fvd.py:39-56).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Oracle-transcription parity: minutes of torch+XLA compile on this host.
pytestmark = pytest.mark.slow

# 94 (inception) / 59 (i3d) chained conv+BN layers accumulate rounding
# (measured: up to ~1e-3 absolute on O(0.1) activations at f32 — backend
# conv summation orders differ); activations are O(1) by construction (BN
# renormalizes each layer).  A structural mistake (wrong pool/pad/branch)
# shifts activations at the 10-100% level, far above this tolerance — the
# mutation tests below assert exactly that margin.
ATOL = 2e-3 if jax.default_backend() == "cpu" else 1e-2


def _perturb_variables(variables, seed):
    """Randomizes BN params/stats after flax init (init gives scale=1,
    bias=0, mean=0, var=1 — too symmetric to catch BN wiring mistakes)
    while keeping activations O(1)."""
    rng = np.random.default_rng(seed)

    def jitter(path, leaf):
        leaf = np.asarray(leaf)
        name = str(path[-1].key)
        if name in ("scale", "var"):
            return rng.uniform(0.8, 1.2, leaf.shape).astype(np.float32)
        if name in ("bias", "mean"):
            return rng.normal(0.0, 0.05, leaf.shape).astype(np.float32)
        return leaf  # conv kernels keep flax lecun_normal init

    return jax.tree_util.tree_map_with_path(jitter, dict(variables))


# --------------------------------------------------------------------- #
# torch oracle: FID InceptionV3 (transcribed from pytorch_fid)          #
# --------------------------------------------------------------------- #


def _t(x):
    import torch

    return torch.tensor(np.asarray(x, np.float32))


def _t_basic_conv(x, p, s, stride=1, padding=0):
    """BasicConv2d: conv(bias=False) + BN(eps=1e-3) + relu
    (torchvision inception BasicConv2d, used throughout pytorch_fid)."""
    import torch.nn.functional as F

    w = _t(np.transpose(p["conv"]["kernel"], (3, 2, 0, 1)))
    x = F.conv2d(x, w, stride=stride, padding=padding)
    x = F.batch_norm(x, _t(s["bn"]["mean"]), _t(s["bn"]["var"]),
                     _t(p["bn"]["scale"]), _t(p["bn"]["bias"]),
                     training=False, eps=1e-3)
    return F.relu(x)


def _t_inception_a(x, p, s, pool="avg"):
    import torch
    import torch.nn.functional as F

    b1 = _t_basic_conv(x, p["branch1x1"], s["branch1x1"])
    b5 = _t_basic_conv(x, p["branch5x5_1"], s["branch5x5_1"])
    b5 = _t_basic_conv(b5, p["branch5x5_2"], s["branch5x5_2"], padding=2)
    bd = _t_basic_conv(x, p["branch3x3dbl_1"], s["branch3x3dbl_1"])
    bd = _t_basic_conv(bd, p["branch3x3dbl_2"], s["branch3x3dbl_2"], padding=1)
    bd = _t_basic_conv(bd, p["branch3x3dbl_3"], s["branch3x3dbl_3"], padding=1)
    if pool == "avg":  # FID tweak: count_include_pad=False (inception.py:222)
        bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
    else:
        bp = F.max_pool2d(x, 3, stride=1, padding=1)
    bp = _t_basic_conv(bp, p["branch_pool"], s["branch_pool"])
    return torch.cat([b1, b5, bd, bp], 1)


def _t_inception_b(x, p, s):
    import torch
    import torch.nn.functional as F

    b3 = _t_basic_conv(x, p["branch3x3"], s["branch3x3"], stride=2)
    bd = _t_basic_conv(x, p["branch3x3dbl_1"], s["branch3x3dbl_1"])
    bd = _t_basic_conv(bd, p["branch3x3dbl_2"], s["branch3x3dbl_2"], padding=1)
    bd = _t_basic_conv(bd, p["branch3x3dbl_3"], s["branch3x3dbl_3"], stride=2)
    return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)


def _t_inception_c(x, p, s):
    import torch
    import torch.nn.functional as F

    b1 = _t_basic_conv(x, p["branch1x1"], s["branch1x1"])
    b7 = _t_basic_conv(x, p["branch7x7_1"], s["branch7x7_1"])
    b7 = _t_basic_conv(b7, p["branch7x7_2"], s["branch7x7_2"], padding=(0, 3))
    b7 = _t_basic_conv(b7, p["branch7x7_3"], s["branch7x7_3"], padding=(3, 0))
    bd = _t_basic_conv(x, p["branch7x7dbl_1"], s["branch7x7dbl_1"])
    bd = _t_basic_conv(bd, p["branch7x7dbl_2"], s["branch7x7dbl_2"], padding=(3, 0))
    bd = _t_basic_conv(bd, p["branch7x7dbl_3"], s["branch7x7dbl_3"], padding=(0, 3))
    bd = _t_basic_conv(bd, p["branch7x7dbl_4"], s["branch7x7dbl_4"], padding=(3, 0))
    bd = _t_basic_conv(bd, p["branch7x7dbl_5"], s["branch7x7dbl_5"], padding=(0, 3))
    bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
    bp = _t_basic_conv(bp, p["branch_pool"], s["branch_pool"])
    return torch.cat([b1, b7, bd, bp], 1)


def _t_inception_d(x, p, s):
    import torch
    import torch.nn.functional as F

    b3 = _t_basic_conv(x, p["branch3x3_1"], s["branch3x3_1"])
    b3 = _t_basic_conv(b3, p["branch3x3_2"], s["branch3x3_2"], stride=2)
    b7 = _t_basic_conv(x, p["branch7x7x3_1"], s["branch7x7x3_1"])
    b7 = _t_basic_conv(b7, p["branch7x7x3_2"], s["branch7x7x3_2"], padding=(0, 3))
    b7 = _t_basic_conv(b7, p["branch7x7x3_3"], s["branch7x7x3_3"], padding=(3, 0))
    b7 = _t_basic_conv(b7, p["branch7x7x3_4"], s["branch7x7x3_4"], stride=2)
    return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


def _t_inception_e(x, p, s, pool):
    import torch
    import torch.nn.functional as F

    b1 = _t_basic_conv(x, p["branch1x1"], s["branch1x1"])
    b3 = _t_basic_conv(x, p["branch3x3_1"], s["branch3x3_1"])
    b3 = torch.cat([
        _t_basic_conv(b3, p["branch3x3_2a"], s["branch3x3_2a"], padding=(0, 1)),
        _t_basic_conv(b3, p["branch3x3_2b"], s["branch3x3_2b"], padding=(1, 0)),
    ], 1)
    bd = _t_basic_conv(x, p["branch3x3dbl_1"], s["branch3x3dbl_1"])
    bd = _t_basic_conv(bd, p["branch3x3dbl_2"], s["branch3x3dbl_2"], padding=1)
    bd = torch.cat([
        _t_basic_conv(bd, p["branch3x3dbl_3a"], s["branch3x3dbl_3a"], padding=(0, 1)),
        _t_basic_conv(bd, p["branch3x3dbl_3b"], s["branch3x3dbl_3b"], padding=(1, 0)),
    ], 1)
    if pool == "avg":   # FIDInceptionE_1 (pytorch_fid inception.py:283)
        bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
    else:               # FIDInceptionE_2 (pytorch_fid inception.py:318)
        bp = F.max_pool2d(x, 3, stride=1, padding=1)
    bp = _t_basic_conv(bp, p["branch_pool"], s["branch_pool"])
    return torch.cat([b1, b3, bd, bp], 1)


def _torch_fid_inception(x_nhwc, variables, mutate=None):
    """Full pytorch_fid forward (blocks 0-3) from torch primitives,
    returning every Mixed-block output plus the pool3 vector — per-block
    comparison means an early-block error cannot attenuate to the noise
    floor by pool3 (measured: a Mixed_5b pool swap is invisible at pool3
    but obvious at the Mixed_5b output).  `mutate` swaps one pool type to
    prove test sensitivity."""
    import torch
    import torch.nn.functional as F

    p, s = variables["params"], variables["batch_stats"]
    x = _t(np.transpose(x_nhwc, (0, 3, 1, 2)))
    taps = {}
    with torch.no_grad():
        # resize_input (identity at the test size) + normalize_input to
        # [-1, 1] (pytorch_fid inception.py:143-150)
        x = F.interpolate(x, size=x.shape[2:], mode="bilinear",
                          align_corners=False)
        x = 2.0 * x - 1.0
        # Block 0 (pytorch_fid inception.py:83-90)
        x = _t_basic_conv(x, p["Conv2d_1a_3x3"], s["Conv2d_1a_3x3"], stride=2)
        x = _t_basic_conv(x, p["Conv2d_2a_3x3"], s["Conv2d_2a_3x3"])
        x = _t_basic_conv(x, p["Conv2d_2b_3x3"], s["Conv2d_2b_3x3"], padding=1)
        x = F.max_pool2d(x, 3, stride=2)
        # Block 1 (inception.py:92-98)
        x = _t_basic_conv(x, p["Conv2d_3b_1x1"], s["Conv2d_3b_1x1"])
        x = _t_basic_conv(x, p["Conv2d_4a_3x3"], s["Conv2d_4a_3x3"])
        x = F.max_pool2d(x, 3, stride=2)
        # Block 2 (inception.py:101-110)
        a_pool = "max" if mutate == "a_pool" else "avg"
        x = taps["Mixed_5b"] = _t_inception_a(x, p["Mixed_5b"], s["Mixed_5b"],
                                              pool=a_pool)
        x = taps["Mixed_5c"] = _t_inception_a(x, p["Mixed_5c"], s["Mixed_5c"])
        x = taps["Mixed_5d"] = _t_inception_a(x, p["Mixed_5d"], s["Mixed_5d"])
        x = taps["Mixed_6a"] = _t_inception_b(x, p["Mixed_6a"], s["Mixed_6a"])
        x = taps["Mixed_6b"] = _t_inception_c(x, p["Mixed_6b"], s["Mixed_6b"])
        x = taps["Mixed_6c"] = _t_inception_c(x, p["Mixed_6c"], s["Mixed_6c"])
        x = taps["Mixed_6d"] = _t_inception_c(x, p["Mixed_6d"], s["Mixed_6d"])
        x = taps["Mixed_6e"] = _t_inception_c(x, p["Mixed_6e"], s["Mixed_6e"])
        # Block 3 (inception.py:113-123): 7b avg (E_1), 7c max (E_2)
        x = taps["Mixed_7a"] = _t_inception_d(x, p["Mixed_7a"], s["Mixed_7a"])
        pools = ("max", "avg") if mutate == "e_pool" else ("avg", "max")
        x = taps["Mixed_7b"] = _t_inception_e(x, p["Mixed_7b"], s["Mixed_7b"],
                                              pool=pools[0])
        x = taps["Mixed_7c"] = _t_inception_e(x, p["Mixed_7c"], s["Mixed_7c"],
                                              pool=pools[1])
        x = F.adaptive_avg_pool2d(x, (1, 1))
    taps = {k: np.transpose(v.numpy(), (0, 2, 3, 1)) for k, v in taps.items()}
    taps["pool3"] = x.numpy().reshape(x.shape[0], -1)
    return taps


def _capture_mixed(model, variables, x):
    """apply() with every top-level Mixed_* block output captured, plus
    the final output."""
    out, state = model.apply(
        variables, x, capture_intermediates=lambda mdl, method: (
            method == "__call__" and mdl.name is not None
            and mdl.name.startswith("Mixed")))
    taps = {name: np.asarray(v["__call__"][0])
            for name, v in state["intermediates"].items()}
    return np.asarray(out), taps


def _assert_tap_parity(got_taps, want_taps, where=""):
    for name, want in want_taps.items():
        got = got_taps[name]
        assert got.shape == want.shape, name
        scale = float(np.abs(want).max())
        assert np.isfinite(scale) and scale > 1e-3, name  # non-degenerate
        np.testing.assert_allclose(
            got, want, atol=ATOL * max(scale, 0.1), rtol=5e-3,
            err_msg=f"{where}{name}")


@pytest.fixture(scope="module")
def inception_case():
    from playablevideogeneration_tpu.evaluation.metrics.inception import (
        InceptionV3FID,
    )

    size = 128  # deepest blocks at 2x2: pool mutations stay observable
    model = InceptionV3FID(input_size=size)
    variables = _perturb_variables(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))), 11)
    x = np.random.default_rng(2).uniform(
        0, 1, (2, size, size, 3)).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        out, taps = _capture_mixed(model, variables, jnp.asarray(x))
    taps["pool3"] = out
    return variables, x, taps


def test_fid_inception_full_graph_matches_torch(inception_case):
    variables, x, got_taps = inception_case
    want_taps = _torch_fid_inception(x, variables)
    assert got_taps["pool3"].shape == want_taps["pool3"].shape == (2, 2048)
    assert set(want_taps) <= set(got_taps)  # all 11 Mixed blocks + pool3
    assert len(want_taps) == 12
    _assert_tap_parity(got_taps, want_taps)


@pytest.mark.parametrize("mutate,block", [("a_pool", "Mixed_5b"),
                                          ("e_pool", "Mixed_7b")])
def test_fid_inception_catches_pool_mutations(inception_case, mutate, block):
    """Swapping avg<->max in Mixed_5b or Mixed_7b/7c must fail the
    per-block tolerance above at the mutated block — proves the parity
    test has teeth at every depth."""
    variables, x, got_taps = inception_case
    mutated = _torch_fid_inception(x, variables, mutate=mutate)[block]
    scale = float(np.abs(mutated).max())
    assert np.abs(got_taps[block] - mutated).max() > 20 * ATOL * max(scale, 0.1)


# --------------------------------------------------------------------- #
# torch oracle: I3D (transcribed from kinetics-i3d / sonnet)            #
# --------------------------------------------------------------------- #


def _pad_same_3d(x, kernel, strides, value=0.0):
    """TF 'SAME' padding for NCDHW torch tensors (sonnet snt.Conv3D and
    tf.nn.max_pool3d semantics: total = max((ceil(n/s)-1)*s + k - n, 0),
    split low-first)."""
    import torch.nn.functional as F

    pads = []  # F.pad wants last-dim-first: (Wlo, Whi, Hlo, Hhi, Dlo, Dhi)
    for dim, k, s_ in zip((4, 3, 2), reversed(kernel), reversed(strides)):
        n = x.shape[dim]
        out = -(-n // s_)
        total = max((out - 1) * s_ + k - n, 0)
        pads.extend([total // 2, total - total // 2])
    # strides were reversed above to match F.pad's W,H,D order
    return F.pad(x, pads, value=value)


def _t_unit3d(x, p, s, kernel, strides=(1, 1, 1)):
    """sonnet Unit3D: SAME conv3d (no bias) + BN(scale=False, eps=1e-3)
    + relu (kinetics-i3d i3d.py Unit3D, referenced via fvd.py:67-126)."""
    import torch.nn.functional as F

    w = _t(np.transpose(p["conv3d"]["kernel"], (4, 3, 0, 1, 2)))  # DHWIO->OIDHW
    x = F.conv3d(_pad_same_3d(x, kernel, strides), w, stride=strides)
    x = F.batch_norm(x, _t(s["bn"]["mean"]), _t(s["bn"]["var"]),
                     None, _t(p["bn"]["bias"]), training=False, eps=1e-3)
    return F.relu(x)


def _t_max_pool_same_3d(x, kernel, strides):
    import torch.nn.functional as F

    return F.max_pool3d(_pad_same_3d(x, kernel, strides, value=-np.inf),
                        kernel, stride=strides)


def _t_inception_module(x, p, s, branch3_pool="max"):
    import torch

    b0 = _t_unit3d(x, p["Branch_0"], s["Branch_0"], (1, 1, 1))
    b1 = _t_unit3d(x, p["Branch_1a"], s["Branch_1a"], (1, 1, 1))
    b1 = _t_unit3d(b1, p["Branch_1b"], s["Branch_1b"], (3, 3, 3))
    b2 = _t_unit3d(x, p["Branch_2a"], s["Branch_2a"], (1, 1, 1))
    b2 = _t_unit3d(b2, p["Branch_2b"], s["Branch_2b"], (3, 3, 3))
    if branch3_pool == "max":
        b3 = _t_max_pool_same_3d(x, (3, 3, 3), (1, 1, 1))
    else:  # mutation: avg pool instead of the reference's max pool
        import torch.nn.functional as F

        b3 = F.avg_pool3d(_pad_same_3d(x, (3, 3, 3), (1, 1, 1)),
                          (3, 3, 3), stride=(1, 1, 1))
    b3 = _t_unit3d(b3, p["Branch_3b"], s["Branch_3b"], (1, 1, 1))
    return torch.cat([b0, b1, b2, b3], 1)


def _torch_i3d(videos_ntHWC, variables, mutate=None):
    """Full kinetics-i3d forward to the FVD embedding (the averaged 400-dim
    logits, reference fvd.py:118-126) from torch primitives, NCDHW.
    Returns per-Mixed-block taps (NTHWC) plus the final 'logits'."""
    import torch
    import torch.nn.functional as F

    p, s = variables["params"], variables["batch_stats"]
    x = _t(np.transpose(videos_ntHWC, (0, 4, 1, 2, 3)))  # NTHWC -> NCDHW
    x = 2.0 * x - 1.0  # fvd.py:39-56 preprocessing
    taps = {}
    with torch.no_grad():
        x = _t_unit3d(x, p["Conv3d_1a_7x7"], s["Conv3d_1a_7x7"],
                      (7, 7, 7), (2, 2, 2))
        x = _t_max_pool_same_3d(x, (1, 3, 3), (1, 2, 2))
        x = _t_unit3d(x, p["Conv3d_2b_1x1"], s["Conv3d_2b_1x1"], (1, 1, 1))
        x = _t_unit3d(x, p["Conv3d_2c_3x3"], s["Conv3d_2c_3x3"], (3, 3, 3))
        x = _t_max_pool_same_3d(x, (1, 3, 3), (1, 2, 2))
        pool3b = "avg" if mutate == "branch3_pool" else "max"
        x = taps["Mixed_3b"] = _t_inception_module(x, p["Mixed_3b"],
                                                   s["Mixed_3b"], pool3b)
        x = taps["Mixed_3c"] = _t_inception_module(x, p["Mixed_3c"], s["Mixed_3c"])
        x = _t_max_pool_same_3d(x, (3, 3, 3), (2, 2, 2))
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = taps[name] = _t_inception_module(x, p[name], s[name])
        x = _t_max_pool_same_3d(x, (2, 2, 2), (2, 2, 2))
        x = taps["Mixed_5b"] = _t_inception_module(x, p["Mixed_5b"], s["Mixed_5b"])
        x = taps["Mixed_5c"] = _t_inception_module(x, p["Mixed_5c"], s["Mixed_5c"])
        # Logits head: avg_pool (2, full, full) stride 1 VALID, 1x1x1 conv
        # with bias, mean over remaining dims (fvd.py:118-126; the (2,7,7)
        # window equals the full 7x7 map at the reference's 224 input).
        tw = min(2, x.shape[2])
        x = F.avg_pool3d(x, (tw, x.shape[3], x.shape[4]), stride=(1, 1, 1))
        w = _t(np.transpose(p["Logits_Conv3d_0c_1x1"]["kernel"], (4, 3, 0, 1, 2)))
        x = F.conv3d(x, w, bias=_t(p["Logits_Conv3d_0c_1x1"]["bias"]))
        x = x.mean(dim=(2, 3, 4))
    taps = {k: np.transpose(v.numpy(), (0, 2, 3, 4, 1)) for k, v in taps.items()}
    taps["logits"] = x.numpy()
    return taps


@pytest.fixture(scope="module")
def i3d_case():
    from playablevideogeneration_tpu.evaluation.metrics.i3d import (
        I3D,
        random_i3d_variables,
    )

    size, frames = 64, 8  # Mixed_5x at 2x2x2: pool mutations observable
    variables = _perturb_variables(
        random_i3d_variables(jax.random.PRNGKey(3), frames=frames,
                             input_size=size), 13)
    videos = np.random.default_rng(5).uniform(
        0, 1, (1, frames, size, size, 3)).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        out, taps = _capture_mixed(I3D(input_size=size), variables,
                                   jnp.asarray(videos))
    taps["logits"] = out
    return variables, videos, taps


def test_i3d_full_graph_matches_torch(i3d_case):
    variables, videos, got_taps = i3d_case
    want_taps = _torch_i3d(videos, variables)
    assert got_taps["logits"].shape == want_taps["logits"].shape == (1, 400)
    assert set(want_taps) <= set(got_taps)  # all 9 Mixed blocks + logits
    assert len(want_taps) == 10
    _assert_tap_parity(got_taps, want_taps, where="i3d:")


def test_i3d_catches_pool_mutation(i3d_case):
    """avg instead of max in Mixed_3b's pool branch must break per-block
    parity at Mixed_3b."""
    variables, videos, got_taps = i3d_case
    mutated = _torch_i3d(videos, variables, mutate="branch3_pool")["Mixed_3b"]
    scale = float(np.abs(mutated).max())
    assert np.abs(got_taps["Mixed_3b"] - mutated).max() > 20 * ATOL * max(scale, 0.1)


# --------------------------------------------------------------------- #
# Input resizing parity (the stage the reduced-size tests bypass)       #
# --------------------------------------------------------------------- #


def test_upsample_resize_matches_torch_bilinear():
    """jax.image.resize(linear) vs F.interpolate(bilinear,
    align_corners=False) — the reference's resize-to-299/224 path
    (pytorch_fid inception.py:144-147, fvd.py:39-56).  Frames are always
    upsampled (dataset resolutions <= 256), where the two agree."""
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(6).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(jax.image.resize(jnp.asarray(x), (2, 299, 299, 3),
                                      method="linear"))
    want = F.interpolate(_t(np.transpose(x, (0, 3, 1, 2))), size=(299, 299),
                         mode="bilinear", align_corners=False).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)),
                               atol=1e-5, rtol=1e-5)
