"""Forward-parity tests for the ASSEMBLED FID-Inception and I3D graphs.

The VGG19 backbone has a whole-network numerical parity test
(test_pretrained.py); this file gives the other two pretrained backbones
the same treatment: torch clones of the reference computations are built
from torch.nn primitives (torchvision is not installed; the clones follow
/root/reference/pytorch_fid/inception.py:16-300 and the kinetics-i3d graph
the reference FVD embeds, /root/reference/evaluation/metrics/fvd.py:67-126),
their random weights flow through the real converters, and activations are
compared block-by-block AND through the full graphs.  A mutation test per
backbone proves the comparison is tight enough to catch a swapped pool
type.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from playablevideogeneration_tpu.evaluation.metrics import i3d as i3d_lib
from playablevideogeneration_tpu.evaluation.metrics import inception as inc_lib

ATOL = 1e-3  # f32 conv stacks on CPU, highest precision
RTOL = 1e-3


def _seed_all(n):
    torch.manual_seed(n)
    return np.random.default_rng(n)


def _randomize_bn(module):
    """Random running stats + affine so BN misuse cannot hide."""
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            if m.weight is not None:
                m.weight.data.uniform_(0.5, 1.5)
            if m.bias is not None:
                m.bias.data.normal_(0, 0.5)


# ===================================================================== #
# FID InceptionV3: torch clone (pytorch_fid/inception.py:16-300)        #
# ===================================================================== #


class BasicConv2d(tnn.Module):
    def __init__(self, in_ch, out_ch, **conv_kw):
        super().__init__()
        self.conv = tnn.Conv2d(in_ch, out_ch, bias=False, **conv_kw)
        self.bn = tnn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _fid_avg_pool(x):
    return F.avg_pool2d(x, kernel_size=3, stride=1, padding=1,
                        count_include_pad=False)


class TInceptionA(tnn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_fid_avg_pool(x))
        return torch.cat([b1, b5, b3, bp], 1)


class TInceptionB(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = BasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class TInceptionC(tnn.Module):
    def __init__(self, in_ch, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(_fid_avg_pool(x))
        return torch.cat([b1, b7, bd, bp], 1)


class TInceptionD(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class TInceptionE(tnn.Module):
    """use_max_pool=True is the reference FIDInceptionE_2 (max branch_pool,
    pytorch_fid/inception.py:291-322); False is FIDInceptionE_1 (avg with
    count_include_pad=False, lines 258-289)."""

    def __init__(self, in_ch, use_max_pool):
        super().__init__()
        self.use_max_pool = use_max_pool
        self.branch1x1 = BasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.use_max_pool:
            bp = F.max_pool2d(x, kernel_size=3, stride=1, padding=1)
        else:
            bp = _fid_avg_pool(x)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class TorchFIDInception(tnn.Module):
    """Full FID InceptionV3 (pool3 features + fc head) from primitives."""

    def __init__(self, num_classes=1008):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, use_max_pool=False)
        self.Mixed_7c = TInceptionE(2048, use_max_pool=True)
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(x)))
        x = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(
            self.Mixed_6a(x)))))
        x = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(x)))
        features = torch.flatten(F.adaptive_avg_pool2d(x, 1), 1)
        return features, F.softmax(self.fc(features), dim=1)


def _convert_wrapped(torch_module, name):
    """state_dict of a block wrapped under `name` -> converted subtree."""
    wrapper = tnn.Module()
    wrapper.add_module(name, torch_module)
    state = {k: v.numpy() for k, v in wrapper.state_dict().items()
             if "num_batches_tracked" not in k}
    converted = inc_lib.convert_torch_inception(state)
    return {"params": converted["params"][name],
            "batch_stats": converted["batch_stats"][name]}


INCEPTION_BLOCKS = [
    # (jax block, torch block factory, in_ch, spatial) at real graph sizes
    ("A_5b", lambda: inc_lib.InceptionA(32), lambda: TInceptionA(192, 32),
     192, 35),
    ("B_6a", lambda: inc_lib.InceptionB(), lambda: TInceptionB(288), 288, 35),
    ("C_6b", lambda: inc_lib.InceptionC(128), lambda: TInceptionC(768, 128),
     768, 17),
    ("D_7a", lambda: inc_lib.InceptionD(), lambda: TInceptionD(768), 768, 17),
    ("E_7b_avg", lambda: inc_lib.InceptionE(use_max_pool=False),
     lambda: TInceptionE(1280, use_max_pool=False), 1280, 8),
    ("E_7c_max", lambda: inc_lib.InceptionE(use_max_pool=True),
     lambda: TInceptionE(2048, use_max_pool=True), 2048, 8),
]


@pytest.mark.parametrize("name,jax_block,torch_block,in_ch,size",
                         INCEPTION_BLOCKS, ids=[b[0] for b in INCEPTION_BLOCKS])
def test_inception_block_forward_parity(name, jax_block, torch_block,
                                        in_ch, size):
    rng = _seed_all(11)
    tblock = torch_block().eval()
    _randomize_bn(tblock)
    variables = _convert_wrapped(tblock, "Mixed_X")

    x = rng.normal(size=(2, size, size, in_ch)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tblock(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(jax_block().apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)),
                               atol=ATOL, rtol=RTOL)


def test_inception_full_graph_forward_parity():
    """Whole assembled graph, stem through pool3 + classifier head, with
    shared random weights through the real converter.  Input fed at the
    graph's native resolution (resize becomes identity; resize parity is
    its own test below)."""
    rng = _seed_all(12)
    net = TorchFIDInception(num_classes=11).eval()
    _randomize_bn(net)
    state = {k: v.numpy() for k, v in net.state_dict().items()
             if "num_batches_tracked" not in k}
    variables = inc_lib.convert_torch_inception(state)

    size = 96  # every layer exercised; 10x cheaper than 299
    x = rng.uniform(0, 1, (2, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        want_feats, want_probs = net(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))) * 2.0 - 1.0)

    model = inc_lib.InceptionV3FID(input_size=size)
    backbone = {"params": {k: v for k, v in variables["params"].items()
                           if k != "fc"},
                "batch_stats": variables["batch_stats"]}
    with jax.default_matmul_precision("highest"):
        got_feats = np.asarray(model.apply(backbone, jnp.asarray(x)))
        kernel = jnp.asarray(variables["params"]["fc"]["kernel"])
        bias = jnp.asarray(variables["params"]["fc"]["bias"])
        got_probs = np.asarray(jax.nn.softmax(
            jnp.asarray(got_feats) @ kernel + bias, axis=-1))

    np.testing.assert_allclose(got_feats, want_feats.numpy(),
                               atol=5e-3, rtol=1e-2)  # 17 conv-BN layers deep
    np.testing.assert_allclose(got_probs, want_probs.numpy(), atol=1e-3)


def test_inception_resize_matches_torch_bilinear():
    """pytorch_fid resizes inputs to 299x299 with bilinear
    align_corners=False; jax.image.resize 'linear' must match on the
    upscaling path every real frame takes (<=256px -> 299)."""
    rng = _seed_all(13)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    want = F.interpolate(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                         size=(299, 299), mode="bilinear",
                         align_corners=False).numpy()
    got = np.asarray(jax.image.resize(jnp.asarray(x), (2, 299, 299, 3),
                                      method="linear"))
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)),
                               atol=1e-5, rtol=1e-5)


def test_inception_parity_catches_swapped_pool_type():
    """Sensitivity check: comparing the JAX E-block in max-pool mode against
    the torch E-block in avg-pool mode MUST fail — proves the block parity
    test can catch exactly the class of bug it exists for."""
    rng = _seed_all(14)
    tblock = TInceptionE(1280, use_max_pool=False).eval()
    _randomize_bn(tblock)
    variables = _convert_wrapped(tblock, "Mixed_X")
    x = rng.normal(size=(1, 8, 8, 1280)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tblock(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    mutated = np.asarray(inc_lib.InceptionE(use_max_pool=True).apply(
        variables, jnp.asarray(x)))
    assert not np.allclose(mutated, np.transpose(want, (0, 2, 3, 1)),
                           atol=ATOL, rtol=RTOL)


# ===================================================================== #
# I3D: torch clone with TF-SAME padding (kinetics-i3d graph; the        #
# reference embeds RGB/inception_i3d/Mean:0, fvd.py:67-126)             #
# ===================================================================== #


def _same_pad_3d(x, kernel, stride):
    """TF/XLA 'SAME' asymmetric padding (extra on the high side)."""
    pads = []
    for dim, (k, s) in zip((2, 3, 4), zip(kernel, stride)):
        n = x.shape[dim]
        total = max((-(-n // s) - 1) * s + k - n, 0)
        pads.append((total // 2, total - total // 2))
    (dl, dr), (hl, hr), (wl, wr) = pads
    return F.pad(x, (wl, wr, hl, hr, dl, dr))


def _same_max_pool_3d(x, kernel, stride):
    pads = []
    for dim, (k, s) in zip((2, 3, 4), zip(kernel, stride)):
        n = x.shape[dim]
        total = max((-(-n // s) - 1) * s + k - n, 0)
        pads.append((total // 2, total - total // 2))
    (dl, dr), (hl, hr), (wl, wr) = pads
    x = F.pad(x, (wl, wr, hl, hr, dl, dr), value=float("-inf"))
    return F.max_pool3d(x, kernel, stride)


class TUnit3D(tnn.Module):
    """conv3d(SAME, no bias) + BN(beta only, eps 1e-3) + relu."""

    def __init__(self, in_ch, out_ch, kernel=(1, 1, 1), stride=(1, 1, 1)):
        super().__init__()
        self.kernel, self.stride = kernel, stride
        self.conv = tnn.Conv3d(in_ch, out_ch, kernel, stride, bias=False)
        self.bn = tnn.BatchNorm3d(out_ch, eps=1e-3)
        self.bn.weight.data.fill_(1.0)  # sonnet BN: scale disabled

    def forward(self, x):
        return F.relu(self.bn(self.conv(_same_pad_3d(
            x, self.kernel, self.stride))))


class TInceptionModule3D(tnn.Module):
    def __init__(self, in_ch, b0, b1a, b1b, b2a, b2b, b3b):
        super().__init__()
        self.b0 = TUnit3D(in_ch, b0)
        self.b1a = TUnit3D(in_ch, b1a)
        self.b1b = TUnit3D(b1a, b1b, (3, 3, 3))
        self.b2a = TUnit3D(in_ch, b2a)
        self.b2b = TUnit3D(b2a, b2b, (3, 3, 3))
        self.b3b = TUnit3D(in_ch, b3b)

    def forward(self, x):
        br0 = self.b0(x)
        br1 = self.b1b(self.b1a(x))
        br2 = self.b2b(self.b2a(x))
        br3 = self.b3b(_same_max_pool_3d(x, (3, 3, 3), (1, 1, 1)))
        return torch.cat([br0, br1, br2, br3], 1)


class TorchI3D(tnn.Module):
    MIXED = {
        "Mixed_3b": (192, 64, 96, 128, 16, 32, 32),
        "Mixed_3c": (256, 128, 128, 192, 32, 96, 64),
        "Mixed_4b": (480, 192, 96, 208, 16, 48, 64),
        "Mixed_4c": (512, 160, 112, 224, 24, 64, 64),
        "Mixed_4d": (512, 128, 128, 256, 24, 64, 64),
        "Mixed_4e": (512, 112, 144, 288, 32, 64, 64),
        "Mixed_4f": (528, 256, 160, 320, 32, 128, 128),
        "Mixed_5b": (832, 256, 160, 320, 32, 128, 128),
        "Mixed_5c": (832, 384, 192, 384, 48, 128, 128),
    }

    def __init__(self):
        super().__init__()
        self.Conv3d_1a_7x7 = TUnit3D(3, 64, (7, 7, 7), (2, 2, 2))
        self.Conv3d_2b_1x1 = TUnit3D(64, 64)
        self.Conv3d_2c_3x3 = TUnit3D(64, 192, (3, 3, 3))
        for name, chans in self.MIXED.items():
            self.add_module(name, TInceptionModule3D(*chans))
        self.logits = tnn.Conv3d(1024, 400, (1, 1, 1), bias=True)

    def forward(self, x):
        x = self.Conv3d_1a_7x7(x)
        x = _same_max_pool_3d(x, (1, 3, 3), (1, 2, 2))
        x = self.Conv3d_2c_3x3(self.Conv3d_2b_1x1(x))
        x = _same_max_pool_3d(x, (1, 3, 3), (1, 2, 2))
        x = self.Mixed_3c(self.Mixed_3b(x))
        x = _same_max_pool_3d(x, (3, 3, 3), (2, 2, 2))
        x = self.Mixed_4f(self.Mixed_4e(self.Mixed_4d(self.Mixed_4c(
            self.Mixed_4b(x)))))
        x = _same_max_pool_3d(x, (2, 2, 2), (2, 2, 2))
        x = self.Mixed_5c(self.Mixed_5b(x))
        tw = min(2, x.shape[2])
        x = F.avg_pool3d(x, (tw, x.shape[3], x.shape[4]), stride=1)
        x = self.logits(x)
        return x.mean(dim=(2, 3, 4))  # (N, 400) averaged kinetics logits


_TORCH_BRANCH_TO_TF = {
    "b0": ("Branch_0", "Conv3d_0a_1x1"),
    "b1a": ("Branch_1", "Conv3d_0a_1x1"),
    "b1b": ("Branch_1", "Conv3d_0b_3x3"),
    "b2a": ("Branch_2", "Conv3d_0a_1x1"),
    "b2b": ("Branch_2", "Conv3d_0b_3x3"),
    "b3b": ("Branch_3", "Conv3d_0b_1x1"),
}


def _unit_tf_vars(unit: TUnit3D, scope: str) -> dict:
    # torch Conv3d kernels are (O, I, D, H, W); TF stores DHWIO.
    return {
        f"{scope}/conv_3d/w": np.transpose(
            unit.conv.weight.detach().numpy(), (2, 3, 4, 1, 0)),
        f"{scope}/batch_norm/beta": unit.bn.bias.detach().numpy(),
        f"{scope}/batch_norm/moving_mean": unit.bn.running_mean.numpy(),
        f"{scope}/batch_norm/moving_variance": unit.bn.running_var.numpy(),
    }


def _i3d_tf_vars(net: TorchI3D) -> dict:
    """TF-Hub-style variable dict from the torch clone's tensors — the
    input format convert_tf_i3d consumes."""
    root = "RGB/inception_i3d"
    out = {}
    for stem in ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"):
        out.update(_unit_tf_vars(getattr(net, stem), f"{root}/{stem}"))
    for mixed in TorchI3D.MIXED:
        module = getattr(net, mixed)
        for attr, (branch, conv_name) in _TORCH_BRANCH_TO_TF.items():
            out.update(_unit_tf_vars(
                getattr(module, attr), f"{root}/{mixed}/{branch}/{conv_name}"))
    out[f"{root}/Logits/Conv3d_0c_1x1/conv_3d/w"] = np.transpose(
        net.logits.weight.detach().numpy(), (2, 3, 4, 1, 0))
    out[f"{root}/Logits/Conv3d_0c_1x1/conv_3d/b"] = \
        net.logits.bias.detach().numpy()
    return out


def test_i3d_stem_unit_same_padding_parity():
    """The 7x7x7 stride-2 stem conv is where TF-SAME asymmetric padding
    bites hardest; verify the unit in isolation."""
    rng = _seed_all(21)
    unit = TUnit3D(3, 8, (7, 7, 7), (2, 2, 2)).eval()
    _randomize_bn(unit)
    unit.bn.weight.data.fill_(1.0)  # re-pin after randomization
    tf_vars = _unit_tf_vars(unit, "RGB/inception_i3d/Conv3d_1a_7x7")
    converted = i3d_lib.convert_tf_i3d(tf_vars)
    variables = {"params": converted["params"]["Conv3d_1a_7x7"],
                 "batch_stats": converted["batch_stats"]["Conv3d_1a_7x7"]}

    x = rng.normal(size=(1, 9, 20, 20, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = unit(torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(i3d_lib.Unit3D(8, (7, 7, 7), (2, 2, 2)).apply(
            variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 4, 1)),
                               atol=ATOL, rtol=RTOL)


def test_i3d_inception_module_forward_parity():
    rng = _seed_all(22)
    tmod = TInceptionModule3D(*TorchI3D.MIXED["Mixed_3b"]).eval()
    _randomize_bn(tmod)
    for m in tmod.modules():
        if isinstance(m, tnn.BatchNorm3d):
            m.weight.data.fill_(1.0)
    tf_vars = {}
    for attr, (branch, conv_name) in _TORCH_BRANCH_TO_TF.items():
        tf_vars.update(_unit_tf_vars(
            getattr(tmod, attr),
            f"RGB/inception_i3d/Mixed_3b/{branch}/{conv_name}"))
    converted = i3d_lib.convert_tf_i3d(tf_vars)
    variables = {"params": converted["params"]["Mixed_3b"],
                 "batch_stats": converted["batch_stats"]["Mixed_3b"]}

    x = rng.normal(size=(1, 4, 14, 14, 192)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tmod(torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(i3d_lib.InceptionModule(
            64, 96, 128, 16, 32, 32).apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 4, 1)),
                               atol=ATOL, rtol=RTOL)


def test_i3d_full_graph_forward_parity():
    """Whole assembled I3D through the real converter: stem, all 9 mixed
    blocks, every SAME pool, and the averaged-logits head the reference
    FVD embeds (fvd.py:118-126)."""
    rng = _seed_all(23)
    net = TorchI3D().eval()
    _randomize_bn(net)
    for m in net.modules():
        if isinstance(m, tnn.BatchNorm3d):
            m.weight.data.fill_(1.0)
    variables = i3d_lib.convert_tf_i3d(_i3d_tf_vars(net))

    size, frames = 64, 16
    x = rng.uniform(0, 1, (1, frames, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.tensor(
            np.transpose(x, (0, 4, 1, 2, 3))) * 2.0 - 1.0).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(i3d_lib.I3D(input_size=size).apply(
            variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-2)


def test_i3d_parity_catches_valid_vs_same_pool():
    """Sensitivity: a VALID-padded branch pool instead of SAME must fail."""
    rng = _seed_all(24)
    tmod = TInceptionModule3D(*TorchI3D.MIXED["Mixed_3b"]).eval()
    _randomize_bn(tmod)
    for m in tmod.modules():
        if isinstance(m, tnn.BatchNorm3d):
            m.weight.data.fill_(1.0)
    x = rng.normal(size=(1, 4, 14, 14, 192)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tmod(torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))).numpy()

    # Mutated torch clone: branch-3 pool VALID-cropped then resized back.
    with torch.no_grad():
        t = torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))
        br0, br1 = tmod.b0(t), tmod.b1b(tmod.b1a(t))
        br2 = tmod.b2b(tmod.b2a(t))
        bad_pool = F.max_pool3d(t, (3, 3, 3), (1, 1, 1))  # VALID: shrinks
        bad_pool = F.pad(bad_pool, (1, 1, 1, 1, 1, 1))  # zero-refill
        br3 = tmod.b3b(bad_pool)
        mutated = torch.cat([br0, br1, br2, br3], 1).numpy()
    assert not np.allclose(mutated, want, atol=ATOL, rtol=RTOL)
