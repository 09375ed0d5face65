"""torch->flax converter parity: random-weight torch models are converted
and must produce numerically matching forwards in flax (proves the layout
mapping; with real ImageNet/vgg_normalised files the same path loads them).

The RAIN/DeepLab cases import the actual reference torch modules; the
ResNet-50 case builds a torchvision-naming trunk here (torchvision itself is
not installed in this image — the state_dict key convention is what users'
ImageNet files follow).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from slcl_tpu.utils import torch_convert as tc  # noqa: E402

REF = "/root/reference"


# ---------------------------------------------------------------------------
# a minimal torch ResNet trunk with torchvision state_dict naming
# ---------------------------------------------------------------------------
class _TorchBottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + identity)


class _TorchResNetTrunk(nn.Module):
    """torchvision-resnet50-compatible trunk (state_dict key parity)."""

    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, layers[0], 1)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)

    def _make_layer(self, planes, blocks, stride):
        down = nn.Sequential(
            nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
            nn.BatchNorm2d(planes * 4))
        mods = [_TorchBottleneck(self.inplanes, planes, stride, down)]
        self.inplanes = planes * 4
        mods += [_TorchBottleneck(self.inplanes, planes) for _ in range(blocks - 1)]
        return nn.Sequential(*mods)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def test_resnet50_encoder_forward_parity():
    torch.manual_seed(0)
    layers = (2, 2, 2, 2)  # small-depth trunk; same block/naming structure
    ref = _TorchResNetTrunk(layers)
    with torch.no_grad():
        _randomize_bn_stats(ref)
    ref.eval()

    from slcl_tpu.models.resnet_unet import ResNetUNet
    model = ResNetUNet(layers=layers, dtype=jnp.float32)
    x = np.random.default_rng(0).normal(size=(1, 3, 64, 64)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(x.transpose(0, 2, 3, 1)), False)

    enc_p, enc_b = tc.convert_resnet_encoder(
        {k: v.numpy() for k, v in ref.state_dict().items()}, layers)
    params, rep_p = tc.merge_pretrained(variables["params"], enc_p)
    bstats, rep_b = tc.merge_pretrained(variables["batch_stats"], enc_b)
    assert not any(r.startswith("!") for r in rep_p + rep_b)

    out = model.apply({"params": params, "batch_stats": bstats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    got = np.asarray(out.bottleneck).transpose(0, 3, 1, 2)
    want = ref(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_deeplabv2_trunk_merge_covers_all_keys():
    """An ImageNet resnet101-format dict fully maps onto the DeepLabV2 trunk
    (heads excluded, matching reference get_deeplab_v2's layer5 filter)."""
    torch.manual_seed(1)
    layers = (2, 2, 2, 2)
    ref = _TorchResNetTrunk(layers)
    from slcl_tpu.models.deeplabv2 import DeepLabV2
    model = DeepLabV2(layers=layers, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 33, 33, 3), jnp.float32), False)
    enc_p, enc_b = tc.convert_resnet_encoder(
        {k: v.numpy() for k, v in ref.state_dict().items()}, layers)
    params, rep_p = tc.merge_pretrained(variables["params"], enc_p)
    bstats, rep_b = tc.merge_pretrained(variables["batch_stats"], enc_b)
    assert not any(r.startswith("!") for r in rep_p + rep_b)
    # every trunk tensor transferred (conv kernels + 4 bn leaves each)
    n_sd = len(ref.state_dict()) - sum(
        "num_batches_tracked" in k for k in ref.state_dict())
    assert len(rep_p) + len(rep_b) == n_sd


# ---------------------------------------------------------------------------
# RAIN nets: converted from the actual reference torch Sequentials
# ---------------------------------------------------------------------------
@pytest.mark.skipif(not os.path.isdir(REF), reason="reference mount absent")
def test_rain_vgg_and_fc_forward_parity():
    from unittest import mock
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REF)
    stubs = {name: mock.MagicMock() for name in (
        "nibabel", "SimpleITK", "easydict", "torchvision",
        "torchvision.transforms", "torchvision.transforms.functional",
        "skimage", "skimage.measure", "pandas")}
    with mock.patch.dict(sys.modules, stubs):
        from model.RAIN import get_decoder, get_encoder, get_fc_decoder, get_fc_encoder

    torch.manual_seed(2)
    enc = get_encoder().eval()
    dec = get_decoder().eval()
    fce = get_fc_encoder().eval()
    fcd = get_fc_decoder().eval()

    from slcl_tpu.models.rain import FCDecoder, FCEncoder, VGGDecoder, VGGEncoder
    x = np.random.default_rng(1).normal(size=(1, 3, 32, 32)).astype(np.float32)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))

    # encoder (through relu4_1 == Sequential[:31])
    sd = {k: v.numpy() for k, v in enc.state_dict().items()}
    m = VGGEncoder()
    v = m.init(jax.random.PRNGKey(0), xj)
    params, rep = tc.merge_pretrained(v["params"], tc.convert_vgg_rain_encoder(sd))
    assert not any(r.startswith("!") for r in rep) and len(rep) == 20
    got = np.asarray(m.apply({"params": params}, xj)[-1]).transpose(0, 3, 1, 2)
    want = nn.Sequential(*list(enc.children())[:31])(torch.from_numpy(x))
    np.testing.assert_allclose(got, want.detach().numpy(), atol=2e-4, rtol=1e-3)

    # decoder
    z = np.random.default_rng(2).normal(size=(1, 512, 4, 4)).astype(np.float32)
    sd = {k: v_.numpy() for k, v_ in dec.state_dict().items()}
    md = VGGDecoder()
    vd = md.init(jax.random.PRNGKey(0), jnp.asarray(z.transpose(0, 2, 3, 1)))
    params, rep = tc.merge_pretrained(vd["params"], tc.convert_rain_decoder(sd))
    assert not any(r.startswith("!") for r in rep) and len(rep) == 18
    got = np.asarray(md.apply({"params": params},
                              jnp.asarray(z.transpose(0, 2, 3, 1))))
    want = dec(torch.from_numpy(z)).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    # fc nets
    for tmod, jmod, din in ((fce, FCEncoder(), 1024), (fcd, FCDecoder(), 512)):
        s = np.random.default_rng(3).normal(size=(2, din)).astype(np.float32)
        sd = {k: v_.numpy() for k, v_ in tmod.state_dict().items()}
        vj = jmod.init(jax.random.PRNGKey(0), jnp.asarray(s))
        params, rep = tc.merge_pretrained(vj["params"], tc.convert_rain_fc(sd))
        assert not any(r.startswith("!") for r in rep) and len(rep) == 6
        got = np.asarray(jmod.apply({"params": params}, jnp.asarray(s)))
        want = tmod(torch.from_numpy(s)).detach().numpy()
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_npz_roundtrip(tmp_path):
    tree = {"a": {"kernel": np.ones((2, 2), np.float32)},
            "b": {"bias": np.zeros((3,), np.float32)}}
    p = str(tmp_path / "t.npz")
    tc.save_tree_npz(p, params=tree)
    back = tc.load_tree_npz(p)["params"]
    np.testing.assert_array_equal(back["a"]["kernel"], tree["a"]["kernel"])
