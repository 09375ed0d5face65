"""Architecture parity by weight transfer: the reference torch DRUNet's
weights are copied into the flax DRUNet and both run the same input in eval
mode. Matching outputs prove layer-for-layer architectural equivalence
(stronger than the param-count oracles). Skipped without /root/reference.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mount not available")

if os.path.isdir(REF):
    import torch
    from unittest import mock

    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REF)
    stubs = {}
    for name in ("nibabel", "SimpleITK", "easydict", "torchvision",
                 "torchvision.transforms", "torchvision.transforms.functional",
                 "skimage", "skimage.measure", "pandas"):
        stubs[name] = mock.MagicMock()
    with mock.patch.dict(sys.modules, stubs):
        from model.DRUNet import Segmentation_model as RefDRUNet

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from slcl_tpu.models import DRUNet  # noqa: E402


def _conv_w(t):
    # torch OIHW -> flax HWIO
    return np.transpose(t.detach().numpy(), (2, 3, 1, 0))


def _copy_convbnact(params, bstats, seq, idx):
    """Copy one [Conv, LeakyReLU, BN] triple from a torch Sequential slice
    starting at ``idx`` into a flax ConvBNAct subtree."""
    conv, bn = seq[idx], seq[idx + 2]
    params["Conv_0"]["kernel"] = _conv_w(conv.weight)
    params["Conv_0"]["bias"] = conv.bias.detach().numpy()
    params["BatchNorm_0"]["scale"] = bn.weight.detach().numpy()
    params["BatchNorm_0"]["bias"] = bn.bias.detach().numpy()
    bstats["BatchNorm_0"]["mean"] = bn.running_mean.detach().numpy()
    bstats["BatchNorm_0"]["var"] = bn.running_var.detach().numpy()


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


@pytest.mark.parametrize("multilvl", [False, True])
def test_drunet_forward_parity_by_weight_transfer(multilvl):
    torch.manual_seed(0)
    ref = RefDRUNet(filters=32, in_channels=3, n_block=4, bottleneck_depth=4,
                    n_class=4, multilvl=multilvl)
    ref.eval()

    model = DRUNet(multilvl=multilvl, dtype=jnp.float32)
    x = np.random.default_rng(0).normal(size=(1, 3, 64, 64)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    params = _to_mutable(jax.tree.map(np.asarray, variables["params"]))
    bstats = _to_mutable(jax.tree.map(np.asarray, variables["batch_stats"]))

    # ---- encoder blocks + 1x1 merge convs ----
    for i in range(1, 5):
        seq = getattr(ref.encoder, f"encoder{i}")
        _copy_convbnact(params[f"encoder{i}"]["ConvBNAct_0"],
                        bstats[f"encoder{i}"]["ConvBNAct_0"], seq, 0)
        _copy_convbnact(params[f"encoder{i}"]["ConvBNAct_1"],
                        bstats[f"encoder{i}"]["ConvBNAct_1"], seq, 3)
        merge = getattr(ref.encoder, f"conv1_{i}")[0]
        params[f"conv1_{i}"]["kernel"] = _conv_w(merge.weight)
        params[f"conv1_{i}"]["bias"] = merge.bias.detach().numpy()

    # ---- bottleneck ----
    for i in range(1, 5):
        conv = getattr(ref.bottleneck, f"bottleneck{i}")[0]
        params[f"bottleneck{i}"]["kernel"] = _conv_w(conv.weight)
        params[f"bottleneck{i}"]["bias"] = conv.bias.detach().numpy()

    # ---- decoder ----
    for i in range(1, 5):
        up = getattr(ref.decoder, f"decoder1_{i}")[1]
        params[f"decoder1_{i}"]["kernel"] = _conv_w(up.weight)
        params[f"decoder1_{i}"]["bias"] = up.bias.detach().numpy()
        seq = getattr(ref.decoder, f"decoder2_{i}")
        _copy_convbnact(params[f"decoder2_{i}a"],
                        bstats[f"decoder2_{i}a"], seq, 0)
        _copy_convbnact(params[f"decoder2_{i}b"],
                        bstats[f"decoder2_{i}b"], seq, 3)

    # ---- heads ----
    params["classifier"]["kernel"] = _conv_w(ref.classifier.weight)
    params["classifier"]["bias"] = ref.classifier.bias.detach().numpy()
    if multilvl:
        params["classifier1"]["kernel"] = _conv_w(ref.classifier1.weight)
        params["classifier1"]["bias"] = ref.classifier1.bias.detach().numpy()

    out = model.apply({"params": params, "batch_stats": bstats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    ref_pred = ref_out[0].numpy().transpose(0, 2, 3, 1)
    got_pred = np.asarray(out.pred)
    np.testing.assert_allclose(got_pred, ref_pred, rtol=1e-3, atol=1e-4)
    if multilvl:
        ref_aux = ref_out[1].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(out.aux), ref_aux,
                                   rtol=1e-3, atol=2e-3)  # bilinear upsample
                                   # semantics differ slightly at borders
    else:
        # decoder feature tap (the contrastive space) must match too
        ref_ft = ref_out[2].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(out.dcdr_ft), ref_ft,
                                   rtol=1e-3, atol=1e-4)


# ===========================================================================
# DeepLabV2: weight transfer from the actual reference torch module
# (reference model/deeplabv2.py:120-136)
# ===========================================================================
if os.path.isdir(REF):
    with mock.patch.dict(sys.modules, stubs):
        from model.deeplabv2 import Bottleneck as RefBottleneck
        from model.deeplabv2 import ResNetMulti as RefResNetMulti
        from model.DDFSeg import DDFNet as RefDDFNet
        from model.DDFSeg import SegDecoder as RefSegDecoder


def _randomize_norms(model, seed=0):
    """Give BatchNorm/InstanceNorm layers non-trivial affine + running
    stats so the transfer test is not vacuous at init values."""
    g = torch.Generator().manual_seed(seed)

    def r(shape):
        return torch.randn(shape, generator=g)

    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(1.0 + 0.2 * r(m.weight.shape))
                m.bias.copy_(0.1 * r(m.bias.shape))
                m.running_mean.copy_(0.1 * r(m.running_mean.shape))
                m.running_var.copy_(0.5 + torch.rand(m.running_var.shape,
                                                     generator=g))
        elif isinstance(m, torch.nn.InstanceNorm2d) and m.affine:
            with torch.no_grad():
                m.weight.copy_(1.0 + 0.2 * r(m.weight.shape))
                m.bias.copy_(0.1 * r(m.bias.shape))


def _copy_bn(bn, p, b):
    p["scale"] = bn.weight.detach().numpy()
    p["bias"] = bn.bias.detach().numpy()
    b["mean"] = bn.running_mean.detach().numpy()
    b["var"] = bn.running_var.detach().numpy()


def _copy_plain_conv(conv, p, with_bias=True):
    p["kernel"] = _conv_w(conv.weight)
    if with_bias and conv.bias is not None:
        p["bias"] = conv.bias.detach().numpy()


@pytest.mark.parametrize("multi_level", [False, True])
def test_deeplabv2_forward_parity_by_weight_transfer(multi_level):
    """Full-forward equality with reference ResNetMulti (deeplabv2.py:
    120-136) after weight transfer — trunk, both ASPP heads, and the
    align_corners=True bilinear interp (deeplabv2.py:96)."""
    torch.manual_seed(0)
    layers = [1, 1, 1, 1]
    H = 48
    ref = RefResNetMulti(RefBottleneck, layers, 4, multi_level=multi_level,
                         input_size=H)
    _randomize_norms(ref)
    ref.eval()

    from slcl_tpu.models.deeplabv2 import DeepLabV2
    model = DeepLabV2(num_classes=4, layers=tuple(layers),
                      multi_level=multi_level, dtype=jnp.float32)
    x = np.random.default_rng(0).normal(size=(1, 3, H, H)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    params = _to_mutable(jax.tree.map(np.asarray, variables["params"]))
    bstats = _to_mutable(jax.tree.map(np.asarray, variables["batch_stats"]))

    _copy_plain_conv(ref.conv1, params["conv1"], with_bias=False)
    _copy_bn(ref.bn1, params["bn1"], bstats["bn1"])
    for L, blocks in enumerate(layers, start=1):
        for i in range(blocks):
            tb = getattr(ref, f"layer{L}")[i]
            p = params[f"layer{L}_{i}"]
            b = bstats[f"layer{L}_{i}"]
            for j in (1, 2, 3):
                _copy_plain_conv(getattr(tb, f"conv{j}"), p[f"conv{j}"],
                                 with_bias=False)
                _copy_bn(getattr(tb, f"bn{j}"), p[f"bn{j}"], b[f"bn{j}"])
            if tb.downsample is not None:
                _copy_plain_conv(tb.downsample[0], p["down_conv"],
                                 with_bias=False)
                _copy_bn(tb.downsample[1], p["down_bn"], b["down_bn"])
    heads = [("layer6", ref.layer6)]
    if multi_level:
        heads.append(("layer5", ref.layer5))
    for name, head in heads:
        for i, conv in enumerate(head.conv2d_list):
            _copy_plain_conv(conv, params[name][f"aspp{i}"])

    out = model.apply({"params": params, "batch_stats": bstats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    with torch.no_grad():
        ref_pred, ref_aux, ref_ft = ref(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out.dcdr_ft),
                               ref_ft.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.pred),
                               ref_pred.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
    if multi_level:
        np.testing.assert_allclose(np.asarray(out.aux),
                                   ref_aux.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-3, atol=1e-4)


# ===========================================================================
# DDFNet / SegDecoder: weight transfer from the actual reference torch
# modules (reference model/DDFSeg.py:295-345, :348-374)
# ===========================================================================
def _copy_gc(seq, p, b=None):
    """general_conv2d/dilate_conv2d Sequential -> _ConvBlock subtree
    ({Conv_0, BatchNorm_0|GroupNorm_0})."""
    for m in seq:
        if isinstance(m, torch.nn.Conv2d):
            _copy_plain_conv(m, p["Conv_0"])
        elif isinstance(m, torch.nn.BatchNorm2d):
            _copy_bn(m, p["BatchNorm_0"], b["BatchNorm_0"])
        elif isinstance(m, torch.nn.InstanceNorm2d):
            p["GroupNorm_0"]["scale"] = m.weight.detach().numpy()
            p["GroupNorm_0"]["bias"] = m.bias.detach().numpy()


def _copy_res(res, p, b=None):
    """Resnet_block / Resnet_block_ds -> _ResBlock subtree."""
    bb = b if b is not None else {}
    _copy_gc(res.conv1, p["_ConvBlock_0"], bb.get("_ConvBlock_0"))
    _copy_gc(res.conv2, p["_ConvBlock_1"], bb.get("_ConvBlock_1"))


def _copy_drn(drn, p, b):
    """Dilated_Resnet_Block -> dilated _ResBlock subtree (flat names)."""
    for idx, seq in enumerate((drn.dilated_conv1, drn.dilated_conv2)):
        for m in seq:
            if isinstance(m, torch.nn.Conv2d):
                p[f"Conv_{idx}"]["kernel"] = _conv_w(m.weight)
                p[f"Conv_{idx}"]["bias"] = m.bias.detach().numpy()
            elif isinstance(m, torch.nn.BatchNorm2d):
                _copy_bn(m, p[f"BatchNorm_{idx}"], b[f"BatchNorm_{idx}"])


def _copy_attention(att, p, b, gamma=0.7):
    for tname, fname in (("conv1", "conv_f"), ("conv2", "conv_g"),
                         ("conv3", "conv_h"), ("conv4", "conv_o")):
        _copy_gc(getattr(att, tname), p[fname], b[fname])
    att.gamma.data = torch.tensor(float(gamma))
    p["gamma"] = np.asarray(gamma, np.float32)


def _copy_deconv(seq, p_conv, p_gn):
    """general_deconv2d -> flax ConvTranspose (+GroupNorm). The torch
    ConvTranspose2d(k3, s2, padding=1, output_padding=1) weight (I, O, kh,
    kw) maps to flax padding ((1, 2), (1, 2)) with a spatially flipped
    HWIO kernel (verified numerically; see models/ddfseg.py)."""
    for m in seq:
        if isinstance(m, torch.nn.ConvTranspose2d):
            k = np.transpose(m.weight.detach().numpy(), (2, 3, 0, 1))
            p_conv["kernel"] = k[::-1, ::-1].copy()
            p_conv["bias"] = m.bias.detach().numpy()
        elif isinstance(m, torch.nn.InstanceNorm2d):
            p_gn["scale"] = m.weight.detach().numpy()
            p_gn["bias"] = m.bias.detach().numpy()


def _copy_encoderc(enc, p, b):
    _copy_gc(enc.conv1, p["_ConvBlock_0"], b["_ConvBlock_0"])
    blocks = [enc.res_block1, enc.res_block_ds1,
              enc.res_block_combine.res1, enc.res_block_combine.res2,
              enc.res_block_combine1.res1, enc.res_block_combine1.res2,
              enc.res_block_combine2.res1, enc.res_block_combine2.res2,
              enc.res_block2, enc.res_block3,
              enc.res_block_combine3.res1, enc.res_block_combine3.res2]
    for i, res in enumerate(blocks):
        _copy_res(res, p[f"_ResBlock_{i}"], b[f"_ResBlock_{i}"])


def _copy_encoders(enc, p, b):
    _copy_drn(enc.drn_block1, p["_ResBlock_0"], b["_ResBlock_0"])
    _copy_drn(enc.drn_block2, p["_ResBlock_1"], b["_ResBlock_1"])
    _copy_attention(enc.att, p["_Attention_0"], b["_Attention_0"])


def _copy_encoderdiff(enc, p, b):
    _copy_gc(enc.conv1, p["_ConvBlock_0"], b["_ConvBlock_0"])
    for i, res in enumerate((enc.res_block1, enc.res_block_ds1,
                             enc.res_block_ds2, enc.res_block2)):
        _copy_res(res, p[f"_ResBlock_{i}"], b[f"_ResBlock_{i}"])
    _copy_gc(enc.conv2, p["_ConvBlock_1"], b["_ConvBlock_1"])
    _copy_gc(enc.conv3, p["_ConvBlock_2"], b["_ConvBlock_2"])


def _copy_decoderc(dec, p):
    _copy_gc(dec.conv1, p["_ConvBlock_0"])
    for i, res in enumerate((dec.res_block1, dec.res_block2,
                             dec.res_block3, dec.res_block4)):
        _copy_res(res, p[f"_ResBlock_{i}"])


def _copy_image_decoder(dec, p):
    """reference decodera -> flax ImageDecoder (inner decoderc + deconvs)."""
    _copy_decoderc(dec.decoder_block, p["DecoderC_0"])
    for i, seq in enumerate((dec.deconv1, dec.deconv2, dec.deconv3)):
        _copy_deconv(seq, p[f"ConvTranspose_{i}"], p[f"GroupNorm_{i}"])
    _copy_gc(dec.conv1, p["_ConvBlock_0"])


def test_ddfnet_forward_parity_by_weight_transfer():
    """The full cross-domain swap + cycle reconstruction (DDFSeg.py:295-345)
    matches the reference after weight transfer — proving the shared
    encoderc/decoderc wiring, channel-pad ds-residuals, attention module
    (with gamma exercised at 0.7 in both), InstanceNorm semantics and the
    torch-exact deconv padding."""
    torch.manual_seed(0)
    ref = RefDDFNet()
    _randomize_norms(ref)
    ref.eval()

    from slcl_tpu.models.ddfseg import DDFNet
    model = DDFNet(dtype=jnp.float32)
    H = 32
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(1, 3, H, H)).astype(np.float32)
    xt = rng.normal(size=(1, 3, H, H)).astype(np.float32)
    js, jt = (jnp.asarray(a.transpose(0, 2, 3, 1)) for a in (xs, xt))
    variables = model.init({"params": jax.random.PRNGKey(0)}, js, jt, False)
    params = _to_mutable(jax.tree.map(np.asarray, variables["params"]))
    bstats = _to_mutable(jax.tree.map(np.asarray, variables["batch_stats"]))

    _copy_encoderc(ref.encoderc, params["encoderc"], bstats["encoderc"])
    _copy_encoders(ref.encoders, params["encoders"], bstats["encoders"])
    _copy_encoders(ref.encodert, params["encodert"], bstats["encodert"])
    _copy_encoderdiff(ref.style_encoder_s, params["style_encoder_s"],
                      bstats["style_encoder_s"])
    _copy_encoderdiff(ref.style_encoder_t, params["style_encoder_t"],
                      bstats["style_encoder_t"])
    _copy_decoderc(ref.decoderc, params["dec_shared"])
    _copy_image_decoder(ref.decoders, params["decoders"])
    _copy_image_decoder(ref.decodert, params["decodert"])

    out = model.apply({"params": params, "batch_stats": bstats}, js, jt, False)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(xs), torch.from_numpy(xt))

    for key, tol in (("content_s", 2e-3), ("content_t", 2e-3),
                     ("style_s_from_t", 2e-3), ("fake_img_s_t", 2e-3),
                     ("fake_img_t_s", 2e-3), ("recon_imgs", 5e-3),
                     ("recon_imgt", 5e-3), ("recon_content_s", 5e-3)):
        want = ref_out[key].numpy().transpose(0, 2, 3, 1)
        got = np.asarray(out[key])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=tol,
                                   err_msg=key)


def test_ddfseg_segdecoder_forward_parity_by_weight_transfer():
    """SegDecoder (DDFSeg.py:348-374): conv + 4 Ins res blocks + 3 deconvs
    + 7x7 class head."""
    torch.manual_seed(1)
    ref = RefSegDecoder()
    _randomize_norms(ref, seed=1)
    ref.eval()

    from slcl_tpu.models.ddfseg import SegDecoder
    model = SegDecoder(dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 512, 4, 4)).astype(np.float32)
    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, jx, False)
    params = _to_mutable(jax.tree.map(np.asarray, variables["params"]))

    _copy_gc(ref.conv1, params["_ConvBlock_0"])
    for i, res in enumerate((ref.res_block1, ref.res_block2,
                             ref.res_block3, ref.res_block4)):
        _copy_res(res, params[f"_ResBlock_{i}"])
    for i, seq in enumerate((ref.deconv1, ref.deconv2, ref.deconv3)):
        _copy_deconv(seq, params[f"ConvTranspose_{i}"],
                     params[f"GroupNorm_{i}"])
    _copy_gc(ref.conv2, params["_ConvBlock_1"])

    got = model.apply({"params": params}, jx, False)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-3)


# ===========================================================================
# ResNet50-UNet: full-forward parity vs a torch replica of the reference's
# smp.Unet('resnet50') (reference model/segmentation_models.py:26-33 —
# segmentation_models_pytorch itself is not installed in this image, so the
# decoder is replicated here from smp's published DecoderBlock structure:
# nearest-2x upsample + skip concat + two Conv3x3(bias=False)+BN+ReLU, head
# Conv3x3; encoder skips = [layer3, layer2, layer1, relu1]).
# ===========================================================================
class _TorchBottleneckSMP(torch.nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        nn = torch.nn
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


class _TorchResNetUNet(torch.nn.Module):
    """torchvision-naming ResNet trunk + smp UnetDecoder replica."""

    def __init__(self, layers=(1, 1, 1, 1), num_classes=4,
                 decoder_channels=(256, 128, 64, 32, 16)):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, layers[0], 1)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)

        enc_ch = [2048, 1024, 512, 256, 64]
        skip_ch = enc_ch[1:] + [0]
        self.blocks = nn.ModuleList()
        in_ch = enc_ch[0]
        for sk, out in zip(skip_ch, decoder_channels):
            self.blocks.append(nn.ModuleDict({
                "conv1": nn.Sequential(
                    nn.Conv2d(in_ch + sk, out, 3, padding=1, bias=False),
                    nn.BatchNorm2d(out), nn.ReLU(inplace=True)),
                "conv2": nn.Sequential(
                    nn.Conv2d(out, out, 3, padding=1, bias=False),
                    nn.BatchNorm2d(out), nn.ReLU(inplace=True))}))
            in_ch = out
        self.seg_head = nn.Conv2d(decoder_channels[-1], num_classes, 3,
                                  padding=1)

    def _make_layer(self, planes, blocks, stride):
        nn = torch.nn
        down = nn.Sequential(
            nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
            nn.BatchNorm2d(planes * 4))
        mods = [_TorchBottleneckSMP(self.inplanes, planes, stride, down)]
        self.inplanes = planes * 4
        mods += [_TorchBottleneckSMP(self.inplanes, planes)
                 for _ in range(blocks - 1)]
        return nn.Sequential(*mods)

    def forward(self, x):
        import torch.nn.functional as F
        c1 = self.relu(self.bn1(self.conv1(x)))
        p = self.maxpool(c1)
        l1 = self.layer1(p)
        l2 = self.layer2(l1)
        l3 = self.layer3(l2)
        y = self.layer4(l3)
        for blk, skip in zip(self.blocks, [l3, l2, l1, c1, None]):
            y = F.interpolate(y, scale_factor=2, mode="nearest")
            if skip is not None:
                y = torch.cat([y, skip], dim=1)
            y = blk["conv2"](blk["conv1"](y))
        return self.seg_head(y)


def test_resnet50_unet_forward_parity_by_weight_transfer():
    torch.manual_seed(0)
    layers = (1, 1, 1, 1)
    ref = _TorchResNetUNet(layers)
    # randomize BN affine + stats so the test is not vacuous
    g = torch.Generator().manual_seed(0)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(1.0 + 0.2 * torch.randn(m.weight.shape, generator=g))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(0.1 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(0.5 + torch.rand(m.running_var.shape, generator=g))
    ref.eval()

    from slcl_tpu.models.resnet_unet import ResNetUNet
    from slcl_tpu.utils import torch_convert as tc
    # feat_dim=16 == last decoder channel -> dcdr_ft is the raw decoder
    # feature (no extra projection layer to initialize)
    model = ResNetUNet(layers=layers, feat_dim=16, dtype=jnp.float32)
    H = 64
    x = np.random.default_rng(0).normal(size=(1, 3, H, H)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    params = _to_mutable(jax.tree.map(np.asarray, variables["params"]))
    bstats = _to_mutable(jax.tree.map(np.asarray, variables["batch_stats"]))

    # encoder via the production converter (torchvision state_dict naming)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if k.split(".")[0] in ("conv1", "bn1", "layer1", "layer2",
                                 "layer3", "layer4")}
    enc_p, enc_b = tc.convert_resnet_encoder(sd, layers)
    params, rep_p = tc.merge_pretrained(params, enc_p)
    bstats, rep_b = tc.merge_pretrained(bstats, enc_b)
    assert not any(r.startswith("!") for r in rep_p + rep_b)
    params = _to_mutable(params)
    bstats = _to_mutable(bstats)

    # decoder + head by direct copy
    for i, blk in enumerate(ref.blocks):
        for cname in ("conv1", "conv2"):
            seq = blk[cname]
            p = params[f"decoder_{i}"][cname]
            b = bstats[f"decoder_{i}"][cname]
            p["Conv_0"]["kernel"] = _conv_w(seq[0].weight)
            _copy_bn(seq[1], p["BatchNorm_0"], b["BatchNorm_0"])
    params["seg_head"]["kernel"] = _conv_w(ref.seg_head.weight)
    params["seg_head"]["bias"] = ref.seg_head.bias.detach().numpy()

    out = model.apply({"params": params, "batch_stats": bstats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out.pred), want,
                               rtol=1e-3, atol=1e-3)
