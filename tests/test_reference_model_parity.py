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
