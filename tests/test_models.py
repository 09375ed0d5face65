"""Model zoo: forward-shape goldens + param-count oracles
(reference DRUNet.py:185-188, deeplabv2.py:224, GAN.py:298-302)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slcl_tpu.models import (DRUNet, UNet, DeepLabV2, ResNetUNet,
                             UncertaintyDiscriminator, OutputDiscriminator,
                             MLPDiscriminator, BoundaryDiscriminator, PatchGAN)


def _n_params(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


def _init(model, shape, train=True):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train) \
        if _takes_train(model) else model.init(jax.random.PRNGKey(0), x)
    return variables, x


def _takes_train(model):
    import inspect
    return "train" in inspect.signature(model.__call__).parameters


def test_drunet_shapes_and_params():
    """Param oracle: 13,483,844 (multilvl=False), 13,484,104 (multilvl=True)
    — reference DRUNet.py:185-186."""
    model = DRUNet(dtype=jnp.float32)
    variables, x = _init(model, (1, 224, 224, 3))
    assert _n_params(variables) == 13_483_844
    out, _ = model.apply(variables, x, True, mutable=["batch_stats"])
    assert out.pred.shape == (1, 224, 224, 4)
    assert out.dcdr_ft.shape == (1, 224, 224, 32)
    assert out.bottleneck.shape == (1, 14, 14, 512)
    assert out.aux is None


def test_drunet_multilvl_phead():
    model = DRUNet(multilvl=True, phead=True, dtype=jnp.float32)
    variables, x = _init(model, (1, 224, 224, 3))
    out, _ = model.apply(variables, x, True, mutable=["batch_stats"])
    assert out.aux.shape == (1, 224, 224, 4)
    assert out.dcdr_ft.shape == (1, 224, 224, 32)
    # multilvl-only param oracle (phead adds 1x1 convs on top)
    model2 = DRUNet(multilvl=True, dtype=jnp.float32)
    v2, _ = _init(model2, (1, 224, 224, 3))
    assert _n_params(v2) == 13_484_104


def test_unet_shapes():
    model = UNet(dtype=jnp.float32)
    variables, x = _init(model, (1, 224, 224, 3))
    out, _ = model.apply(variables, x, True, mutable=["batch_stats"])
    assert out.pred.shape == (1, 224, 224, 4)
    assert out.dcdr_ft.shape == (1, 224, 224, 64)


def test_deeplabv2_shapes_and_params():
    """Param oracle 42,942,560 + layer4 feature tap (deeplabv2.py:224,120-136)."""
    model = DeepLabV2(multi_level=True, dtype=jnp.float32)
    variables, x = _init(model, (1, 96, 96, 3))
    assert _n_params(variables) == 42_942_560
    out, _ = model.apply(variables, x, True, mutable=["batch_stats"])
    assert out.pred.shape == (1, 96, 96, 4)
    assert out.aux.shape == (1, 96, 96, 4)
    assert out.dcdr_ft.shape[-1] == 2048


def test_resnet_unet_shapes():
    model = ResNetUNet(multilvl=True, phead=True, dtype=jnp.float32)
    variables, x = _init(model, (1, 96, 96, 3))
    out, _ = model.apply(variables, x, True, mutable=["batch_stats"])
    assert out.pred.shape == (1, 96, 96, 4)
    assert out.aux.shape == (1, 96, 96, 4)
    assert out.dcdr_ft.shape == (1, 96, 96, 32)  # repaired feature tap
    n = _n_params(variables)
    assert 30e6 < n < 36e6  # smp resnet50-unet ballpark (~32.5 M oracle)


def test_uncertainty_discriminator_shapes():
    """4x4 s2 p2 conv stack: 224 -> 113 -> 57 -> 29 -> 15 -> 8 (GAN.py:90-145)."""
    model = UncertaintyDiscriminator(dtype=jnp.float32)
    variables, x = _init(model, (2, 224, 224, 4))
    out = model.apply(variables, x)
    assert out.shape == (2, 8, 8, 1)


def test_output_and_boundary_discriminators():
    m = OutputDiscriminator(dtype=jnp.float32)
    v, x = _init(m, (1, 56, 56, 4))
    assert m.apply(v, x).shape == (1, 8, 8, 1)
    b = BoundaryDiscriminator(dtype=jnp.float32)
    v, x = _init(b, (1, 224, 224, 1))
    assert b.apply(v, x).shape == (1, 8, 8, 1)


def test_mlp_discriminator():
    m = MLPDiscriminator(dtype=jnp.float32)
    v, x = _init(m, (2, 24576))
    assert m.apply(v, x).shape == (2, 1)


def test_patchgan():
    m = PatchGAN(aux=True, dtype=jnp.float32)
    v, x = _init(m, (1, 256, 256, 1))
    out, out_aux = m.apply(v, x)
    assert out.shape[0] == 1 and out.shape[-1] == 1
    assert out_aux.shape == out.shape


def test_drunet_jit_and_grad():
    """The flagship backbone must be jittable and differentiable end-to-end."""
    model = DRUNet(filters=8, n_block=3, bottleneck_depth=2, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, True)
    params, bs = variables["params"], variables["batch_stats"]

    @jax.jit
    def loss_fn(params, bs, x):
        out, updates = model.apply({"params": params, "batch_stats": bs}, x,
                                   True, mutable=["batch_stats"])
        return jnp.mean(out.pred ** 2), updates

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, bs, x)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree.leaves(grads))
    assert gnorm > 0


def test_drunet_secondary_param_oracles():
    """Reference DRUNet.py:186-187 config variants: 544,676 (f16,b3,d2) and
    136,788 (f8,b3,d2) — validates the generalized channel plan."""
    for kw, want in ((dict(filters=16, n_block=3, bottleneck_depth=2), 544_676),
                     (dict(filters=8, n_block=3, bottleneck_depth=2), 136_788)):
        m = DRUNet(dtype=jnp.float32, **kw)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
        assert _n_params(v) == want, kw
