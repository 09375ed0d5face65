"""LR-schedule + optimizer-group parity tests (reference utils/lr_adjust.py,
model/deeplabv2.py:138-175)."""
import jax
import jax.numpy as jnp
import numpy as np

from slcl_tpu.train import schedules
from slcl_tpu.train.state import make_optimizer


def test_poly_matches_reference_formula():
    # lr_adjust.py:1-2 / :8-13: poly on (lr - end_lr) + end_lr
    lr = schedules.get_lr("poly", 8e-4, 30, 100, power=0.9, end_lr=1e-5)
    expect = (8e-4 - 1e-5) * (1 - 30 / 100) ** 0.9 + 1e-5
    assert abs(lr - expect) < 1e-12


def test_linear_is_inverse_time_decay():
    # lr_adjust.py:20-25: lr / (1 + decay*epoch), decay default 2e-3
    lr = schedules.get_lr("linear", 0.02, 50, 100, lr_decay=2e-3)
    assert abs(lr - 0.02 / (1 + 2e-3 * 50)) < 1e-12


def test_constant_and_none():
    assert schedules.get_lr(None, 1e-3, 10, 100) == 1e-3
    assert schedules.get_lr("constant", 1e-3, 10, 100) == 1e-3


def test_lr10_head_group_updates_10x():
    """lr10_keys applies exactly 10x the update to the head group
    (lr_adjust.py:15-16 param_groups[1]['lr'] = lr*10)."""
    params = {"layer4_0": jnp.ones((4,)), "layer6": jnp.ones((4,))}
    grads = {"layer4_0": jnp.ones((4,)), "layer6": jnp.ones((4,))}
    tx = make_optimizer("sgd", lr=0.1, momentum=0.0, lr10_keys=("layer6",))
    opt_state = tx.init(params)
    updates, _ = tx.update(grads, opt_state, params)
    u_body = np.asarray(updates["layer4_0"])
    u_head = np.asarray(updates["layer6"])
    assert np.allclose(u_body, -0.1)
    assert np.allclose(u_head, -1.0)
