"""Optimizer parity: our optax chains vs torch.optim.SGD/Adam."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from show_tell_tpu.train.optim import make_optimizer


def _run_torch(opt_name, w0, grads, lr, momentum):
    w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    if opt_name == "SGD":
        opt = torch.optim.SGD([w], lr=lr, momentum=momentum)
    else:
        opt = torch.optim.Adam([w], lr=lr)
    for g in grads:
        opt.zero_grad()
        w.grad = torch.from_numpy(g.copy())
        opt.step()
    return w.detach().numpy()


def _run_ours(opt_name, w0, grads, lr, momentum):
    import optax

    opt = make_optimizer(opt_name, lr, momentum)
    w = jnp.asarray(w0)
    state = opt.init(w)
    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state, w)
        w = optax.apply_updates(w, updates)
    return np.asarray(w)


@pytest.mark.parametrize("opt_name", ["SGD", "Adam"])
def test_optimizer_matches_torch(opt_name):
    rng = np.random.RandomState(0)
    w0 = rng.randn(5, 7).astype(np.float32)
    grads = [rng.randn(5, 7).astype(np.float32) for _ in range(10)]
    ours = _run_ours(opt_name, w0, grads, lr=0.01, momentum=0.9)
    ref = _run_torch(opt_name, w0, grads, lr=0.01, momentum=0.9)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_invalid_optimizer_raises():
    with pytest.raises(ValueError):
        make_optimizer("RMSProp", 0.1)
