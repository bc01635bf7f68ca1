"""Optimizers with exact torch semantics (reference main.py:96-102).

The reference trains decoder + encoder-head params with either
``torch.optim.SGD(lr, momentum)`` or ``torch.optim.Adam(lr)``.  optax's
primitives implement the same update rules:

  SGD+momentum (torch, dampening=0, nesterov=False):
      buf <- momentum * buf + g          (buf starts as g)
      p   <- p - lr * buf
  == optax.trace(decay=momentum) then scale(-lr) with zero-initialized
  trace (first step: buf = g).

  Adam (torch defaults betas=(0.9, 0.999), eps=1e-8):
      p <- p - lr * m_hat / (sqrt(v_hat) + eps)
  == optax.scale_by_adam(b1, b2, eps) then scale(-lr) (optax also applies
  eps after the sqrt of the bias-corrected v).

Parity is asserted against torch in tests/test_optim_parity.py.
"""

from __future__ import annotations

import optax


def make_optimizer(optimizer_type: str, lr: float, momentum: float = 0.9) -> optax.GradientTransformation:
    if optimizer_type == "SGD":
        return optax.chain(optax.trace(decay=momentum, nesterov=False), optax.scale(-lr))
    elif optimizer_type == "Adam":
        return optax.chain(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8), optax.scale(-lr))
    raise ValueError("Please specify a valid optimizer. %s is invalid." % (optimizer_type,))
