"""HDR image-loss family for image-supervised optimization.

Behavioral counterpart of the reference's pluggable loss plumbing
(/root/reference/src/dmtet/render/renderutils/loss.py:16-39 and the CUDA
twin c_src/loss.cu): a reconstruction loss chosen from
{mse, l1, smape, relmse} with an optional `log_srgb` tonemap applied to
both operands first.  The reference hand-writes the CUDA backward; here
autodiff provides it, so the whole family is ~30 lines of jnp.

The relative losses matter for HDR targets: plain MSE is dominated by the
brightest pixels, while SMAPE/RELMSE normalize per-pixel so dim regions
still receive gradient — this materially changes convergence of the
image+audio joint task on HDR environment light.
"""

from __future__ import annotations

import jax.numpy as jnp


def _clamp(x, lo, hi):
    """Clamp whose gradient is 1 on the CLOSED interval [lo, hi] (torch
    clamp semantics).  jnp.clip splits gradient 0.5/0.5 at an exact tie
    (maximum(x, lo) at x == lo), which would halve the gradient on exact
    black pixels — common in rendered/masked targets."""
    return jnp.where(x < lo, lo, jnp.where(x > hi, hi, x))


def _tonemap_log_srgb(f):
    """log(1+x) range compression followed by the sRGB transfer curve,
    matching the reference's `log_srgb` tonemapper (loss.py:16-17,30-33):
    inputs clamped to [0, 65535]; the sRGB curve is applied UNclamped
    above 1 (log(1+65535) ~ 11.09 maps to ~2.9)."""
    x = jnp.log(_clamp(f, 0.0, 65535.0) + 1.0)
    return jnp.where(
        x > 0.0031308,
        1.055 * _clamp(x, 0.0031308, jnp.inf) ** (1.0 / 2.4) - 0.055,
        12.92 * x,
    )


def _abs(x):
    """|x| whose gradient at 0 is 0 (torch abs semantics; jnp.abs gives 1
    there).  sign(x)*x differentiates to sign(x) since jnp.sign itself has
    zero gradient."""
    return jnp.sign(x) * x


def smape(img, target, eps: float = 0.01):
    """Symmetric mean absolute percentage error (loss.py:19-22)."""
    return jnp.mean(_abs(img - target) / (_abs(img) + _abs(target) + eps))


def relmse(img, target, eps: float = 0.1):
    """Relative MSE (loss.py:24-27)."""
    d = img - target
    return jnp.mean(d * d / (img * img + target * target + eps))


_LOSSES = {
    "mse": lambda a, b: jnp.mean((a - b) ** 2),
    "l1": lambda a, b: jnp.mean(jnp.abs(a - b)),
    "smape": smape,
    "relmse": relmse,
}


def image_loss_fn(img, target, loss: str = "l1", tonemapper: str = None):
    """Tonemapped image reconstruction loss (loss.py:29-39).

    loss in {mse, l1, smape, relmse}; tonemapper in {None, 'log_srgb'}.
    The reference's default recipe for HDR supervision is
    (loss='logl1' == l1, tonemapper='log_srgb')."""
    if tonemapper == "log_srgb":
        img = _tonemap_log_srgb(img)
        target = _tonemap_log_srgb(target)
    elif tonemapper not in (None, "none"):
        raise ValueError(f"unknown tonemapper {tonemapper}")
    key = "l1" if loss == "logl1" else loss
    try:
        return _LOSSES[key](img, target)
    except KeyError:
        raise ValueError(f"unknown image loss {loss}") from None


def make_image_loss(loss: str = "l1", tonemapper: str = None):
    """Partial application matching the reference's `createLoss(FLAGS)`
    factory pattern — the returned callable plugs into
    JointImageAudioTask(img_loss_fn=...)."""
    return lambda img, target: image_loss_fn(img, target, loss, tonemapper)
