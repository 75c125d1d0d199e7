"""Precision-pinned contraction helpers.

The default matmul precision on TPU (and on this JAX build, everywhere) rounds
operands toward bf16. That is the right trade for the CNN compute path, but the
geometry/metric core (projection, Procrustes, SMPL joint regression) needs full
f32 accumulation — a 1-ulp bf16 error on a 5000-focal-length projection is ~2px.
Use these wrappers anywhere numerical parity with the reference matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

hp_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
hp_matmul = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def pin_cpu() -> None:
    """Force this process onto the host CPU backend.

    The TPU plugin in this image registers regardless of JAX_PLATFORMS and
    overrides the platforms config at registration, so merely pinning
    ``jax_default_device`` still initializes the remote TPU client — which
    HANGS when the device is down. Re-forcing the ``jax_platforms`` CONFIG
    (possible any time after registration, before first backend use) limits
    ``backends()`` to the CPU client, so nothing touches the device.
    """
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])


def default_platform() -> str:
    """Platform computations actually run on by default.

    ``jax.default_backend()`` reports the highest-priority *backend* — in this
    image the axon TPU plugin registers even when tests pin execution to CPU
    via ``jax.config.jax_default_device``, so the backend name alone
    mis-detects. Honour the default-device pin first.
    """
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()
