"""Real and complex activation functions.

Complex variants mirror the reference behaviors
(ref: makani/models/common/activations.py:20-100).
"""

from typing import Optional, Tuple, Callable

import jax
import jax.numpy as jnp
import flax.linen as nn


def gelu_exact(x):
    """Exact (erf-based) GELU — torch.nn.GELU's default formulation.

    The tanh approximation (jax.nn.gelu's default) deviates from the
    reference by ~1e-3 relative; torch-parity (tests/test_torch_parity.py)
    pins the exact form by configuring models with
    activation_function="gelu_exact".

    NOT the default: an A/B on the real chip (round 3) measured the erf
    form at 2.66 vs tanh's 3.66 flagship steps/s (-27%) and it re-tips
    edim384 into OOM — erf lowers poorly on this TPU toolchain. "gelu"
    therefore stays tanh-approximate on the compute path (documented
    deviation from the reference, bounded at ~1e-3 relative).
    """
    return jax.nn.gelu(x, approximate=False)


_warned_gelu_approx = False


def get_activation(name: str) -> Callable:
    global _warned_gelu_approx
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        # tanh-approx: measured 1.38x faster e2e than erf on this chip
        if not _warned_gelu_approx:
            _warned_gelu_approx = True
            import logging
            logging.getLogger(__name__).info(
                "activation 'gelu' uses the tanh approximation (~1e-3 rel "
                "deviation from the torch reference's erf GELU; measured 27%% "
                "faster on-chip). Set activation_function: gelu_exact for "
                "bit parity with reference checkpoints.")
        return jax.nn.gelu
    if name == "gelu_exact":
        return gelu_exact
    if name == "silu":
        return jax.nn.silu
    if name == "identity" or name == "none":
        return lambda x: x
    raise ValueError(f"Unknown activation function {name}")


class ComplexReLU(nn.Module):
    """Complex-valued ReLU variants: cartesian | modulus | halfplane | real."""

    negative_slope: float = 0.0
    mode: str = "real"
    bias_shape: Optional[Tuple[int, ...]] = None
    scale: float = 1.0

    def _leaky(self, x):
        return jnp.where(x >= 0, x, self.negative_slope * x)

    @nn.compact
    def __call__(self, z):
        if self.mode in ["modulus", "halfplane"]:
            shape = self.bias_shape if self.bias_shape is not None else (1,)
            bias = self.param("bias", lambda key, s: self.scale * jnp.ones(s, jnp.float32), shape)
        else:
            bias = 0.0

        if self.mode == "cartesian":
            return jax.lax.complex(self._leaky(jnp.real(z)), self._leaky(jnp.imag(z)))

        if self.mode == "modulus":
            zabs = jnp.sqrt(jnp.square(jnp.real(z)) + jnp.square(jnp.imag(z)))
            cond = (zabs + bias) > 0
            safe = jnp.where(zabs == 0, 1.0, zabs)
            out = jnp.where(cond, ((zabs + bias) / safe).astype(z.dtype) * z, 0.0)
            return out

        if self.mode == "halfplane":
            angle = jnp.angle(z) - bias
            cond = jnp.logical_and(0.0 <= angle, angle < jnp.pi / 2.0)
            return jnp.where(cond, z, self.negative_slope * z)

        if self.mode == "real":
            return jax.lax.complex(self._leaky(jnp.real(z)), jnp.imag(z))

        raise NotImplementedError(f"Unknown complex activation mode {self.mode}")


class ComplexActivation(nn.Module):
    """Wrap a real activation for complex inputs (cartesian or modulus mode)."""

    activation: Callable
    mode: str = "cartesian"
    bias_shape: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, z):
        if self.mode == "cartesian":
            return jax.lax.complex(self.activation(jnp.real(z)), self.activation(jnp.imag(z)))
        if self.mode == "modulus":
            shape = self.bias_shape if self.bias_shape is not None else (1,)
            bias = self.param("bias", nn.initializers.zeros, shape)
            zabs = jnp.sqrt(jnp.square(jnp.real(z)) + jnp.square(jnp.imag(z)))
            theta = jnp.angle(z)
            mag = self.activation(zabs + bias)
            return (mag * jnp.exp(1.0j * theta)).astype(z.dtype)
        return z
