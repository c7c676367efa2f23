"""Identity-times-scalar debug network used by the autoregression pipeline
self-test (ref: makani/models/networks/debug.py:20-29)."""

import jax.numpy as jnp
import flax.linen as nn


class DebugNet(nn.Module):
    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        factor = self.param("factor", nn.initializers.ones, (1,))
        return factor.astype(x.dtype) * x
