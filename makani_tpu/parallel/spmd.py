"""GSPMD sharding-constraint helpers.

The reference's distributed transform algorithm (ref: makani/mpu/layers.py:38-169)
is: all-to-all transpose channels<->longitude so the FFT dim is local, local
FFT, transpose back, all-to-all over latitude, local Legendre contraction,
transpose back. Here the same data movement is expressed *declaratively*:
`constrain(x, spec)` pins the sharding of intermediates and XLA's SPMD
partitioner inserts the all-to-alls. This also collapses the reference's
modulus mapping autograd ops and gradient hooks (ref: mpu/mappings.py:30-174)
— forward/backward collective duality is handled by the partitioner, and
reductions over sharded axes (norms, losses, metrics) become global
automatically.
"""

from typing import Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.parallel import comm


def spatial_distributed() -> bool:
    return comm.is_initialized() and comm.get_size("spatial") > 1


def matmul_distributed() -> bool:
    return comm.is_initialized() and comm.get_size("matmul") > 1


def model_distributed() -> bool:
    return comm.is_initialized() and comm.get_size("model") > 1


def constrain(x, *axes):
    """Apply a sharding constraint by named mesh axes (None = replicated dim).
    No-op when no distributed mesh is active."""
    if not comm.is_initialized():
        return x
    mesh = comm.get_mesh()
    spec = P(*axes)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def batch_spec(extra_dims: int = 3):
    """Canonical activation spec: batch over data, lat/lon over h/w."""
    return ("data",) + (None,) * (extra_dims - 2) + ("h", "w")
