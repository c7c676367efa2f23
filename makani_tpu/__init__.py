"""makani_tpu: a TPU-native (JAX/XLA/Pallas) framework for massively-parallel
training of spherical spectral ML weather/climate models (SFNO / FNO / AFNO / ViT)
on ERA5-style reanalysis data.

Re-designed from scratch for TPU hardware with the capability surface of
NVIDIA Makani (reference: choutilin/makani fork):

- spherical harmonic transforms as Legendre matmuls (MXU) + rFFT, with Pallas
  kernels on the hot path,
- one global ``jax.sharding.Mesh`` with axes ("data", "h", "w", "fin", "fout")
  replacing the reference's NCCL process-group tree (ref: makani/utils/comm.py),
- pure-functional train/eval steps under ``jax.jit``,
- optax optimizers (complex-safe), orbax checkpointing (resharding for free).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (ref: makani exposes Trainer/Inferencer)
    if name == "Trainer":
        from makani_tpu.utils.trainer import Trainer
        return Trainer
    if name == "Inferencer":
        from makani_tpu.utils.inferencer import Inferencer
        return Inferencer
    raise AttributeError(f"module 'makani_tpu' has no attribute {name!r}")
