from makani_tpu.ops.quadrature import (
    legendre_gauss_nodes_weights,
    clenshaw_curtiss_nodes_weights,
    lobatto_nodes_weights,
    quadrature_nodes_weights,
)
from makani_tpu.ops.legendre import precompute_legpoly
from makani_tpu.ops.sht import RealSHT, InverseRealSHT
from makani_tpu.ops.fft import RealFFT2, InverseRealFFT2
