from makani_tpu.utils.metrics.functions import (
    GeometricL1,
    GeometricRMSE,
    GeometricACC,
    SimpsonQuadrature,
    TrapezoidQuadrature,
    Quadrature,
)
