from makani_tpu.models.networks.sfnonet import (
    SphericalFourierNeuralOperatorNet,
    FourierNeuralOperatorNet,
)
from makani_tpu.models.networks.debug import DebugNet
