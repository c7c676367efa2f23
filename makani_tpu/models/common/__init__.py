from makani_tpu.models.common.activations import ComplexReLU, ComplexActivation, get_activation
from makani_tpu.models.common.layers import (
    Conv1x1,
    DropPath,
    MLP,
    EncoderDecoder,
    PatchEmbed,
    InstanceNorm2d,
    LayerNorm2d,
)
from makani_tpu.models.common.spectral_convolution import SpectralConv, SpectralAttention
