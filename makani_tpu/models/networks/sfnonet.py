"""Spherical / planar Fourier Neural Operator networks (flax.linen).

TPU-native re-design of the reference SFNO/FNO
(ref: makani/models/networks/sfnonet.py:119-673): the spectral transforms are
the Legendre-matmul SHT / truncated rFFT2 from makani_tpu.ops, all channel
mixing is MXU einsums, and activation checkpointing maps to nn.remat levels
(checkpointing>=1: encoder/decoder, >=2: block MLPs, >=3: whole blocks).
"""

import math
from functools import lru_cache
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from makani_tpu.models.common import (
    MLP,
    DropPath,
    EncoderDecoder,
    InstanceNorm2d,
    LayerNorm2d,
    SpectralConv,
    SpectralAttention,
    get_activation,
)
from makani_tpu.models.common.layers import Conv1x1, normal_init
from makani_tpu.ops import RealSHT, InverseRealSHT, RealFFT2, InverseRealFFT2


@lru_cache(maxsize=None)
def get_transform_pair(kind, nlat, nlon, lmax, mmax, grid):
    """Cached (forward, inverse) spectral transform factory. Tables are
    precomputed once per (shape, modes, grid) combination."""
    if kind == "sht":
        return (
            RealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid),
            InverseRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid),
        )
    elif kind == "fft":
        return (
            RealFFT2(nlat, nlon, lmax=lmax, mmax=mmax),
            InverseRealFFT2(nlat, nlon, lmax=lmax, mmax=mmax),
        )
    raise ValueError("Unknown spectral transform")


class SpectralFilterLayer(nn.Module):
    """Dispatch between linear spectral conv and non-linear spectral attention
    (ref: sfnonet.py:51-116)."""

    forward_transform: Any
    inverse_transform: Any
    embed_dim: int
    filter_type: str = "linear"
    operator_type: str = "diagonal"
    hidden_size_factor: float = 1.0
    factorization: str = None
    rank: float = 1.0
    separable: bool = False
    complex_activation: str = "real"
    spectral_layers: int = 1
    bias: bool = False
    drop_rate: float = 0.0
    gain: float = 1.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.filter_type == "non-linear":
            return SpectralAttention(
                self.forward_transform,
                self.inverse_transform,
                self.embed_dim,
                self.embed_dim,
                operator_type=self.operator_type,
                hidden_size_factor=int(self.hidden_size_factor),
                complex_activation=self.complex_activation,
                spectral_layers=self.spectral_layers,
                drop_rate=self.drop_rate,
                bias=self.bias,
                gain=self.gain,
                name="filter",
            )(x, deterministic=deterministic)
        elif self.filter_type == "linear" and self.factorization is not None:
            from makani_tpu.models.common.factorizations import FactorizedSpectralConv
            return FactorizedSpectralConv(
                self.forward_transform,
                self.inverse_transform,
                self.embed_dim,
                self.embed_dim,
                operator_type=self.operator_type,
                rank=self.rank,
                factorization=self.factorization,
                separable=self.separable,
                bias=self.bias,
                gain=self.gain,
                name="filter",
            )(x, deterministic=deterministic)
        elif self.filter_type == "linear":
            return SpectralConv(
                self.forward_transform,
                self.inverse_transform,
                self.embed_dim,
                self.embed_dim,
                operator_type=self.operator_type,
                separable=self.separable,
                bias=self.bias,
                gain=self.gain,
                name="filter",
            )(x)
        raise NotImplementedError(f"filter_type {self.filter_type}")


class FourierNeuralOperatorBlock(nn.Module):
    """filter -> norm0 -> inner skip -> act -> MLP -> norm1 -> drop_path ->
    outer skip -> (final act) (ref: sfnonet.py:119-267)."""

    forward_transform: Any
    inverse_transform: Any
    embed_dim: int
    filter_type: str = "linear"
    operator_type: str = "diagonal"
    mlp_ratio: float = 2.0
    mlp_drop_rate: float = 0.0
    path_drop_rate: float = 0.0
    act_name: str = "gelu"
    norm_layer: str = "instance_norm"
    factorization: str = None
    rank: float = 1.0
    separable: bool = False
    inner_skip: str = "none"
    outer_skip: Optional[str] = "linear"
    use_mlp: bool = False
    complex_activation: str = "real"
    spectral_layers: int = 1
    bias: bool = False
    final_activation: bool = False
    checkpointing: int = 0

    def _norm(self, name):
        if self.norm_layer == "instance_norm":
            return InstanceNorm2d(num_features=self.embed_dim, eps=1e-6, affine=True, name=name)
        elif self.norm_layer == "layer_norm":
            return LayerNorm2d(num_features=self.embed_dim, eps=1e-6, affine=True, name=name)
        elif self.norm_layer == "none":
            return lambda x: x
        raise NotImplementedError(f"normalization {self.norm_layer} not implemented")

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from makani_tpu.parallel import spmd

        act = get_activation(self.act_name)

        # canonical grid-space layout at block seams: batch/data, embed
        # channels/fin (the reference's fin ping-pong), lat/h, lon/w. Anchoring
        # every block at the same layout keeps the partitioner from inventing
        # mixed channel-and-space tilings whose backward resharding degenerates
        # to replicate-then-slice.
        if spmd.model_distributed():
            x = spmd.constrain(x, "data", "fin", "h", "w")

        # gain bookkeeping follows the reference init scheme (sfnonet.py:161-231)
        gain_factor = 1.0 if self.act_name == "identity" else 2.0
        if self.inner_skip in ("linear", "identity"):
            gain_factor /= 2.0

        x, residual = SpectralFilterLayer(
            self.forward_transform,
            self.inverse_transform,
            self.embed_dim,
            filter_type=self.filter_type,
            operator_type=self.operator_type,
            hidden_size_factor=self.mlp_ratio,
            factorization=self.factorization,
            rank=self.rank,
            separable=self.separable,
            complex_activation=self.complex_activation,
            spectral_layers=self.spectral_layers,
            bias=self.bias,
            drop_rate=self.path_drop_rate,
            gain=gain_factor,
        )(x, deterministic=deterministic)

        x = self._norm("norm0")(x)

        if self.inner_skip == "linear":
            x = x + Conv1x1(self.embed_dim, self.embed_dim, use_bias=False,
                            gain=gain_factor, name="inner_skip")(residual)
        elif self.inner_skip == "identity":
            x = x + residual
        elif self.inner_skip != "none":
            raise ValueError(f"Unknown skip connection type {self.inner_skip}")

        x = act(x)

        gain_factor = 2.0 if (self.final_activation and self.act_name != "identity") else 1.0
        if self.outer_skip in ("linear", "identity"):
            gain_factor /= 2.0

        if self.use_mlp:
            mlp_hidden_dim = int(self.embed_dim * self.mlp_ratio)
            x = MLP(
                in_features=self.embed_dim,
                hidden_features=mlp_hidden_dim,
                act_layer=act,
                drop_rate=self.mlp_drop_rate,
                drop_type="features",
                checkpointing=self.checkpointing,
                gain=gain_factor,
                name="mlp",
            )(x, deterministic=deterministic)

        x = self._norm("norm1")(x)

        if self.path_drop_rate > 0.0:
            x = DropPath(self.path_drop_rate, name="drop_path")(x, deterministic=deterministic)

        if self.outer_skip == "linear":
            x = x + Conv1x1(self.embed_dim, self.embed_dim, use_bias=False,
                            gain=gain_factor, name="outer_skip")(residual)
        elif self.outer_skip == "identity":
            x = x + residual
        elif self.outer_skip is not None and self.outer_skip != "none":
            raise ValueError(f"Unknown skip connection type {self.outer_skip}")

        if self.final_activation:
            x = act(x)

        return x


class SphericalFourierNeuralOperatorNet(nn.Module):
    """SFNO as in Bonev et al. (ref: sfnonet.py:270-640)."""

    spectral_transform: str = "sht"
    model_grid_type: str = "equiangular"
    sht_grid_type: str = "legendre-gauss"
    filter_type: str = "linear"
    operator_type: str = "dhconv"
    inp_shape: Tuple[int, int] = (721, 1440)
    out_shape: Tuple[int, int] = (721, 1440)
    scale_factor: int = 8
    inp_chans: int = 2
    out_chans: int = 2
    embed_dim: int = 32
    num_layers: int = 4
    repeat_layers: int = 1
    use_mlp: bool = True
    mlp_ratio: float = 2.0
    encoder_ratio: int = 1
    decoder_ratio: int = 1
    activation_function: str = "gelu"
    encoder_layers: int = 1
    pos_embed: str = "none"
    pos_drop_rate: float = 0.0
    path_drop_rate: float = 0.0
    mlp_drop_rate: float = 0.0
    normalization_layer: str = "instance_norm"
    max_modes: Optional[Tuple[int, int]] = None
    hard_thresholding_fraction: float = 1.0
    big_skip: bool = True
    factorization: str = None
    rank: float = 1.0
    separable: bool = False
    complex_activation: str = "real"
    spectral_layers: int = 3
    bias: bool = False
    checkpointing: int = 0
    scan_layers: bool = False

    def _transforms(self):
        h = int(self.inp_shape[0] // self.scale_factor)
        w = int(self.inp_shape[1] // self.scale_factor)
        if self.max_modes is not None:
            modes_lat, modes_lon = self.max_modes
        else:
            modes_lat = int(h * self.hard_thresholding_fraction)
            modes_lon = int((w // 2 + 1) * self.hard_thresholding_fraction)
        kind = self.spectral_transform
        trans_down, _ = get_transform_pair(kind, *self.inp_shape, modes_lat, modes_lon, self.model_grid_type)
        _, itrans_up = get_transform_pair(kind, *self.out_shape, modes_lat, modes_lon, self.model_grid_type)
        trans, itrans = get_transform_pair(kind, h, w, modes_lat, modes_lon, self.sht_grid_type)
        return trans_down, itrans_up, trans, itrans

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from makani_tpu.parallel import spmd

        trans_down, itrans_up, trans, itrans = self._transforms()
        act = get_activation(self.activation_function)

        # pin the canonical activation layout: batch over data, lat/lon over
        # the spatial mesh axes (2D domain decomposition, ref: SURVEY §5.7)
        if spmd.model_distributed():
            x = spmd.constrain(x, "data", None, "h", "w")

        if self.big_skip:
            if self.out_shape != self.inp_shape:
                xtype = x.dtype
                residual = x.astype(jnp.float32)
                residual = itrans_up(trans_down(residual)).astype(xtype)
            else:
                residual = x

        encoder = EncoderDecoder(
            num_layers=self.encoder_layers,
            input_dim=self.inp_chans,
            output_dim=self.embed_dim,
            hidden_dim=int(self.encoder_ratio * self.embed_dim),
            act_layer=act,
            name="encoder",
        )
        if self.checkpointing >= 1:
            x = nn.remat(type(encoder).__call__, prevent_cse=False)(encoder, x)
        else:
            x = encoder(x)

        # learned position embedding (ref: sfnonet.py:469-500,612-621)
        if self.pos_embed == "direct":
            pe = self.param(
                "pos_embed",
                nn.initializers.truncated_normal(stddev=0.02),
                (1, self.embed_dim, self.inp_shape[0], self.inp_shape[1]),
            )
            x = x + pe.astype(x.dtype)
        elif self.pos_embed == "frequency":
            lmax, mmax = itrans_up.lmax, itrans_up.mmax

            def tril_init(diag):
                def init(key, shape, dtype=jnp.float32):
                    w = 0.02 * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
                    mask = jnp.tril(jnp.ones((shape[-2], shape[-1]), dtype=bool), diag)
                    return w * mask
                return init

            rcoeffs = self.param("pos_embed_r", tril_init(0), (1, self.embed_dim, lmax, mmax))
            ccoeffs = self.param("pos_embed_c", tril_init(-1), (1, self.embed_dim, lmax, mmax - 1))
            cpad = jnp.pad(ccoeffs, ((0, 0), (0, 0), (0, 0), (1, 0)))
            pe = itrans_up(jax.lax.complex(rcoeffs, cpad))
            x = x + pe.astype(x.dtype)
        elif self.pos_embed not in ("none", "None", None):
            raise ValueError("Unknown position embedding type")

        if self.pos_drop_rate > 0.0:
            x = nn.Dropout(rate=self.pos_drop_rate)(x, deterministic=deterministic)

        dpr = np.linspace(0, self.path_drop_rate, self.num_layers)

        def block_cfg(i):
            first_layer = i == 0
            last_layer = i == self.num_layers - 1
            return dict(
                forward_transform=trans_down if first_layer else trans,
                inverse_transform=itrans_up if last_layer else itrans,
                embed_dim=self.embed_dim,
                filter_type=self.filter_type,
                operator_type=self.operator_type,
                mlp_ratio=self.mlp_ratio,
                mlp_drop_rate=self.mlp_drop_rate,
                path_drop_rate=float(dpr[i]),
                act_name=self.activation_function,
                norm_layer=self.normalization_layer,
                factorization=self.factorization,
                rank=self.rank,
                inner_skip="none",
                outer_skip="linear",
                use_mlp=self.use_mlp,
                separable=self.separable,
                complex_activation=self.complex_activation,
                spectral_layers=self.spectral_layers,
                bias=self.bias,
                checkpointing=self.checkpointing,
            )

        if self.scan_layers and self.num_layers > 2 and self.repeat_layers == 1:
            # structural loop over the identical middle blocks: one block's
            # program compiled once, weights stacked on a leading layer axis.
            # Shrinks the compiled program ~(num_layers-2)x. Middle blocks use
            # a constant path_drop_rate (scan requires identical structure).
            mid_cfg = block_cfg(1)
            mid_cfg["path_drop_rate"] = float(np.mean(dpr[1:-1]))

            x = FourierNeuralOperatorBlock(**block_cfg(0), name="blocks_0")(
                x, deterministic=deterministic)

            class _ScanBody(nn.Module):
                deterministic: bool

                @nn.compact
                def __call__(self, carry, _):
                    y = FourierNeuralOperatorBlock(**mid_cfg, name="block")(
                        carry, deterministic=self.deterministic)
                    return y, None

            # scan bodies must be rematerialized: scan-of-AD otherwise saves
            # every internal intermediate of every step
            body = nn.remat(_ScanBody, prevent_cse=False)
            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_layers - 2,
            )
            x, _ = scan(deterministic=deterministic, name="scan_blocks")(x, None)

            x = FourierNeuralOperatorBlock(**block_cfg(self.num_layers - 1),
                                           name=f"blocks_{self.num_layers - 1}")(
                x, deterministic=deterministic)
        else:
            blocks = [FourierNeuralOperatorBlock(**block_cfg(i), name=f"blocks_{i}")
                      for i in range(self.num_layers)]

            # weight-tied repeats (ref: sfnonet.py:577-585)
            for _ in range(self.repeat_layers):
                for blk in blocks:
                    if self.checkpointing >= 3:
                        x = nn.remat(type(blk).__call__, prevent_cse=False,
                                     static_argnums=(2,))(blk, x, deterministic)
                    else:
                        x = blk(x, deterministic=deterministic)

        decoder = EncoderDecoder(
            num_layers=self.encoder_layers,
            input_dim=self.embed_dim,
            output_dim=self.out_chans,
            hidden_dim=int(self.decoder_ratio * self.embed_dim),
            act_layer=act,
            gain=0.5 if self.big_skip else 1.0,
            name="decoder",
        )
        if self.checkpointing >= 1:
            x = nn.remat(type(decoder).__call__, prevent_cse=False)(decoder, x)
        else:
            x = decoder(x)

        if self.big_skip:
            std = math.sqrt(0.5 / self.inp_chans)
            rw = self.param("residual_transform", normal_init(std), (self.out_chans, self.inp_chans))
            x = x + jnp.einsum("bchw,oc->bohw", residual, rw.astype(residual.dtype))

        return x


class FourierNeuralOperatorNet(SphericalFourierNeuralOperatorNet):
    """Planar FNO = SFNO with FFT transforms (ref: sfnonet.py:657-673)."""

    spectral_transform: str = "fft"
