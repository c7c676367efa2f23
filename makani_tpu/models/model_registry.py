"""Model registry: name -> flax network class, with stepper wrapping.

Parity with ref: makani/models/model_registry.py:34-170. The reference uses
python entry points; a plain dict registry covers the same capability and
``register_model`` supports both classes and "path/to/file.py:ClassName"
strings for dynamic registration.
"""

import importlib.util
import os
from dataclasses import fields as dataclass_fields
from typing import List, Optional, Union

import flax.linen as nn

from makani_tpu.models.preprocessor import Preprocessor2D
from makani_tpu.models.stepper import SingleStepWrapper, MultiStepWrapper
from makani_tpu.models.networks.sfnonet import (
    SphericalFourierNeuralOperatorNet,
    FourierNeuralOperatorNet,
)
from makani_tpu.models.networks.afnonet import AdaptiveFourierNeuralOperatorNetV1
from makani_tpu.models.networks.afnonet_v2 import AdaptiveFourierNeuralOperatorNet
from makani_tpu.models.networks.vit import VisionTransformer
from makani_tpu.models.networks.debug import DebugNet


# built-in registry (the reference registers these via entry points,
# pyproject.toml:106-115)
_model_registry = {
    "SFNO": SphericalFourierNeuralOperatorNet,
    "FNO": FourierNeuralOperatorNet,
    "AFNO": AdaptiveFourierNeuralOperatorNet,
    "AFNOv1": AdaptiveFourierNeuralOperatorNetV1,
    "ViT": VisionTransformer,
    "DebugNet": DebugNet,
}


def _register_from_module(model, name: Optional[str] = None) -> None:
    if not (isinstance(model, type) and issubclass(model, nn.Module)):
        raise ValueError(
            f"Only subclasses of flax.linen.Module can be registered. Provided model is of type {type(model)}"
        )
    if name is None:
        name = model.__name__
    if name in _model_registry:
        raise ValueError(f"Name {name} already in use")
    _model_registry[name] = model


def _register_from_file(model_string: str, name: Optional[str] = None) -> None:
    assert len(model_string.split(":")) == 2
    model_path, model_handle = model_string.split(":")
    if not os.path.exists(model_path):
        raise ValueError(
            f"Expected string of format 'path/to/model_file.py:ModuleName' but {model_path} does not exist."
        )
    module_spec = importlib.util.spec_from_file_location(model_handle, model_path)
    module = importlib.util.module_from_spec(module_spec)
    module_spec.loader.exec_module(module)
    model = getattr(module, model_handle)
    _register_from_module(model, name)


def register_model(model, name: Optional[str] = None) -> None:
    if isinstance(model, str):
        _register_from_file(model, name)
    else:
        _register_from_module(model, name)


def list_models() -> List[str]:
    return list(_model_registry.keys())


def _filter_kwargs(cls, kwargs):
    """Keep only kwargs that are dataclass fields of the network module."""
    valid = {f.name for f in dataclass_fields(cls)}
    return {k: v for k, v in kwargs.items() if k in valid}


def get_model(params, **kwargs):
    """Construct the requested network and wrap it in a stepper
    (ref: model_registry.py:119-166)."""

    inp_shape = (params.img_crop_shape_x, params.img_crop_shape_y)
    out_shape = (
        (params.out_shape_x, params.out_shape_y)
        if hasattr(params, "out_shape_x") and hasattr(params, "out_shape_y")
        else inp_shape
    )
    inp_chans = params.N_in_channels
    out_chans = params.N_out_channels

    if params.nettype not in _model_registry:
        register_model(params.nettype, params.nettype)

    cls = _model_registry[params.nettype]
    all_kwargs = dict(params.to_dict())
    all_kwargs.update(kwargs)
    all_kwargs.update(
        inp_shape=tuple(inp_shape), out_shape=tuple(out_shape),
        inp_chans=inp_chans, out_chans=out_chans,
    )
    # tuple-ify list-valued config entries (flax modules must be hashable)
    for k, v in list(all_kwargs.items()):
        if isinstance(v, list):
            all_kwargs[k] = tuple(v)
    net = cls(**_filter_kwargs(cls, all_kwargs))

    preprocessor = Preprocessor2D(params)
    lsm_mask_channels = tuple(params.get("lsm_mask_channels", ()) or ())

    if params.n_future > 0:
        model = MultiStepWrapper(
            preprocessor=preprocessor, model=net, n_future=params.n_future,
            lsm_mask_channels=lsm_mask_channels,
        )
    else:
        model = SingleStepWrapper(
            preprocessor=preprocessor, model=net,
            lsm_mask_channels=lsm_mask_channels,
        )
    return model
