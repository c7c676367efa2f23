"""Full-SFNO forward + autoregressive-rollout parity vs the PyTorch reference.

The round-1 BASELINE north-star: prognostic fields allclose vs the PyTorch
reference after 10 AR steps. The reference consumes torch_harmonics only as
lat x (l-per-m) matmul modules (ref: makani/models/networks/sfnonet.py:502-571),
reproduced here by tests/th_shim.py from an INDEPENDENT float64 scipy
construction — so the reference SphericalFourierNeuralOperatorNet +
MultiStepWrapper eval path + Preprocessor2D run end-to-end, the torch weights
are copied into the flax model via the committed converter mapping
(makani_tpu/tools/convert_torch_checkpoint.py), and the rollouts are compared.

The fork's SingleStepWrapper hardcodes SST channel-20 masking and disables
add_residual (ref: makani/models/stepper.py:45-66), so the upstream single-step
semantics are exercised through MultiStepWrapper._forward_eval (ref:
stepper.py:123-145) — the exact per-step body of the reference inferencer's
rollout (ref: makani/utils/inferencer.py:167-206).

Measured parity floor (f32, exact-erf GELU, f64-built tables both sides):
single forward agrees to ~8e-8 of the field scale; a 10-step rollout
compounds roughly linearly to ~1.1e-6 of the field scale. Tolerances are
pinned ~10x above the measured floor.
"""

import importlib.util
import os
import sys
import types
from functools import partial

import numpy as np
import pytest

os.environ.setdefault("PYTORCH_JIT", "0")
torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import th_shim

REF_ROOT = "/root/reference/makani"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not present")


@pytest.fixture(autouse=True)
def serial_mesh():
    """Comparisons are serial-vs-serial; don't inherit a mesh left active by
    an earlier test module."""
    from makani_tpu.parallel import comm
    comm.reset()
    comm.init(devices=jax.devices()[:1])
    yield
    comm.reset()


def _load(modname, relpath):
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(REF_ROOT, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_sfno():
    """Reference SFNO + stepper + preprocessor, loaded leaf-by-leaf on top of
    the float64 torch_harmonics shim (overwrites any earlier raising stub)."""
    th_shim.install()

    for name in ["makani", "makani.utils", "makani.models",
                 "makani.models.common", "makani.models.networks",
                 "makani.mpu"]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m

    # serial comm stub
    comm = types.ModuleType("makani.utils.comm")
    comm.get_size = lambda name: 1
    comm.get_rank = lambda name: 0
    comm.get_group = lambda name: None
    sys.modules["makani.utils.comm"] = comm
    sys.modules["makani.utils"].comm = comm

    # modulus stubs: serial mappings are identities; Module.from_torch = id
    for name in ["modulus", "modulus.distributed", "modulus.models"]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
    mod_maps = types.ModuleType("modulus.distributed.mappings")
    for fn in ("scatter_to_parallel_region", "gather_from_parallel_region",
               "copy_to_parallel_region", "reduce_from_parallel_region"):
        setattr(mod_maps, fn, lambda x, *a, **k: x)
    sys.modules["modulus.distributed.mappings"] = mod_maps
    mod_utils = types.ModuleType("modulus.distributed.utils")
    mod_utils.compute_split_shapes = lambda size, n: [size]
    sys.modules["modulus.distributed.utils"] = mod_utils
    from dataclasses import dataclass

    @dataclass
    class ModelMetaData:
        name: str = ""
        jit: bool = False
        cuda_graphs: bool = False
        amp_cpu: bool = False
        amp_gpu: bool = False

    meta = types.ModuleType("modulus.models.meta")
    meta.ModelMetaData = ModelMetaData
    sys.modules["modulus.models.meta"] = meta
    sys.modules["modulus"].Module = types.SimpleNamespace(
        from_torch=lambda cls, m: cls)

    # tensorly / tltorch stubs (only the dense non-factorized path is used)
    tl = types.ModuleType("tensorly")
    tl.set_backend = lambda *a, **k: None
    sys.modules["tensorly"] = tl
    for name in ["tltorch", "tltorch.factorized_tensors"]:
        m = types.ModuleType(name)
        m.__path__ = []
        sys.modules[name] = m
    tlt_core = types.ModuleType("tltorch.factorized_tensors.core")

    class FactorizedTensor:  # isinstance target only
        pass

    tlt_core.FactorizedTensor = FactorizedTensor
    sys.modules["tltorch.factorized_tensors.core"] = tlt_core

    # mpu stubs (serial path never instantiates these)
    mpu_layers = types.ModuleType("makani.mpu.layers")
    for nm in ("DistributedRealFFT2", "DistributedInverseRealFFT2",
               "DistributedMLP", "DistributedEncoderDecoder",
               "DistributedMatmul", "DistributedAttention"):
        setattr(mpu_layers, nm, None)
    sys.modules["makani.mpu.layers"] = mpu_layers
    mpu_ln = types.ModuleType("makani.mpu.layer_norm")
    mpu_ln.DistributedInstanceNorm2d = None
    mpu_ln.DistributedLayerNorm = None
    sys.modules["makani.mpu.layer_norm"] = mpu_ln

    # reference leaves, in dependency order (re-exec under the SHT shim)
    contractions = _load("makani.models.common.contractions",
                         "models/common/contractions.py")
    activations = _load("makani.models.common.activations",
                        "models/common/activations.py")
    layers = _load("makani.models.common.layers", "models/common/layers.py")
    factorizations = _load("makani.models.common.factorizations",
                           "models/common/factorizations.py")
    spectral_convolution = _load("makani.models.common.spectral_convolution",
                                 "models/common/spectral_convolution.py")
    common = sys.modules["makani.models.common"]
    for leaf in ("ComplexReLU", "ComplexActivation"):
        setattr(common, leaf, getattr(activations, leaf))
    for leaf in ("DropPath", "PatchEmbed", "MLP", "EncoderDecoder",
                 "RealFFT2", "InverseRealFFT2"):
        setattr(common, leaf, getattr(layers, leaf))
    for leaf in ("SpectralConv", "FactorizedSpectralConv", "SpectralAttention"):
        setattr(common, leaf, getattr(spectral_convolution, leaf))

    grids = _load("makani.utils.grids", "utils/grids.py")
    sys.modules["makani.utils"].grids = grids
    sfnonet = _load("makani.models.networks.sfnonet", "models/networks/sfnonet.py")
    preprocessor = _load("makani.models.preprocessor", "models/preprocessor.py")
    sys.modules["makani.models"].preprocessor = preprocessor
    stepper = _load("makani.models.stepper", "models/stepper.py")

    return types.SimpleNamespace(
        sfnonet=sfnonet, stepper=stepper, preprocessor=preprocessor)


# ---------------------------------------------------------------------------
# config shared by both sides
# ---------------------------------------------------------------------------

NLAT, NLON = 24, 48
CHANS = 4
EMBED = 16
LAYERS = 2
SCALE = 2

ARCH = dict(
    spectral_transform="sht",
    model_grid_type="equiangular",
    sht_grid_type="legendre-gauss",
    filter_type="linear",
    operator_type="dhconv",
    inp_shape=(NLAT, NLON),
    out_shape=(NLAT, NLON),
    scale_factor=SCALE,
    inp_chans=CHANS,
    out_chans=CHANS,
    embed_dim=EMBED,
    num_layers=LAYERS,
    use_mlp=True,
    mlp_ratio=2.0,
    encoder_layers=1,
    pos_embed="direct",
    normalization_layer="instance_norm",
    hard_thresholding_fraction=1.0,
    big_skip=True,
    bias=False,
    checkpointing=0,
)


def _ref_params():
    """Minimal ParamsBase-alike for the reference Preprocessor2D/stepper."""
    from makani_tpu.utils import ParamsBase
    p = ParamsBase()
    p.update_params({
        "n_history": 0, "n_future": 0,
        "history_normalization_mode": "none",
        "target": "default",
        "normalize_residual": False,
        "add_grid": False, "add_zenith": False,
        "add_orography": False, "add_landmask": False,
        "aux_channel_names": [],
        "N_in_channels": CHANS, "N_out_channels": CHANS,
        "img_shape_x": NLAT, "img_shape_y": NLON,
        "img_crop_shape_x": NLAT, "img_crop_shape_y": NLON,
        "img_crop_offset_x": 0, "img_crop_offset_y": 0,
        "img_local_shape_x": NLAT, "img_local_shape_y": NLON,
        "img_local_offset_x": 0, "img_local_offset_y": 0,
        "data_grid_type": "equiangular", "model_grid_type": "equiangular",
        "data_num_shards": 1, "data_shard_id": 0,
        "in_channels": list(range(CHANS)), "out_channels": list(range(CHANS)),
        "dt": 1, "dhours": 6,
    })
    return p


def _jax_params():
    p = _ref_params()
    p.nettype = "SFNO"
    for k, v in ARCH.items():
        if k in ("inp_shape", "out_shape", "inp_chans", "out_chans"):
            continue
        p[k] = v
    # the reference's 'gelu' is exact erf GELU; pin it on the jax side
    p["activation_function"] = "gelu_exact"
    p["img_shape_x"], p["img_shape_y"] = NLAT, NLON
    return p


@pytest.fixture(scope="module")
def matched_models(ref_sfno):
    """Reference torch wrapper + flax model with the torch weights copied in."""
    from makani_tpu.models import model_registry
    from makani_tpu.tools.convert_torch_checkpoint import (
        map_reference_state_dict, apply_to_tree)

    torch.manual_seed(0)
    params = _ref_params()
    model_handle = partial(
        ref_sfno.sfnonet.SphericalFourierNeuralOperatorNet,
        activation_function="gelu", **ARCH)
    ref_model = ref_sfno.stepper.MultiStepWrapper(params, model_handle)
    ref_model.eval()
    ref_model.float()

    jax_model = model_registry.get_model(_jax_params())
    init_inp = jnp.zeros((1, CHANS, NLAT, NLON), jnp.float32)
    variables = jax.jit(lambda k: jax_model.init(k, init_inp, deterministic=True))(
        jax.random.PRNGKey(0))

    state_np = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    flat = map_reference_state_dict(state_np, encoder_layers=1)
    new_params, missing, unused = apply_to_tree(variables["params"], flat, strict=False)
    # every learnable leaf must be covered by the converter mapping
    assert not missing, f"unmapped flax params: {missing}"
    assert not unused, f"unused torch tensors: {unused}"
    return ref_sfno, ref_model, jax_model, {"params": new_params}


def test_sfno_forward_parity(matched_models):
    """Single SFNO step (preprocess -> net -> denormalize) agrees to f32
    accumulation error."""
    _, ref_model, jax_model, variables = matched_models
    rng = np.random.RandomState(1)
    x = rng.randn(2, CHANS, NLAT, NLON).astype(np.float32)

    with torch.no_grad():
        want = ref_model._forward_eval(torch.from_numpy(x).clone()).numpy()
    got = np.asarray(jax.jit(
        lambda v, a: jax_model.apply(v, a, deterministic=True))(
        variables, jnp.asarray(x)))

    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6 * scale)


def test_sfno_rollout_parity_10_steps(matched_models):
    """The BASELINE north-star: prognostic fields allclose after 10 AR steps.

    Rollout mirrors the reference inferencer's loop (ref: inferencer.py:
    167-206): pred = model(inpt); inpt = preprocessor.append_history(...).
    Measured: ~8e-8 of the field scale at step 0, compounding roughly
    linearly to ~1.1e-6 at step 9; pinned at 1e-5 of the field scale."""
    ref_sfno, ref_model, jax_model, variables = matched_models
    rng = np.random.RandomState(2)
    x = rng.randn(1, CHANS, NLAT, NLON).astype(np.float32)

    steps = 10
    want = []
    with torch.no_grad():
        inpt = torch.from_numpy(x).clone()
        for _ in range(steps):
            pred = ref_model._forward_eval(inpt)
            want.append(pred.numpy().copy())
            inpt = ref_model.preprocessor.append_history(inpt, pred, 0)

    prep = jax_model.preprocessor
    fwd = jax.jit(lambda v, a: jax_model.apply(v, a, deterministic=True))
    got = []
    inpt = jnp.asarray(x)
    for _ in range(steps):
        pred = fwd(variables, inpt)
        got.append(np.asarray(pred))
        inpt = prep.append_history(inpt, pred)

    scale = max(np.abs(w).max() for w in want)
    for idt, (w, g) in enumerate(zip(want, got)):
        np.testing.assert_allclose(
            g, w, rtol=1e-5, atol=1e-5 * scale,
            err_msg=f"rollout diverged at AR step {idt}")


# ---------------------------------------------------------------------------
# rich-preprocessor variants: statics + zenith + history, and residual mode
# ---------------------------------------------------------------------------

def _install_conditioning_stub(tmp_path_factory):
    """Reference conditioning_inputs needs netCDF4 (absent); stub it with
    loaders that read the SAME .npy files the makani_tpu side reads, keeping
    the reference's value semantics (orography min-max to [0, 1], raw lsm)."""
    rng = np.random.RandomState(7)
    d = tmp_path_factory.mktemp("statics")
    oro = rng.rand(NLAT, NLON).astype(np.float32)
    lsm = (rng.rand(NLAT, NLON) > 0.5).astype(np.float32)
    oro_path, lsm_path = str(d / "orography.npy"), str(d / "lsm.npy")
    np.save(oro_path, oro)
    np.save(lsm_path, lsm)

    cond = types.ModuleType("makani.utils.conditioning_inputs")
    cond.get_orography = lambda p: (lambda a: (a - a.min()) / (a.max() - a.min()))(np.load(p))
    cond.get_land_mask = lambda p: np.load(p)
    sys.modules["makani.utils.conditioning_inputs"] = cond
    return oro_path, lsm_path


def _rich_params(oro_path, lsm_path):
    p = _ref_params()
    p.update_params({
        "n_history": 1,
        "add_zenith": True,
        "add_grid": True, "gridtype": "sinusoidal", "grid_num_frequencies": 2,
        "add_orography": True, "orography_path": oro_path,
        "add_landmask": True, "landmask_path": lsm_path,
    })
    return p


def test_sfno_rollout_parity_rich_preprocessor(ref_sfno, tmp_path_factory):
    """North-star fidelity config: history window (n_history=1), zenith-angle
    unpredicted channels rolled through the AR loop, sinusoidal grid +
    orography + landmask statics — the flagship's full preprocessor path
    (ref: preprocessor.py:66-159,204-240,378-423)."""
    from makani_tpu.models import model_registry
    from makani_tpu.tools.convert_torch_checkpoint import (
        map_reference_state_dict, apply_to_tree)

    oro_path, lsm_path = _install_conditioning_stub(tmp_path_factory)
    ref_params = _rich_params(oro_path, lsm_path)

    n_statics = 2 * 2 + 1 + 2  # sin grid (2 freq x 2) + oro + lsm one-hot(2)
    in_chans = 2 * (CHANS + 1) + n_statics  # (n_history+1) * (C + zenith)
    arch = dict(ARCH)
    arch["inp_chans"] = in_chans
    arch["pos_embed"] = "none"

    torch.manual_seed(1)
    model_handle = partial(
        ref_sfno.sfnonet.SphericalFourierNeuralOperatorNet,
        activation_function="gelu", **arch)
    ref_model = ref_sfno.stepper.MultiStepWrapper(ref_params, model_handle)
    ref_model.eval()
    ref_model.float()

    jax_params = _rich_params(oro_path, lsm_path)
    jax_params.nettype = "SFNO"
    for k, v in arch.items():
        if k not in ("inp_shape", "out_shape", "inp_chans", "out_chans"):
            jax_params[k] = v
    jax_params["activation_function"] = "gelu_exact"
    jax_params["N_in_channels"] = in_chans
    jax_model = model_registry.get_model(jax_params)

    init_inp = jnp.zeros((1, 2 * CHANS, NLAT, NLON), jnp.float32)
    init_zen = jnp.zeros((1, 2, 1, NLAT, NLON), jnp.float32)
    variables = jax.jit(lambda k: jax_model.init(
        k, init_inp, unpredicted_inp=init_zen, deterministic=True))(
        jax.random.PRNGKey(0))

    state_np = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    flat = map_reference_state_dict(state_np, encoder_layers=1)
    new_params, missing, unused = apply_to_tree(variables["params"], flat, strict=False)
    assert not missing and not unused, (missing, unused)
    variables = {"params": new_params}

    rng = np.random.RandomState(3)
    steps = 5
    x = rng.randn(1, 2, CHANS, NLAT, NLON).astype(np.float32)
    zen_inp = rng.randn(1, 2, 1, NLAT, NLON).astype(np.float32)
    zen_tar = rng.randn(1, steps, 1, NLAT, NLON).astype(np.float32)

    # reference rollout (ref: inferencer.py:167-206)
    want = []
    with torch.no_grad():
        prep_t = ref_model.preprocessor
        # .clone() throughout: the reference preprocessor copies into its
        # cached tensors IN PLACE and from_numpy aliases the numpy buffers
        prep_t.cache_unpredicted_features(
            None, None, torch.from_numpy(zen_inp).clone(),
            torch.from_numpy(zen_tar).clone())
        inpt = prep_t.flatten_history(torch.from_numpy(x).clone())
        for idt in range(steps):
            pred = ref_model._forward_eval(inpt)
            want.append(pred.numpy().copy())
            inpt = prep_t.append_history(inpt, pred, idt)

    # makani_tpu rollout (Inferencer loop shape)
    prep_j = jax_model.preprocessor
    fwd = jax.jit(lambda v, a, u: jax_model.apply(
        v, a, unpredicted_inp=u, deterministic=True))
    inpt = prep_j.flatten_history(jnp.asarray(x))
    uinp = jnp.asarray(zen_inp)
    zt = jnp.asarray(zen_tar)
    got = []
    for idt in range(steps):
        pred = fwd(variables, inpt, uinp)
        got.append(np.asarray(pred))
        uinp = prep_j.advance_unpredicted_dyn(uinp, zt, idt)
        inpt = prep_j.append_history(inpt, pred)

    scale = max(np.abs(w).max() for w in want)
    for idt, (w, g) in enumerate(zip(want, got)):
        np.testing.assert_allclose(
            g, w, rtol=1e-5, atol=1e-5 * scale,
            err_msg=f"rich rollout diverged at AR step {idt}")


def test_sfno_rollout_parity_residual_mode(ref_sfno):
    """Residual-learning mode (target='residual'): add_residual adds the model
    output onto the latest history frame (ref: preprocessor.py:175-187)."""
    from makani_tpu.models import model_registry
    from makani_tpu.tools.convert_torch_checkpoint import (
        map_reference_state_dict, apply_to_tree)

    torch.manual_seed(2)
    ref_params = _ref_params()
    ref_params["target"] = "residual"
    model_handle = partial(
        ref_sfno.sfnonet.SphericalFourierNeuralOperatorNet,
        activation_function="gelu", **ARCH)
    ref_model = ref_sfno.stepper.MultiStepWrapper(ref_params, model_handle)
    ref_model.eval()
    ref_model.float()

    jax_params = _jax_params()
    jax_params["target"] = "residual"
    jax_model = model_registry.get_model(jax_params)
    init_inp = jnp.zeros((1, CHANS, NLAT, NLON), jnp.float32)
    variables = jax.jit(lambda k: jax_model.init(k, init_inp, deterministic=True))(
        jax.random.PRNGKey(0))
    state_np = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    flat = map_reference_state_dict(state_np, encoder_layers=1)
    new_params, missing, unused = apply_to_tree(variables["params"], flat, strict=False)
    assert not missing and not unused, (missing, unused)
    variables = {"params": new_params}

    rng = np.random.RandomState(4)
    x = rng.randn(1, CHANS, NLAT, NLON).astype(np.float32)
    steps = 5
    want = []
    with torch.no_grad():
        inpt = torch.from_numpy(x).clone()
        for idt in range(steps):
            pred = ref_model._forward_eval(inpt)
            want.append(pred.numpy().copy())
            inpt = ref_model.preprocessor.append_history(inpt, pred, idt)

    prep = jax_model.preprocessor
    fwd = jax.jit(lambda v, a: jax_model.apply(v, a, deterministic=True))
    inpt = jnp.asarray(x)
    got = []
    for idt in range(steps):
        pred = fwd(variables, inpt)
        got.append(np.asarray(pred))
        inpt = prep.append_history(inpt, pred)

    scale = max(np.abs(w).max() for w in want)
    for idt, (w, g) in enumerate(zip(want, got)):
        np.testing.assert_allclose(
            g, w, rtol=1e-5, atol=1e-5 * scale,
            err_msg=f"residual rollout diverged at AR step {idt}")


@pytest.mark.parametrize("variant", ["fno", "frequency_pos_embed", "downscale", "spectral_attention"])
def test_sfno_variant_forward_parity(ref_sfno, variant):
    """Two more reference-vs-flax network variants under the same
    weight-copy harness: the planar FNO (spectral_transform='fft', the
    reference's own RealFFT2 wrappers — no SHT shim involved) and the
    'frequency' learned-spectral position embedding (synthesized through
    itrans_up, ref: sfnonet.py:487-493,613-616)."""
    from makani_tpu.models import model_registry
    from makani_tpu.tools.convert_torch_checkpoint import (
        map_reference_state_dict, apply_to_tree)

    arch = dict(ARCH)
    if variant == "fno":
        arch["spectral_transform"] = "fft"
        arch["pos_embed"] = "none"
    elif variant == "frequency_pos_embed":
        arch["pos_embed"] = "frequency"
    elif variant == "downscale":
        # out_shape != inp_shape: the big-skip residual resamples through
        # trans_down/itrans_up (ref: sfnonet.py:588-602) and SpectralConv
        # computes scale_residual through the transforms
        arch["out_shape"] = (NLAT // 2, NLON // 2)
        arch["pos_embed"] = "none"
    else:
        # non-linear spectral attention filter (ref:
        # spectral_convolution.py:268-405 under the SHT shim)
        arch["filter_type"] = "non-linear"
        arch["operator_type"] = "diagonal"
        arch["pos_embed"] = "none"

    torch.manual_seed(3)
    params = _ref_params()
    model_handle = partial(
        ref_sfno.sfnonet.SphericalFourierNeuralOperatorNet,
        activation_function="gelu", **arch)
    ref_model = ref_sfno.stepper.MultiStepWrapper(params, model_handle)
    ref_model.eval()
    ref_model.float()

    jax_params = _jax_params()
    for k in ("spectral_transform", "pos_embed", "filter_type", "operator_type"):
        jax_params[k] = arch[k]
    if variant == "downscale":
        jax_params["out_shape_x"], jax_params["out_shape_y"] = arch["out_shape"]
    jax_model = model_registry.get_model(jax_params)
    init_inp = jnp.zeros((1, CHANS, NLAT, NLON), jnp.float32)
    variables = jax.jit(lambda k: jax_model.init(k, init_inp, deterministic=True))(
        jax.random.PRNGKey(0))

    state_np = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    flat = map_reference_state_dict(state_np, encoder_layers=1)
    new_params, missing, unused = apply_to_tree(variables["params"], flat, strict=False)
    assert not missing and not unused, (missing, unused)
    variables = {"params": new_params}

    rng = np.random.RandomState(5)
    x = rng.randn(1, CHANS, NLAT, NLON).astype(np.float32)
    try:
        with torch.no_grad():
            want = ref_model._forward_eval(torch.from_numpy(x).clone()).numpy()
    except RuntimeError as e:
        if variant == "spectral_attention" and "einsum" in str(e):
            # documented upstream breakage: SpectralAttention.forward_mlp
            # passes view_as_real (5-D) tensors into the complex-operand
            # 4-subscript contractions (ref: spectral_convolution.py:361-376
            # vs contractions.py:49-54) — the reference cannot run this path
            # at all. makani_tpu implements the documented semantics; the
            # contraction kernels themselves are parity-pinned in
            # tests/test_torch_parity.py. Verify our side runs finite.
            got = np.asarray(jax.jit(
                lambda v, a: jax_model.apply(v, a, deterministic=True))(
                variables, jnp.asarray(x)))
            assert np.isfinite(got).all()
            return
        raise
    got = np.asarray(jax.jit(
        lambda v, a: jax_model.apply(v, a, deterministic=True))(
        variables, jnp.asarray(x)))

    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=3e-6 * scale)


def test_sfno_distributed_rollout_matches_torch_reference(matched_models):
    """North-star squared: the flax SFNO running DISTRIBUTED on an
    (h=2, w=2, fin=2) 8-device mesh with sharded params must still match the
    serial torch reference rollout — parity and the GSPMD partitioner
    composed in one gate."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from makani_tpu.parallel import comm
    from makani_tpu.parallel.partitioning import get_param_shardings, shard_tree

    _, ref_model, jax_model, variables = matched_models
    rng = np.random.RandomState(6)
    x = rng.randn(1, CHANS, NLAT, NLON).astype(np.float32)

    steps = 5
    want = []
    with torch.no_grad():
        inpt = torch.from_numpy(x).clone()
        for idt in range(steps):
            pred = ref_model._forward_eval(inpt)
            want.append(pred.numpy().copy())
            inpt = ref_model.preprocessor.append_history(inpt, pred, idt)

    comm.reset()
    comm.init(model_parallel_sizes=[2, 2, 2, 1], devices=jax.devices()[:8])
    try:
        mesh = comm.get_mesh()
        shardings = get_param_shardings(variables["params"], mesh)
        vshard = {"params": shard_tree(variables["params"], shardings)}
        xd = jax.device_put(x, NamedSharding(mesh, P("data")))

        prep = jax_model.preprocessor
        fwd = jax.jit(lambda v, a: jax_model.apply(v, a, deterministic=True))
        inpt = xd
        got = []
        for _ in range(steps):
            pred = fwd(vshard, inpt)
            got.append(np.asarray(pred))
            inpt = prep.append_history(inpt, pred)
    finally:
        comm.reset()

    scale = max(np.abs(w).max() for w in want)
    for idt, (w, g) in enumerate(zip(want, got)):
        np.testing.assert_allclose(
            g, w, rtol=2e-4, atol=2e-4 * scale,
            err_msg=f"distributed rollout diverged at AR step {idt}")
