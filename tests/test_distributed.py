"""Distributed-vs-serial allclose tests on a virtual 8-device CPU mesh.

The TPU-world analog of the reference's torchrun GRID_H x GRID_W tests
(ref: tests/distributed/tests_fft.py:53-134): run the same transform/model
serially and on a (data x h x w) mesh with sharded inputs, compare outputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.parallel import comm
from makani_tpu.ops import RealSHT, InverseRealSHT, RealFFT2, InverseRealFFT2


@pytest.fixture
def spatial_mesh():
    comm.reset()
    comm.init(model_parallel_sizes=[2, 2, 1, 1], devices=jax.devices()[:8])
    yield comm.get_mesh()
    comm.reset()


def _sharded(mesh, x):
    """Inputs enter sharded on batch only; spatial sharding is established by
    the in-graph constraints (uneven lat/lon sizes are padded by XLA there,
    while explicit input shardings require divisibility)."""
    return jax.device_put(x, NamedSharding(mesh, P("data")))


@pytest.mark.parametrize("nlat,nlon", [(32, 64), (33, 64)])
def test_distributed_sht_matches_serial(spatial_mesh, nlat, nlon):
    mesh = spatial_mesh
    grid = "legendre-gauss" if nlat % 2 == 0 else "equiangular"
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, nlat, nlon).astype(np.float32)

    # serial reference (computed with no mesh active)
    comm.reset()
    sht = RealSHT(nlat, nlon, grid=grid)
    isht = InverseRealSHT(nlat, nlon, grid=grid)
    y_serial = np.asarray(jax.jit(lambda v: sht(v))(jnp.asarray(x)))
    r_serial = np.asarray(jax.jit(lambda v: isht(sht(v)))(jnp.asarray(x)))

    # distributed
    comm.init(model_parallel_sizes=[2, 2, 1, 1], devices=jax.devices()[:8])
    xd = _sharded(mesh, x)
    y_dist = np.asarray(jax.jit(lambda v: sht(v))(xd))
    r_dist = np.asarray(jax.jit(lambda v: isht(sht(v)))(xd))

    np.testing.assert_allclose(y_dist, y_serial, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(r_dist, r_serial, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("lmax,mmax", [(32, 33), (16, 17)])
def test_distributed_fft2_matches_serial(spatial_mesh, lmax, mmax):
    mesh = spatial_mesh
    nlat, nlon = 32, 64
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, nlat, nlon).astype(np.float32)

    comm.reset()
    fft = RealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)
    ifft = InverseRealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)
    y_serial = np.asarray(jax.jit(lambda v: fft(v))(jnp.asarray(x)))
    r_serial = np.asarray(jax.jit(lambda v: ifft(fft(v)))(jnp.asarray(x)))

    comm.init(model_parallel_sizes=[2, 2, 1, 1], devices=jax.devices()[:8])
    xd = _sharded(mesh, x)
    y_dist = np.asarray(jax.jit(lambda v: fft(v))(xd))
    r_dist = np.asarray(jax.jit(lambda v: ifft(fft(v)))(xd))

    np.testing.assert_allclose(y_dist, y_serial, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(r_dist, r_serial, rtol=1e-5, atol=1e-5)


def test_distributed_fft3_matches_serial(spatial_mesh):
    """3D transform under a spatial mesh (depth stays local, lat/lon sharded
    on entry — ref: makani/mpu/fft3d.py distributed variants)."""
    from makani_tpu.ops.fft3d import RealFFT3, InverseRealFFT3

    mesh = spatial_mesh
    nd, nlat, nlon = 4, 16, 32
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, nd, nlat, nlon).astype(np.float32)

    comm.reset()
    fft = RealFFT3(nd, nlat, nlon, ldmax=4, lhmax=8, lwmax=9)
    ifft = InverseRealFFT3(nd, nlat, nlon, ldmax=4, lhmax=8, lwmax=9)
    y_serial = np.asarray(jax.jit(lambda v: fft(v))(jnp.asarray(x)))
    r_serial = np.asarray(jax.jit(lambda v: ifft(fft(v)))(jnp.asarray(x)))

    comm.init(model_parallel_sizes=[2, 2, 1, 1], devices=jax.devices()[:8])
    # enter with lat/lon sharded over (h, w) like activations mid-model
    xd = jax.device_put(x, NamedSharding(mesh, P("data", None, None, "h", "w")))
    y_dist = np.asarray(jax.jit(lambda v: fft(v))(xd))
    r_dist = np.asarray(jax.jit(lambda v: ifft(fft(v)))(xd))

    np.testing.assert_allclose(y_dist, y_serial, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(r_dist, r_serial, rtol=1e-5, atol=1e-5)


def test_distributed_sfno_matches_serial(spatial_mesh):
    """Full SFNO forward: serial vs (data=2, h=2, w=2) mesh."""
    from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet

    mesh = spatial_mesh
    model = SphericalFourierNeuralOperatorNet(
        inp_shape=(32, 64), out_shape=(32, 64), scale_factor=2,
        inp_chans=3, out_chans=3, embed_dim=16, num_layers=2,
        operator_type="dhconv", normalization_layer="instance_norm",
        use_mlp=True, mlp_ratio=2.0)

    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 32, 64).astype(np.float32)

    comm.reset()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    y_serial = np.asarray(jax.jit(lambda v, a: model.apply(v, a))(variables, jnp.asarray(x)))

    comm.init(model_parallel_sizes=[2, 2, 1, 1], devices=jax.devices()[:8])
    xd = _sharded(mesh, x)
    y_dist = np.asarray(jax.jit(lambda v, a: model.apply(v, a))(variables, xd))

    np.testing.assert_allclose(y_dist, y_serial, rtol=2e-4, atol=2e-4)


def test_distributed_grads_match_serial(spatial_mesh):
    """Gradient parity: the SPMD partitioner must produce the same gradients
    as the serial program (replaces the reference's gradient-hook tests)."""
    from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet

    mesh = spatial_mesh
    model = SphericalFourierNeuralOperatorNet(
        inp_shape=(16, 32), out_shape=(16, 32), scale_factor=2,
        inp_chans=2, out_chans=2, embed_dim=8, num_layers=2,
        operator_type="dhconv", normalization_layer="instance_norm",
        use_mlp=True)

    rng = np.random.RandomState(3)
    x = rng.randn(2, 2, 16, 32).astype(np.float32)

    def loss_fn(v, a):
        return jnp.mean(model.apply(v, a) ** 2)

    comm.reset()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    g_serial = jax.jit(jax.grad(loss_fn))(variables, jnp.asarray(x))

    comm.init(model_parallel_sizes=[2, 2, 1, 1], devices=jax.devices()[:8])
    xd = _sharded(mesh, x)
    g_dist = jax.jit(jax.grad(loss_fn))(variables, xd)

    for a, b in zip(jax.tree.leaves(g_serial), jax.tree.leaves(g_dist)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_tensor_parallel_sfno_matches_serial():
    """Channel (fin/fout) parallelism: params sharded per the partitioning
    rules on a (data=2, fin=2, fout=2) mesh must reproduce serial outputs."""
    from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet
    from makani_tpu.parallel.partitioning import get_param_shardings

    model = SphericalFourierNeuralOperatorNet(
        inp_shape=(16, 32), out_shape=(16, 32), scale_factor=2,
        inp_chans=2, out_chans=2, embed_dim=8, num_layers=2,
        operator_type="dhconv", normalization_layer="instance_norm",
        use_mlp=True)

    rng = np.random.RandomState(4)
    x = rng.randn(2, 2, 16, 32).astype(np.float32)

    comm.reset()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    y_serial = np.asarray(jax.jit(lambda v, a: model.apply(v, a))(variables, jnp.asarray(x)))

    comm.init(model_parallel_sizes=[1, 1, 2, 2], devices=jax.devices()[:8])
    mesh = comm.get_mesh()
    shardings = get_param_shardings(variables["params"], mesh)
    vshard = {"params": jax.device_put(variables["params"], shardings)}
    xd = jax.device_put(x, NamedSharding(mesh, P("data")))
    y_tp = np.asarray(jax.jit(lambda v, a: model.apply(v, a))(vshard, xd))
    comm.reset()

    np.testing.assert_allclose(y_tp, y_serial, rtol=2e-4, atol=2e-4)


def test_distributed_trainer_end_to_end(tmp_path):
    """Full Trainer on a (data=2, h=2, w=2) mesh with synthetic data: the
    jitted train/eval steps must run under GSPMD with sharded batches."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from testutils import get_default_parameters, init_dataset
    from makani_tpu.utils.trainer import Trainer

    comm.reset()
    comm.init(model_parallel_sizes=[2, 2, 1, 1], devices=jax.devices()[:8])
    try:
        params = get_default_parameters()
        params.nettype = "SFNO"
        params.update_params({
            "embed_dim": 16, "num_layers": 2, "scale_factor": 2,
            "use_mlp": True, "mlp_ratio": 2.0, "activation_function": "gelu",
            "pos_embed": "none", "operator_type": "dhconv", "filter_type": "linear",
            "normalization_layer": "instance_norm", "loss": "geometric l2",
            "lr": 1e-4, "batch_size": 1, "max_epochs": 1,
            "n_train_samples_per_epoch": 4, "n_eval_samples": 2,
            "valid_autoreg_steps": 1, "scheduler": "none",
            "optimizer_type": "Adam", "save_checkpoint": "none",
            "enable_synthetic_data": True,
        })
        params = init_dataset(str(tmp_path), params, n_samples_per_year=8, n_years=1)
        params["experiment_dir"] = str(tmp_path / "exp")
        params["checkpoint_path"] = str(tmp_path / "exp" / "ckpt")
        params["best_checkpoint_path"] = str(tmp_path / "exp" / "best_ckpt")

        trainer = Trainer(params, world_rank=0)
        # global batch = local batch x data size
        assert trainer.data_parallel_size == 2
        trainer.train()
        assert trainer.iters > 0
        assert np.isfinite(trainer.metrics.logs["base"]["validation loss"])
    finally:
        comm.reset()


def test_distributed_multistep_trainer(tmp_path):
    """Multistep AR training (n_future=1) under spatial+channel parallelism
    (data=2, h=2, fin=2): the unrolled MultiStepWrapper step must compile and
    run under GSPMD with finite loss (ref: stepper.py:84-121 under the
    parallelism checklist SURVEY §2.13)."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from testutils import get_default_parameters, init_dataset
    from makani_tpu.utils.trainer import Trainer

    comm.reset()
    comm.init(model_parallel_sizes=[2, 1, 2, 1], devices=jax.devices()[:8])
    try:
        params = get_default_parameters()
        params.nettype = "SFNO"
        params.update_params({
            "embed_dim": 16, "num_layers": 2, "scale_factor": 2,
            "use_mlp": True, "mlp_ratio": 2.0, "activation_function": "gelu",
            "pos_embed": "none", "operator_type": "dhconv", "filter_type": "linear",
            "normalization_layer": "instance_norm", "loss": "geometric l2",
            "lr": 1e-4, "batch_size": 1, "max_epochs": 1,
            "n_train_samples_per_epoch": 4, "n_eval_samples": 2,
            "valid_autoreg_steps": 1, "scheduler": "none",
            "optimizer_type": "Adam", "save_checkpoint": "none",
            "enable_synthetic_data": True,
            "multistep_count": 2, "n_future": 1,
        })
        params = init_dataset(str(tmp_path), params, n_samples_per_year=8, n_years=1)
        params["experiment_dir"] = str(tmp_path / "exp")
        params["checkpoint_path"] = str(tmp_path / "exp" / "ckpt")
        params["best_checkpoint_path"] = str(tmp_path / "exp" / "best_ckpt")

        trainer = Trainer(params, world_rank=0)
        trainer.train()
        assert trainer.iters > 0
        assert np.isfinite(trainer.metrics.logs["base"]["validation loss"])
    finally:
        comm.reset()


def test_opt_state_shardings_mirror_params():
    """Sharded optimizer state: Adam moment buffers must inherit their
    parameter's PartitionSpec (the multi-chip memory lever for the edim384
    flagship, ref: SURVEY §2.3 parameter protocol applied to optimizer
    state)."""
    import optax
    from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet
    from makani_tpu.parallel.partitioning import (
        get_opt_state_shardings, get_param_shardings)

    comm.reset()
    comm.init(model_parallel_sizes=[2, 2, 2, 1], devices=jax.devices()[:8])
    try:
        model = SphericalFourierNeuralOperatorNet(
            inp_shape=(16, 32), out_shape=(16, 32), scale_factor=2,
            inp_chans=2, out_chans=2, embed_dim=8, num_layers=2,
            operator_type="dhconv", use_mlp=True)
        x = jnp.zeros((1, 2, 16, 32), jnp.float32)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

        mesh = comm.get_mesh()
        pshard = get_param_shardings(variables["params"], mesh)
        tx = optax.adam(1e-3)
        opt_state = jax.jit(tx.init)({"model": variables["params"]})
        oshard = get_opt_state_shardings(opt_state, {"model": variables["params"]}, mesh)

        # every param with a non-trivial spec has mu/nu sharded the same way
        pflat, _ = jax.tree_util.tree_flatten_with_path(pshard)
        specs_by_suffix = {
            "/".join(str(getattr(k, "key", k)) for k in kp): s.spec
            for kp, s in pflat}
        oflat, _ = jax.tree_util.tree_flatten_with_path(oshard)
        matched = 0
        for kp, s in oflat:
            path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
            for suffix, spec in specs_by_suffix.items():
                if path.endswith(suffix) and ("mu/" in path or "nu/" in path):
                    assert s.spec == spec, f"{path}: {s.spec} != {spec}"
                    matched += 1
        nontrivial = sum(1 for sp in specs_by_suffix.values() if sp != P())
        assert matched >= 2 * nontrivial > 0
    finally:
        comm.reset()


def test_split_data_channels_matches_unsplit(tmp_path):
    """split_data_channels shards the metric channel dim over matmul
    (ref: makani/train.py:51, metric.py:87-91,222-243): validation metrics
    must be identical with the flag on and off on a (data=2, fin=2, fout=2)
    mesh."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from testutils import get_default_parameters, init_dataset
    from makani_tpu.utils.trainer import Trainer

    results = {}
    for split in (False, True):
        comm.reset()
        comm.init(model_parallel_sizes=[1, 1, 2, 2], devices=jax.devices()[:8])
        try:
            params = get_default_parameters()
            params.nettype = "SFNO"
            params.update_params({
                "embed_dim": 16, "num_layers": 2, "scale_factor": 2,
                "use_mlp": True, "mlp_ratio": 2.0, "activation_function": "gelu",
                "pos_embed": "none", "operator_type": "dhconv", "filter_type": "linear",
                "normalization_layer": "instance_norm", "loss": "geometric l2",
                "lr": 1e-4, "batch_size": 1, "max_epochs": 1,
                "n_train_samples_per_epoch": 2, "n_eval_samples": 2,
                "valid_autoreg_steps": 1, "scheduler": "none",
                "optimizer_type": "Adam", "save_checkpoint": "none",
                "enable_synthetic_data": True,
                "split_data_channels": split,
            })
            params = init_dataset(str(tmp_path), params, n_samples_per_year=8, n_years=1)
            params["experiment_dir"] = str(tmp_path / f"exp{split}")
            params["checkpoint_path"] = str(tmp_path / f"exp{split}" / "ckpt")
            params["best_checkpoint_path"] = str(tmp_path / f"exp{split}" / "best")

            trainer = Trainer(params, world_rank=0)
            assert trainer.metrics.split_data_channels is split
            trainer.train()
            results[split] = trainer.metrics.logs
        finally:
            comm.reset()

    base_on, base_off = results[True]["base"], results[False]["base"]
    np.testing.assert_allclose(base_on["validation loss"], base_off["validation loss"], rtol=1e-5)
    np.testing.assert_allclose(base_on["validation L1"], base_off["validation L1"], rtol=1e-5)
    for key, val in results[False]["metrics"].items():
        if np.isscalar(val):
            np.testing.assert_allclose(results[True]["metrics"][key], val,
                                       rtol=1e-4, err_msg=key)


def test_tensor_parallel_vit_matches_serial():
    """Head-parallel ViT attention + MLP under (data=2, fin=2, fout=2):
    params sharded per the partitioning rules must reproduce serial outputs
    (ref: makani/mpu/layers.py:454-524 DistributedAttention)."""
    from makani_tpu.models.networks.vit import VisionTransformer
    from makani_tpu.parallel.partitioning import get_param_shardings, shard_tree

    model = VisionTransformer(
        inp_shape=(16, 32), patch_size=(4, 4), inp_chans=3, out_chans=3,
        embed_dim=32, depth=2, num_heads=4)

    rng = np.random.RandomState(5)
    x = rng.randn(2, 3, 16, 32).astype(np.float32)

    comm.reset()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    y_serial = np.asarray(jax.jit(
        lambda v, a: model.apply(v, a, deterministic=True))(variables, jnp.asarray(x)))

    comm.init(model_parallel_sizes=[1, 1, 2, 2], devices=jax.devices()[:8])
    try:
        mesh = comm.get_mesh()
        shardings = get_param_shardings(variables["params"], mesh)
        # the rules must actually shard the attention weights
        qkv_specs = [s.spec for p, s in
                     zip(*[["/".join(str(getattr(k, "key", k)) for k in kp)
                            for kp, _ in jax.tree_util.tree_flatten_with_path(shardings)[0]],
                           jax.tree.leaves(shardings)])
                     if "qkv/kernel" in p]
        assert all(s == P("fin", "fout") for s in qkv_specs) and qkv_specs

        vshard = {"params": shard_tree(variables["params"], shardings)}
        xd = jax.device_put(x, NamedSharding(mesh, P("data")))
        y_tp = np.asarray(jax.jit(
            lambda v, a: model.apply(v, a, deterministic=True))(vshard, xd))
    finally:
        comm.reset()

    np.testing.assert_allclose(y_tp, y_serial, rtol=2e-4, atol=2e-4)


def test_tensor_parallel_afno_matches_serial():
    """Block-split AFNO v2 under (data=2, fin=2): params sharded per the
    partitioning rules must reproduce serial outputs
    (ref: makani/mpu/layers.py:544-643 DistributedAFNO2Dv2)."""
    from makani_tpu.models.networks.afnonet_v2 import AdaptiveFourierNeuralOperatorNet
    from makani_tpu.parallel.partitioning import get_param_shardings, shard_tree

    model = AdaptiveFourierNeuralOperatorNet(
        inp_shape=(16, 32), patch_size=(4, 4), inp_chans=3, out_chans=3,
        embed_dim=32, num_layers=2, num_blocks=8)

    rng = np.random.RandomState(6)
    x = rng.randn(2, 3, 16, 32).astype(np.float32)

    comm.reset()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    y_serial = np.asarray(jax.jit(
        lambda v, a: model.apply(v, a, deterministic=True))(variables, jnp.asarray(x)))

    comm.init(model_parallel_sizes=[1, 1, 2, 1], devices=jax.devices()[:4])
    try:
        mesh = comm.get_mesh()
        shardings = get_param_shardings(variables["params"], mesh)
        flat, _ = jax.tree_util.tree_flatten_with_path(shardings)
        w1_specs = [s.spec for kp, s in flat
                    if "/".join(str(getattr(k, "key", k)) for k in kp).endswith("filter/w1")]
        assert w1_specs and all(s[0] == "fin" for s in w1_specs)

        vshard = {"params": shard_tree(variables["params"], shardings)}
        xd = jax.device_put(x, NamedSharding(mesh, P("data")))
        y_tp = np.asarray(jax.jit(
            lambda v, a: model.apply(v, a, deterministic=True))(vshard, xd))
    finally:
        comm.reset()

    np.testing.assert_allclose(y_tp, y_serial, rtol=2e-4, atol=2e-4)


def test_scan_layers_tensor_parallel_matches_serial():
    """scan_layers stacks middle-block weights on a leading LAYER axis; the
    partitioning rules must keep that axis replicated (and shard the inner
    dims as usual) so TP outputs still match serial. Guards the latent bug
    where `filter/weight` would otherwise put "fin" on the layer dim."""
    from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet
    from makani_tpu.parallel.partitioning import get_param_shardings, shard_tree

    model = SphericalFourierNeuralOperatorNet(
        inp_shape=(16, 32), out_shape=(16, 32), scale_factor=2,
        inp_chans=2, out_chans=2, embed_dim=8, num_layers=4,
        operator_type="dhconv", normalization_layer="instance_norm",
        use_mlp=True, scan_layers=True, path_drop_rate=0.0)

    rng = np.random.RandomState(7)
    x = rng.randn(2, 2, 16, 32).astype(np.float32)

    comm.reset()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    # the scan branch must actually be taken (stacked middle blocks)
    flatv, _ = jax.tree_util.tree_flatten_with_path(variables["params"])
    scan_paths = ["/".join(str(getattr(k, "key", k)) for k in kp)
                  for kp, _ in flatv]
    assert any("scan_blocks/" in p for p in scan_paths)
    y_serial = np.asarray(jax.jit(lambda v, a: model.apply(v, a))(variables, jnp.asarray(x)))

    comm.init(model_parallel_sizes=[1, 1, 2, 2], devices=jax.devices()[:8])
    try:
        mesh = comm.get_mesh()
        shardings = get_param_shardings(variables["params"], mesh)
        flat, _ = jax.tree_util.tree_flatten_with_path(shardings)
        scan_filter = [(kp, s.spec) for kp, s in flat
                       if "scan_blocks/" in
                       "/".join(str(getattr(k, "key", k)) for k in kp)
                       and "filter/weight" in
                       "/".join(str(getattr(k, "key", k)) for k in kp)]
        assert scan_filter
        for _, spec in scan_filter:
            # leading (layer) axis replicated, contracted channel dim on fin
            assert len(spec) == 0 or spec[0] is None

        vshard = {"params": shard_tree(variables["params"], shardings)}
        xd = jax.device_put(x, NamedSharding(mesh, P("data")))
        y_tp = np.asarray(jax.jit(lambda v, a: model.apply(v, a))(vshard, xd))
    finally:
        comm.reset()

    np.testing.assert_allclose(y_tp, y_serial, rtol=2e-4, atol=2e-4)


def test_scan_layers_matches_unrolled_structure():
    """scan_layers is a compile-size optimization, not a model change: with
    weights copied across, scan and unrolled forward agree exactly."""
    from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet

    kwargs = dict(
        inp_shape=(16, 32), out_shape=(16, 32), scale_factor=2,
        inp_chans=2, out_chans=2, embed_dim=8, num_layers=4,
        operator_type="dhconv", normalization_layer="instance_norm",
        use_mlp=True, path_drop_rate=0.0)
    scan_model = SphericalFourierNeuralOperatorNet(**kwargs, scan_layers=True)
    loop_model = SphericalFourierNeuralOperatorNet(**kwargs, scan_layers=False)

    rng = np.random.RandomState(8)
    x = rng.randn(1, 2, 16, 32).astype(np.float32)

    comm.reset()
    sv = jax.jit(scan_model.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    # map scanned params -> unrolled block params: blocks_0/blocks_3 copy
    # straight over; scan_blocks/block/* leaf i -> blocks_{i+1}/*
    lv = jax.jit(loop_model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    import flax
    sflat = flax.traverse_util.flatten_dict(sv["params"])
    lflat = flax.traverse_util.flatten_dict(lv["params"])
    out = {}
    for k in lflat:
        path = "/".join(k)
        m = __import__("re").match(r"blocks_(\d+)/(.*)$", path)
        if m and 0 < int(m.group(1)) < 3:
            src = ("scan_blocks", "block") + tuple(m.group(2).split("/"))
            out[k] = np.asarray(sflat[src])[int(m.group(1)) - 1]
        else:
            out[k] = sflat[k]
    lv = {"params": flax.traverse_util.unflatten_dict(out)}

    y_scan = np.asarray(jax.jit(lambda v, a: scan_model.apply(v, a))(sv, jnp.asarray(x)))
    y_loop = np.asarray(jax.jit(lambda v, a: loop_model.apply(v, a))(lv, jnp.asarray(x)))
    np.testing.assert_allclose(y_scan, y_loop, rtol=1e-5, atol=1e-6)


def test_inferencer_validation_loss_data_parallel_invariant(tmp_path):
    """Round-4 defect fix (b): the Inferencer divides its per-batch loss sum
    by data_size (matching Trainer's eval step), so the reported validation
    loss is invariant to the data-parallel layout: serial (2 batches of 1)
    and data=2 (1 global batch of 2) over the same samples must agree."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from testutils import get_default_parameters, init_dataset
    from makani_tpu.utils.trainer import Trainer
    from makani_tpu.utils.inferencer import Inferencer

    def make_params():
        params = get_default_parameters()
        params.nettype = "SFNO"
        params.update_params({
            "embed_dim": 16, "num_layers": 2, "scale_factor": 2,
            "use_mlp": True, "mlp_ratio": 2.0, "activation_function": "gelu",
            "pos_embed": "none", "operator_type": "dhconv",
            "filter_type": "linear", "normalization_layer": "instance_norm",
            "loss": "geometric l2", "lr": 1e-4, "batch_size": 1,
            "max_epochs": 1, "n_train_samples_per_epoch": 2,
            "n_eval_samples": 2, "valid_autoreg_steps": 1,
            "scheduler": "none", "optimizer_type": "Adam",
            "save_checkpoint": "flexible", "print_timings_frequency": -1,
        })
        params = init_dataset(str(tmp_path), params, n_samples_per_year=12, n_years=1)
        params["experiment_dir"] = str(tmp_path / "exp")
        import os
        os.makedirs(params["experiment_dir"], exist_ok=True)
        params["checkpoint_path"] = str(tmp_path / "exp" / "ckpt")
        params["best_checkpoint_path"] = str(tmp_path / "exp" / "best_ckpt")
        return params

    comm.reset()
    comm.init(devices=jax.devices()[:1])
    params = make_params()
    Trainer(params, world_rank=0).train()

    inf_serial = Inferencer(make_params(), world_rank=0)
    logs_serial = inf_serial.inference_epoch(output_channels=list(params.out_channels))
    loss_serial = logs_serial["base"]["validation loss"]
    comm.reset()

    comm.init(model_parallel_sizes=[1, 1, 1, 1], devices=jax.devices()[:2])
    try:
        assert comm.get_size("data") == 2
        params2 = make_params()
        # batch_size is per data shard: local 1 -> one global batch of 2
        inf_dp = Inferencer(params2, world_rank=0)
        logs_dp = inf_dp.inference_epoch(output_channels=list(params2.out_channels))
        loss_dp = logs_dp["base"]["validation loss"]
    finally:
        comm.reset()

    np.testing.assert_allclose(loss_dp, loss_serial, rtol=1e-4)


def test_pure_data_parallel_trainer(tmp_path):
    """Pure data parallelism (data=2, all model axes 1): previously the
    Trainer only placed params on the mesh when model>1, so a pure-DP
    multi-device run failed with mixed-device jit args. Now params
    replicate onto the full mesh and training runs."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from testutils import get_default_parameters, init_dataset
    from makani_tpu.utils.trainer import Trainer

    comm.reset()
    comm.init(model_parallel_sizes=[1, 1, 1, 1], devices=jax.devices()[:2])
    try:
        assert comm.get_size("data") == 2 and comm.get_size("model") == 1
        params = get_default_parameters()
        params.nettype = "SFNO"
        params.update_params({
            "embed_dim": 16, "num_layers": 2, "scale_factor": 2,
            "use_mlp": True, "mlp_ratio": 2.0, "activation_function": "gelu",
            "pos_embed": "none", "operator_type": "dhconv",
            "filter_type": "linear", "normalization_layer": "instance_norm",
            "loss": "geometric l2", "lr": 1e-4, "batch_size": 1,
            "max_epochs": 1, "n_train_samples_per_epoch": 4,
            "n_eval_samples": 2, "valid_autoreg_steps": 1,
            "scheduler": "none", "optimizer_type": "Adam",
            "save_checkpoint": "none", "enable_synthetic_data": True,
        })
        params = init_dataset(str(tmp_path), params, n_samples_per_year=8, n_years=1)
        params["experiment_dir"] = str(tmp_path / "exp")
        params["checkpoint_path"] = str(tmp_path / "exp" / "ckpt")
        params["best_checkpoint_path"] = str(tmp_path / "exp" / "best_ckpt")

        trainer = Trainer(params, world_rank=0)
        assert trainer.data_parallel_size == 2
        trainer.train()
        assert np.isfinite(trainer.metrics.logs["base"]["validation loss"])
    finally:
        comm.reset()
