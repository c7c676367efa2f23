"""Generate the committed golden-output fixtures (tests/fixtures/golden.npz).

The fixtures are the practical stand-in for BASELINE.json's torch-allclose
north-star while torch-harmonics is unavailable in this environment: the
SHT coefficients and tiny-SFNO forward/rollout outputs were verified
correct in rounds 1-2 (scipy-analytic SHT tests, AR-pipeline self-tests),
and committing them converts those numerics into a regression contract —
a silent convention drift (normalization sign, mode ordering, quadrature
choice; ref conventions: makani/models/networks/sfnonet.py:523-539) now
fails tests/test_golden.py instead of going unnoticed.

Run on CPU: python scripts/make_golden_fixtures.py
(the CPU platform computes exact f32; tests compare at 1e-4 so CPU/TPU
kernel differences stay inside tolerance).
"""

import os

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "golden.npz")


def sht_fixtures(arrays):
    from makani_tpu.ops.sht import RealSHT, InverseRealSHT

    rng = np.random.RandomState(1234)
    for grid in ("equiangular", "legendre-gauss"):
        nlat, nlon, lmax, mmax = 32, 64, 24, 25
        sht = RealSHT(nlat, nlon, lmax, mmax, grid=grid)
        isht = InverseRealSHT(nlat, nlon, lmax, mmax, grid=grid)
        x = rng.randn(2, 3, nlat, nlon).astype(np.float32)
        coeffs = np.asarray(sht(jnp.asarray(x)))
        grid_back = np.asarray(isht(jnp.asarray(coeffs)))
        tag = grid.replace("-", "_")
        arrays[f"sht_{tag}_input"] = x
        arrays[f"sht_{tag}_coeffs_re"] = coeffs.real
        arrays[f"sht_{tag}_coeffs_im"] = coeffs.imag
        arrays[f"sht_{tag}_roundtrip"] = grid_back


def sfno_fixtures(arrays):
    from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet

    model = SphericalFourierNeuralOperatorNet(
        inp_shape=(32, 64), out_shape=(32, 64), scale_factor=2,
        inp_chans=3, out_chans=3, embed_dim=16, num_layers=2)
    rng = np.random.RandomState(42)
    x = rng.randn(1, 3, 32, 64).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(7), jnp.zeros((1, 3, 32, 64)))
    fwd = jax.jit(lambda p, v: model.apply(p, v))

    y = fwd(params, jnp.asarray(x))
    arrays["sfno_input"] = x
    arrays["sfno_forward"] = np.asarray(y)

    # 3-step autoregressive rollout (the 10-step AR allclose north-star at
    # fixture scale; appending each output as the next input)
    state = jnp.asarray(x)
    for _ in range(3):
        state = fwd(params, state)
    arrays["sfno_rollout3"] = np.asarray(state)

    # parameter checksum stream: per-leaf sums pin the init convention
    leaves = jax.tree_util.tree_leaves_with_path(params)
    names = np.array(sorted(jax.tree_util.keystr(k) for k, _ in leaves))
    sums = np.array([float(jnp.sum(v)) for _, v in
                     sorted(leaves, key=lambda kv: jax.tree_util.keystr(kv[0]))],
                    dtype=np.float64)
    arrays["sfno_param_names"] = names
    arrays["sfno_param_sums"] = sums


def main():
    arrays = {}
    sht_fixtures(arrays)
    sfno_fixtures(arrays)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT}: {sorted(arrays)} "
          f"({os.path.getsize(OUT)/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
