"""Accuracy study: SHT roundtrip + dhconv error per precision mode on TPU.

Quantifies what each transform-precision mode costs in accuracy, against a
host-side float64 reference (numpy), at the flagship inner-grid shapes.
Documents the HIGH-as-default decision (= the reference's TF32, ref:
makani/train.py:109-110 allow_tf32) with numbers.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/precision_study.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from makani_tpu.ops import sht as sht_mod
from makani_tpu.ops.sht import RealSHT, InverseRealSHT
from makani_tpu.ops.legendre import precompute_legpoly
from makani_tpu.ops.dft import rdft_matrices, irdft_matrices
from makani_tpu.ops.quadrature import quadrature_nodes_weights

NLAT, NLON, C = 240, 480, 73
GRID = "legendre-gauss"


def host_f64_roundtrip(x):
    """Reference SHT roundtrip in numpy float64 (host tables, full precision)."""
    lmax, mmax = NLAT, NLON // 2 + 1
    cost, w = quadrature_nodes_weights(GRID, NLAT, -1.0, 1.0)
    tq = np.flip(np.arccos(cost))
    wq = np.flip(w).astype(np.float64)
    pct = precompute_legpoly(mmax, lmax, tq, norm="ortho", csphase=True).astype(np.float64)
    Cm, Sm = (m.astype(np.float64) for m in rdft_matrices(NLON, mmax, scale="integral"))
    Cs, Ss = (m.astype(np.float64) for m in irdft_matrices(NLON, mmax, scale="synthesis"))

    x64 = x.astype(np.float64)
    re = np.einsum("...j,jm->...m", x64, Cm)
    im = -np.einsum("...j,jm->...m", x64, Sm)
    re = re * wq[:, None]
    im = im * wq[:, None]
    ore = np.einsum("...km,mlk->...lm", re, pct)
    oim = np.einsum("...km,mlk->...lm", im, pct)
    # synthesis
    sre = np.einsum("...lm,mlk->...km", ore, pct)
    sim = np.einsum("...lm,mlk->...km", oim, pct)
    out = np.einsum("...m,mj->...j", sre, Cs) - np.einsum("...m,mj->...j", sim, Ss)
    return (ore, oim), out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    x = rng.randn(C, NLAT, NLON).astype(np.float32)

    (ref_re, ref_im), ref_round = host_f64_roundtrip(x)
    ref_spec_norm = max(np.abs(ref_re).max(), np.abs(ref_im).max())
    ref_norm = np.abs(ref_round).max()

    sht = RealSHT(NLAT, NLON, grid=GRID)
    isht = InverseRealSHT(NLAT, NLON, grid=GRID)

    for mode in ("default", "split2", "tf32", "mixed2", "high", "highest"):
        sht_mod.set_transform_precision(mode)

        # NOTE: the traced callable must be a FRESH function object per mode —
        # jax.jit's fast-path cache is keyed on function identity + avals, so
        # re-jitting the same `run` would silently reuse the first mode's
        # trace (and its precision) without recompiling.
        def run(v, _mode=mode):
            c = sht(v)
            return jnp.real(c), jnp.imag(c), isht(c)

        cre, cim, out = jax.jit(run)(jnp.asarray(x))
        cre, cim, out = np.asarray(cre), np.asarray(cim), np.asarray(out)
        espec = max(np.abs(cre - ref_re).max(), np.abs(cim - ref_im).max()) / ref_spec_norm
        eround = np.abs(out - ref_round).max() / ref_norm
        print(f"{mode:8s} spectral max-rel-err {espec:.3e}   roundtrip max-rel-err {eround:.3e}",
              flush=True)
    sht_mod.set_transform_precision("high")


if __name__ == "__main__":
    main()
