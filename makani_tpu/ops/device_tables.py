"""In-graph computation of the spectral transform tables.

Embedding the Legendre / DFT tables as HLO constants makes compiled programs
hundreds of MB and compilation pathologically slow. Computed in-graph from
iota/cos/sin + a lax.scan over the Legendre recursion, the program carries
only the (nlat,) colatitude vector; table generation costs ~0.1 GFLOP per
step — noise against the model's TFLOPs — and XLA dedups/fuses it.

The recursion is identical to the float64 host version
(makani_tpu/ops/legendre.py); f32 on device. The normalized three-term
recurrence is forward-stable, parity with the host tables is pinned by tests.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


def rdft_device(nlon, mmax, scale="integral"):
    """Forward real-DFT matrices (nlon, mmax) computed in-graph."""
    j = jax.lax.broadcasted_iota(jnp.float32, (nlon, mmax), 0)
    m = jax.lax.broadcasted_iota(jnp.float32, (nlon, mmax), 1)
    ang = (2.0 * np.pi / nlon) * j * m
    s = {"integral": 2.0 * np.pi / nlon, "ortho": 1.0 / np.sqrt(nlon), "none": 1.0}[scale]
    return s * jnp.cos(ang), s * jnp.sin(ang)


def irdft_device(nlon, mmax, scale="synthesis"):
    """Inverse real-DFT matrices (mmax, nlon) computed in-graph."""
    m = jax.lax.broadcasted_iota(jnp.float32, (mmax, nlon), 0)
    j = jax.lax.broadcasted_iota(jnp.float32, (mmax, nlon), 1)
    ang = (2.0 * np.pi / nlon) * j * m
    fac = jnp.where(m == 0, 1.0, 2.0)
    if (nlon % 2 == 0) and (mmax == nlon // 2 + 1):
        fac = jnp.where(m == (mmax - 1), 1.0, fac)
    s = {"synthesis": 1.0, "ortho": 1.0 / np.sqrt(nlon), "none": 1.0}[scale]
    return s * fac * jnp.cos(ang), s * fac * jnp.sin(ang)


def legpoly_device(mmax, lmax, tq):
    """Normalized associated Legendre table (mmax, lmax, nlat) in-graph.

    tq: (nlat,) colatitudes (small np constant). Condon-Shortley phase
    included. Same recursion as ops/legendre.precompute_legpoly, but in
    EXTENDED-RANGE f32: sectoral seeds sin(theta)^m underflow f32 long before
    the recursion recovers to O(1), so each (m, k) column carries a scaled
    mantissa u with a separate power-of-two exponent S (true value =
    u * 2^S); the linear three-term recursion is scale-invariant, and columns
    renormalize whenever the mantissa grows past 2^40. The diagonal chain is
    tracked in log2 space. This is the standard libsharp/SHTns technique.
    """
    nmax = max(mmax, lmax)
    nlat = len(tq)
    x = jnp.asarray(np.cos(np.asarray(tq, np.float64)), jnp.float32)  # (K,)
    s = jnp.asarray(np.sin(np.asarray(tq, np.float64)), jnp.float32)
    log2s = jnp.log2(jnp.maximum(s, 0.0))  # -inf at the poles (correct limits)

    m_idx = jax.lax.broadcasted_iota(jnp.float32, (nmax, 1), 0)  # (M', 1)
    P00 = 1.0 / np.sqrt(4.0 * np.pi)

    # state: u, u_prev (scaled rows, (M', K)), S (per-column exponent, (M', K)),
    # log2_diag (K,) for the current diagonal, all for degree l-1 / l-2.
    u0 = jnp.zeros((nmax, nlat), jnp.float32).at[0].set(P00)
    S0 = jnp.zeros((nmax, nlat), jnp.float32)
    log2_diag0 = jnp.full((nlat,), np.log2(P00), jnp.float32)

    if nmax == 1:
        rows_u = u0[None]
        rows_S = S0[None]
    else:
        # l = 1: m=0 -> sqrt(3) x P00 ; m=1 -> seeded scaled diag (u=1, S=log2 diag)
        log2_diag1 = log2_diag0 + log2s + 0.5 * np.log2(3.0 / 2.0)
        u1 = jnp.zeros((nmax, nlat), jnp.float32)
        u1 = u1.at[0].set(np.sqrt(3.0) * x * P00)
        u1 = u1.at[1].set(1.0)
        S1 = jnp.zeros((nmax, nlat), jnp.float32)
        S1 = S1.at[1].set(log2_diag1)

        def step(carry, l):
            u_prev, u_prev2, S, log2_diag_prev = carry
            lf = l.astype(jnp.float32)
            m = m_idx  # (M', 1)

            # general recursion (m <= l-2) on scaled mantissas
            a = jnp.sqrt((4.0 * lf * lf - 1.0) / jnp.maximum(lf * lf - m * m, 1e-20))
            b = jnp.sqrt(((lf - 1.0) ** 2 - m * m) / jnp.maximum(4.0 * (lf - 1.0) ** 2 - 1.0, 1e-20))
            gen = a * (x[None, :] * u_prev - b * u_prev2)

            # m = l-1 (superdiagonal): P = sqrt(2l+1) x diag_{l-1}; the column
            # exponent was seeded to log2(diag_{l-1}) at the previous step
            sup = jnp.sqrt(2.0 * lf + 1.0) * x[None, :]
            # m = l (new diagonal): seed u=1 with S = log2(diag_l)
            log2_diag = log2_diag_prev + log2s + 0.5 * jnp.log2((2.0 * lf + 1.0) / (2.0 * lf))

            u = jnp.where(m == lf - 1.0, sup, jnp.where(m == lf, 1.0, gen))
            u = jnp.where(m > lf, 0.0, u)
            S_new = jnp.where(m == lf, log2_diag[None, :], S)

            # renormalize columns whose mantissa outgrew the safe range
            big = jnp.abs(u) > jnp.float32(2.0 ** 40)
            shift = jnp.where(big, jnp.float32(40.0), 0.0)
            scale = jnp.exp2(-shift)
            u = u * scale
            u_prev_out = u_prev * scale
            S_new = S_new + shift

            return (u, u_prev_out, S_new, log2_diag), (u, S_new)

        ls = jnp.arange(2, nmax)
        if nmax > 2:
            _, (rest_u, rest_S) = jax.lax.scan(step, (u1, u0, S1, log2_diag1), ls)
            rows_u = jnp.concatenate([u0[None], u1[None], rest_u], axis=0)  # (L', M', K)
            rows_S = jnp.concatenate([S0[None], S1[None], rest_S], axis=0)
        else:
            rows_u = jnp.stack([u0, u1], axis=0)
            rows_S = jnp.stack([S0, S1], axis=0)

    pct = rows_u * jnp.exp2(rows_S)  # underflow to 0 where truly negligible
    pct = jnp.transpose(pct, (1, 0, 2))[:mmax, :lmax]  # (M, L, K)

    # Condon-Shortley phase (-1)^m
    mm = jax.lax.broadcasted_iota(jnp.int32, (mmax, 1, 1), 0)
    phase = jnp.where(mm % 2 == 1, -1.0, 1.0).astype(jnp.float32)
    return pct * phase
