"""Real spherical harmonic transforms (analysis / synthesis).

TPU-native formulation: the SHT is a pure MXU matmul chain — truncated
longitudinal DFT matmul + per-m Legendre matmul over latitude. No FFT thunks:
with hard mode truncation (mmax ~ nlon/6 for the SFNO inner grid) the direct
DFT does less effective work on the MXU than a full FFT + truncate, avoids
XLA's expensive non-power-of-two FFT lowering, and shards cleanly.

The same code path serves serial and spatially-decomposed execution: sharding
constraints express the reference's channel<->space all-to-all transposes
(ref: makani/mpu/layers.py:38-102) and no-op on a trivial mesh.

Conventions (parity with the reference's torch-harmonics transforms;
ref: makani/models/networks/sfnonet.py:523-539):
  - analysis:  c_lm = sum_k w_k P-hat_l^m(theta_k) * (2 pi / nlon) sum_j x e^{-im phi_j}
  - synthesis: x(theta_k, phi_j) = Re sum_m fac_m e^{im phi} sum_l c_lm P-hat_l^m
  - "ortho" normalization, Condon-Shortley phase, theta in [0, pi]
    (north pole first, ERA5 ordering).

Exact round-trips for band-limited data on legendre-gauss grids (equiangular
grids via Clenshaw-Curtis quadrature alias at high l, like the reference).
"""

import numpy as np
import jax
import jax.numpy as jnp

from makani_tpu.ops.quadrature import quadrature_nodes_weights
from makani_tpu.ops.constants import device_constant
from makani_tpu.ops.legendre import precompute_legpoly

# Matmul precision for the spectral transforms. The reference force-fp32s all
# transforms under AMP (ref: makani/models/common/spectral_convolution.py:130-141)
# but runs those fp32 matmuls as TF32 on the MXU (allow_tf32, ref:
# makani/train.py:109-110). The TPU equivalent of TF32 is the 3-pass bf16
# decomposition (Precision.HIGH) — the default here. set_transform_precision
# switches to HIGHEST (6-pass) for strict-accuracy runs or DEFAULT (1-pass)
# for maximum throughput.
_PRECISION = jax.lax.Precision.HIGH


def set_transform_precision(name: str):
    """'default' | 'split2' | 'mixed' (alias 'tf32') | 'high' | 'highest'.

    'high' (3-pass bf16, ~16-bit operands) is strictly tighter than the
    reference's TF32 everywhere (measured SHT roundtrip 5.6e-5 vs TF32's
    ~3e-4 expectation). 'mixed' runs the grid-side DFT dots at 1-pass bf16
    and the coefficient-space dots at HIGH: roundtrip 3.7e-3 — looser than
    true TF32 but of the same order as the bf16 AMP activation rounding both
    frameworks impose at every block seam; +13% throughput over 'high'
    at the flagship (see BENCH_NOTES.md round-2 table). 'split2' rounds
    activations to bf16 but keeps hi/lo split tables (two dots).
    """
    global _PRECISION
    _PRECISION = {
        "default": jax.lax.Precision.DEFAULT,
        "split2": "split2",
        "tf32": "tf32",  # alias
        "mixed": "tf32",
        # mixed2: like mixed but the grid dots keep the TABLE in f32 (bf16
        # activation x f32 table under HIGH — XLA's fast bf16-operand HIGH
        # kernel runs this at DEFAULT speed when it engages; measured
        # per-chip, see BENCH_NOTES round 3)
        "mixed2": "tf32x",
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


def get_transform_precision():
    return _PRECISION


# Coefficient-engine switch: how the coefficient-space contractions (the
# Legendre dots and SpectralConv's dhconv channel mixing) are executed.
#   "xla"    — jnp einsums on complex coefficients (status quo; the only
#              choice under model-parallel SPMD, where a pallas_call custom
#              call cannot be partitioned by GSPMD)
#   "stacked"— same math on the m-leading stacked-real layout with XLA
#              einsums (layout ablation; CPU-testable twin of "pallas")
#   "pallas" — ops/pallas_mm multi-pass kernels: operand hi/lo bf16 splits in
#              VMEM, all passes accumulated on the MXU before one f32 write —
#              XLA-HIGH accuracy at near-single-pass HBM cost (the in-kernel
#              accumulation jnp cannot express; see BENCH_NOTES.md round 2)
_COEFF_ENGINE = "xla"


def set_coeff_engine(name: str):
    global _COEFF_ENGINE
    assert name in ("xla", "stacked", "pallas"), name
    _COEFF_ENGINE = name


def get_coeff_engine():
    return _COEFF_ENGINE


def _coeff_passes():
    """Pallas pass count for the current precision mode (None = no pallas
    equivalent; fall back to the XLA einsum)."""
    return {
        "tf32": 3,  # mixed: coefficient dots at HIGH
        "tf32x": 3,
        "split2": 2,
        jax.lax.Precision.DEFAULT: 1,
        jax.lax.Precision.HIGH: 3,
    }.get(_PRECISION)


def _stacked_engine_active():
    if _COEFF_ENGINE == "xla":
        return False
    if _COEFF_ENGINE == "pallas" and (
            jax.default_backend() == "cpu" or _coeff_passes() is None):
        return False
    from makani_tpu.parallel import spmd
    return not spmd.model_distributed()


def _legendre_dot(z, p, contract):
    """(M2, R, K|L) x (mmax, L, K) per-m contraction in the m-leading stacked
    layout, on the active coefficient engine."""
    if _COEFF_ENGINE == "pallas" and jax.default_backend() != "cpu":
        from makani_tpu.ops import pallas_mm
        return pallas_mm.legdot(z, p, contract, _coeff_passes())
    mmax = p.shape[0]
    # (2*mmax, R, .) -> (2, mmax, R, .): leading reshape is free and the
    # re/im planes share one table read in the einsum
    zs = z.reshape(2, mmax, *z.shape[1:])
    eq = "smrk,mlk->smrl" if contract == "k" else "smrl,mlk->smrk"
    prec = _PRECISION if _PRECISION not in ("tf32", "tf32x", "split2") \
        else jax.lax.Precision.HIGH
    out = jnp.einsum(eq, zs, p, precision=prec)
    return out.reshape(2 * mmax, *out.shape[2:])


def transform_einsum(eq, x, table, precision, stage="coeff"):
    """Activation x table einsum honoring the extended precision modes.

    `stage` marks grid-side dots ("grid": the longitude DFT/iDFT, whose
    activations are bf16-valued under AMP) vs coefficient-space dots
    ("coeff": Legendre contractions on genuine-f32 spectral values). The
    "mixed"/"tf32" mode runs grid dots at 1-pass bf16 and coefficient dots
    at HIGH — the fast point closest to the reference's TF32 numerics
    (ref: makani/train.py:109-110 allow_tf32); see set_transform_precision
    for the measured accuracy ladder.

    bf16 note: a bf16 (AMP) activation under HIGH could in principle skip one
    of HIGH's 3 bf16 passes (its lo split is exactly zero). Expressed as two
    jnp einsums + add this LOSES ~4% end to end — XLA materializes each pass
    instead of accumulating in VMEM like its native HIGH kernel (measured
    round 2: 3.04 -> 2.94 steps/s). The 2-pass form needs in-kernel
    accumulation, i.e. the Pallas grid-dot path; at the jnp level bf16 inputs
    are upcast and handed to the native HIGH kernel.
    """
    if jax.default_backend() == "cpu":
        # the CPU dot thunk has no bf16 x bf16 -> f32 kernel, and CPU f32
        # dots are exact regardless of the precision enum — every mode
        # resolves to a plain f32 einsum off-accelerator
        return jnp.einsum(eq, x.astype(jnp.float32), table)
    if precision == "tf32x":
        if stage == "grid":
            # bf16 activation, f32 table, HIGH: the activation's lo split is
            # exactly zero so this is numerically a 2-pass (exact-table) dot
            return jnp.einsum(eq, x.astype(jnp.bfloat16), table,
                              precision=jax.lax.Precision.HIGH)
        precision = jax.lax.Precision.HIGH
    if precision == "tf32":
        precision = jax.lax.Precision.DEFAULT if stage == "grid" \
            else jax.lax.Precision.HIGH
    if precision == jax.lax.Precision.DEFAULT:
        # explicit bf16 operands: numerically identical to a DEFAULT f32 dot
        # on TPU (which rounds operands to bf16 internally) but hands XLA a
        # true bf16 x bf16 kernel
        return jnp.einsum(eq, x.astype(jnp.bfloat16), table.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    if precision == "split2":
        xb = x.astype(jnp.bfloat16)
        th = table.astype(jnp.bfloat16)
        tl = (table - th.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jnp.einsum(eq, xb, th, preferred_element_type=jnp.float32)
                + jnp.einsum(eq, xb, tl, preferred_element_type=jnp.float32))
    if x.dtype == jnp.bfloat16:  # multi-pass modes expect an f32 activation
        x = x.astype(jnp.float32)
    return jnp.einsum(eq, x, table, precision=precision)


# Table source: "host" embeds f64-derived f32 tables as program constants
# (exact, but bloats compiled programs by O(100MB) at 0.25-degree resolution
# and slows compilation pathologically); "device" computes them in-graph via
# the extended-range f32 recursion (~2e-4 relative error — tighter than the
# reference's TF32 matmuls — and constant-free programs). "auto" picks
# device off-CPU.
_TABLE_MODE = "auto"


def set_table_mode(mode: str):
    global _TABLE_MODE
    assert mode in ("auto", "host", "device")
    _TABLE_MODE = mode


def _use_device_tables():
    if _TABLE_MODE == "auto":
        return jax.default_backend() != "cpu"
    return _TABLE_MODE == "device"


# --- hoisted table plumbing ---------------------------------------------
# In device-table mode the Legendre table is produced by a lax.scan over l
# (ops/device_tables.legpoly_device). Left in the step graph it costs ~30 ms
# per train step on a v5e (serial VPU work + dynamic_update_slice state).
# materialize_tables() computes each distinct table ONCE into a concrete
# device array; the step function passes that dict as an ARGUMENT (closed-over
# jax.Arrays would be embedded into the HLO as constants — see CLAUDE.md) and
# installs it with provided_tables() so the transforms fetch instead of
# recompute. No provider/missing key -> in-graph compute (status quo).

import contextlib

_TABLE_STORE = None     # key -> array (or traced arg) during an applied step
_TABLE_RECORDER = None  # key -> init_fn during recording


@contextlib.contextmanager
def provided_tables(tables):
    global _TABLE_STORE
    prev, _TABLE_STORE = _TABLE_STORE, tables
    try:
        yield
    finally:
        _TABLE_STORE = prev


@contextlib.contextmanager
def recording_tables(recorder: dict):
    global _TABLE_RECORDER
    prev, _TABLE_RECORDER = _TABLE_RECORDER, recorder
    try:
        yield
    finally:
        _TABLE_RECORDER = prev


def _table(key, init_fn):
    if _TABLE_STORE is not None and key in _TABLE_STORE:
        return _TABLE_STORE[key]
    if _TABLE_RECORDER is not None:
        _TABLE_RECORDER.setdefault(key, init_fn)
    return init_fn()


def materialize_tables(trace_fn, *example_args):
    """Abstractly trace `trace_fn` (e.g. a train step) recording every table
    the transforms request, then compute them all in one jit. Returns a dict
    {key: device array} to pass back through `provided_tables`."""
    rec = {}
    with recording_tables(rec):
        jax.eval_shape(trace_fn, *example_args)
    if not rec:
        return {}
    return jax.jit(lambda: {k: fn() for k, fn in rec.items()})()


def _theta_weights(grid, nlat):
    cost, w = quadrature_nodes_weights(grid, nlat, -1.0, 1.0)
    # theta in [0, pi], ascending (north pole first)
    tq = np.flip(np.arccos(cost))
    wq = np.flip(w)
    return tq, wq


from functools import lru_cache


@lru_cache(maxsize=None)
def _get_pct(grid, nlat, lmax, mmax, csphase):
    """Shared (mmax, lmax, nlat) Legendre table. With ortho normalization the
    analysis and synthesis tables are identical (quadrature weights are
    applied to the activations instead), so forward and inverse transforms of
    the same grid share ONE table — halving both HBM residency and the
    compiled program's constant payload."""
    tq, _ = _theta_weights(grid, nlat)
    pct = precompute_legpoly(mmax, lmax, tq, norm="ortho", csphase=csphase)
    return np.ascontiguousarray(pct, dtype=np.float32)


class RealSHT:
    """Analysis: real (..., nlat, nlon) -> complex (..., lmax, mmax)."""

    def __init__(self, nlat, nlon, lmax=None, mmax=None, grid="lobatto", csphase=True):
        self.nlat = nlat
        self.nlon = nlon
        self.grid = grid
        self.lmax = lmax or self.nlat
        self.mmax = mmax or self.nlon // 2 + 1

        tq, wq = _theta_weights(grid, nlat)
        self.tq = tuple(tq)
        self.wq = np.asarray(wq, dtype=np.float32)

    def _pct_table(self):
        if _use_device_tables():
            from makani_tpu.ops.device_tables import legpoly_device
            key = f"pct:{self.grid}:{self.nlat}:{self.lmax}:{self.mmax}"
            return _table(key, lambda: legpoly_device(self.mmax, self.lmax, self.tq))
        return device_constant(_get_pct(self.grid, self.nlat, self.lmax, self.mmax, True))

    def _rdft_stacked_table(self):
        """ONE (nlon, 2*mmax) [cos | -sin] DFT operand, hoisted as a single
        buffer: a single dot with a single rhs buffer is the form XLA's fast
        bf16-operand kernel accepts (an in-graph concat of two table halves
        compiles to a visibly slower dot — measured round 2)."""
        key = f"rdftT:{self.nlon}:{self.mmax}"

        def init():
            if _use_device_tables():
                from makani_tpu.ops.device_tables import rdft_device
                C, S = rdft_device(self.nlon, self.mmax, scale="integral")
            else:
                from makani_tpu.ops.dft import rdft_matrices
                Cn, Sn = rdft_matrices(self.nlon, self.mmax, scale="integral")
                C, S = device_constant(Cn), device_constant(Sn)
            return jnp.concatenate([C, -S], axis=1)

        return _table(key, init)

    def analysis_stacked(self, x):
        """Serial fast path: real grid (..., nlat, nlon) -> m-leading
        stacked-real coefficients (2*mmax, ..., lmax), re rows then im rows.

        Numerically identical to __call__ (same tables, same precision
        ladder) but never materializes complex64 and keeps the m-batched
        layout the multi-pass Pallas Legendre kernel wants. Used by
        SpectralConv's dhconv pipeline when the stacked/pallas coefficient
        engine is active (serial execution only)."""
        if x.dtype != jnp.bfloat16:
            x = x.astype(jnp.float32)
        T = self._rdft_stacked_table()
        z = transform_einsum("...j,jm->m...", x, T, _PRECISION, stage="grid")
        z = z * device_constant(self.wq)
        batch_shape = z.shape[1:-1]
        zf = z.reshape(z.shape[0], -1, z.shape[-1])
        out = _legendre_dot(zf, self._pct_table(), "k")
        return out.reshape(out.shape[0], *batch_shape, self.lmax)

    def __call__(self, x):
        from makani_tpu.parallel import spmd

        # bf16 AMP inputs stay bf16 into the DFT matmul (bit-identical to
        # upcasting under HIGH — see transform_einsum); everything downstream
        # of the first contraction is f32 as the reference mandates
        if x.dtype != jnp.bfloat16:
            x = x.astype(jnp.float32)
        dist = spmd.spatial_distributed() and x.ndim == 4

        if dist:
            # channel<->lon transpose: lon local, channels over w
            x = spmd.constrain(x, "data", ("fin", "w"), "h", None)

        # longitudinal integral as ONE truncated-DFT matmul against the
        # stacked [cos | -sin] table (the imaginary sign lives in the table);
        # a single dot with a single consumer of the grid tensor is the form
        # XLA executes fastest on bf16 AMP inputs (scripts/bench_gridmm.py).
        # The stacked mode axis comes out LEADING: the re/im split is then a
        # contiguous major-dim slice (free bitcast, no slice kernels) and the
        # m-batched Legendre dots get their preferred m-leading layout.
        T = self._rdft_stacked_table()
        z = transform_einsum("...j,jm->m...", x, T, _PRECISION, stage="grid")

        # quadrature weights applied to the (small) spectral intermediate so
        # the Legendre table can be shared with the inverse transform
        # (lat is the last axis of z here)
        wq = device_constant(self.wq)
        z = z * wq
        re = z[: self.mmax]
        im = z[self.mmax :]

        if dist:
            # polar transpose: lat local for the Legendre contraction
            re = spmd.constrain(re, "w", "data", ("fin", "h"), None)
            im = spmd.constrain(im, "w", "data", ("fin", "h"), None)

        w = self._pct_table()
        ore = transform_einsum("m...k,mlk->...lm", re, w, _PRECISION)
        oim = transform_einsum("m...k,mlk->...lm", im, w, _PRECISION)
        out = jax.lax.complex(ore, oim)

        if dist:
            # final layout: l sharded over h, m sharded over w
            out = spmd.constrain(out, "data", "fin", "h", "w")
        return out


class InverseRealSHT:
    """Synthesis: complex (..., lmax, mmax) -> real (..., nlat, nlon)."""

    def __init__(self, nlat, nlon, lmax=None, mmax=None, grid="lobatto", csphase=True):
        self.nlat = nlat
        self.nlon = nlon
        self.grid = grid
        self.lmax = lmax or self.nlat
        self.mmax = mmax or self.nlon // 2 + 1

        # ortho normalization: the synthesis table equals the analysis table
        tq, _ = _theta_weights(grid, nlat)
        self.tq = tuple(tq)

    def _pct_table(self):
        if _use_device_tables():
            from makani_tpu.ops.device_tables import legpoly_device
            key = f"pct:{self.grid}:{self.nlat}:{self.lmax}:{self.mmax}"
            return _table(key, lambda: legpoly_device(self.mmax, self.lmax, self.tq))
        return device_constant(_get_pct(self.grid, self.nlat, self.lmax, self.mmax, True))

    def _irdft_stacked_table(self):
        """ONE (2*mmax, nlon) [cos ; -sin] synthesis operand, hoisted as a
        single buffer (see RealSHT._rdft_stacked_table)."""
        key = f"irdftT:{self.nlon}:{self.mmax}"

        def init():
            if _use_device_tables():
                from makani_tpu.ops.device_tables import irdft_device
                Cs, Ss = irdft_device(self.nlon, self.mmax, scale="synthesis")
            else:
                from makani_tpu.ops.dft import irdft_matrices
                Cn, Sn = irdft_matrices(self.nlon, self.mmax, scale="synthesis")
                Cs, Ss = device_constant(Cn), device_constant(Sn)
            return jnp.concatenate([Cs, -Ss], axis=0)

        return _table(key, init)

    def synthesis_stacked(self, z):
        """Serial fast path: m-leading stacked-real coefficients
        (2*mmax, ..., lmax) -> real grid (..., nlat, nlon). The twin of
        RealSHT.analysis_stacked (same tables/precision as __call__)."""
        batch_shape = z.shape[1:-1]
        zf = z.reshape(z.shape[0], -1, z.shape[-1])
        o = _legendre_dot(zf, self._pct_table(), "l")
        o = o.reshape(o.shape[0], *batch_shape, o.shape[-1])
        T = self._irdft_stacked_table()
        return transform_einsum("m...k,mj->...kj", o, T, _PRECISION, stage="grid")

    def __call__(self, x):
        from makani_tpu.parallel import spmd

        x = x.astype(jnp.complex64)
        dist = spmd.spatial_distributed() and x.ndim == 4

        if dist:
            # entry anchor in the canonical coefficient layout (fin kept
            # sharded): the transpose of this constraint pins the EXIT layout
            # of the backward pass, so cotangents leave the transform
            # canonically instead of channels-over-(fin,h) — without it, the
            # SpectralConv branch-cotangent add degenerates to an involuntary
            # full rematerialization (replicate-then-slice) in SPMD
            x = spmd.constrain(x, "data", "fin", "h", "w")
        xre, xim = jnp.real(x), jnp.imag(x)
        if dist:
            # l local for the synthesis contraction, channels over h
            xre = spmd.constrain(xre, "data", ("fin", "h"), None, "w")
            xim = spmd.constrain(xim, "data", ("fin", "h"), None, "w")

        # inverse-Legendre emits the mode axis LEADING so the re/im planes
        # concatenate on the major dim (contiguous block copy, and the
        # cotangent split in the backward is a free bitcast slice)
        pct = self._pct_table()
        re = transform_einsum("...lm,mlk->m...k", xre, pct, _PRECISION)
        im = transform_einsum("...lm,mlk->m...k", xim, pct, _PRECISION)

        if dist:
            # m local for the inverse lon transform, lat over h, channels over w
            re = spmd.constrain(re, None, "data", ("fin", "w"), "h")
            im = spmd.constrain(im, None, "data", ("fin", "w"), "h")

        # real synthesis: ONE matmul against the [cos ; -sin]-stacked table —
        # one grid-sized output write instead of two + subtract
        z = jnp.concatenate([re, im], axis=0)
        T = self._irdft_stacked_table()
        out = transform_einsum("m...k,mj->...kj", z, T, _PRECISION, stage="grid")

        if dist:
            out = spmd.constrain(out, "data", "fin", "h", "w")
        return out
