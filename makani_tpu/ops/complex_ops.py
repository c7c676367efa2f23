"""Complex arithmetic helpers and spectral contraction kernels.

The spectral-weight contractions of the FNO family (ref:
makani/models/common/contractions.py:19-178). At the jnp level these are
einsums over complex64 activations; weights are stored as real (..., 2) pairs
(TPU/optimizer/checkpoint-friendly) and viewed as complex at use time. This
module is the single seam where Pallas kernels replace XLA einsums on the hot
path.
"""

import jax
import jax.numpy as jnp

# HIGH = 3-pass bf16 decomposition, the TPU equivalent of the TF32 matmuls
# the reference uses for its fp32 spectral contractions (allow_tf32,
# ref: makani/train.py:109-110)
_PRECISION = jax.lax.Precision.HIGH


def set_contraction_precision(name: str):
    global _PRECISION
    _PRECISION = {
        "default": jax.lax.Precision.DEFAULT,
        # split2/tf32 are transform-stage modes (ops/sht.py); contractions
        # are coefficient-space (genuine f32 operands), so both map to the
        # 3-pass HIGH here — already tighter than the reference's TF32
        "split2": jax.lax.Precision.HIGH,
        "tf32": jax.lax.Precision.HIGH,
        "mixed": jax.lax.Precision.HIGH,
        "mixed2": jax.lax.Precision.HIGH,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


def view_as_complex(x):
    """(..., 2) real -> (...) complex."""
    return jax.lax.complex(x[..., 0], x[..., 1])


def view_as_real(z):
    """(...) complex -> (..., 2) real."""
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)


# 3-multiplication (Karatsuba) complex products: 25% fewer MXU FLOPs than the
# naive 4-mult form at the cost of ~1 extra ulp of rounding (well inside the
# TF32-equivalent tolerance the reference runs at). Toggle for A/B testing.
_USE_3M = True


def set_3m_contraction(flag: bool):
    global _USE_3M
    _USE_3M = bool(flag)


def _cplx_einsum(eq, x, w):
    """Complex einsum via real contractions; complex-dot lowering on TPU is
    avoided by splitting into real planes explicitly (XLA fuses the rest)."""
    xr, xi = jnp.real(x), jnp.imag(x)
    wr, wi = jnp.real(w), jnp.imag(w)
    rr = jnp.einsum(eq, xr, wr, precision=_PRECISION)
    ii = jnp.einsum(eq, xi, wi, precision=_PRECISION)
    if _USE_3M:
        # (xr+xi)(wr+wi) - rr - ii = xr*wi + xi*wr
        cross = jnp.einsum(eq, xr + xi, wr + wi, precision=_PRECISION)
        return jax.lax.complex(rr - ii, cross - rr - ii)
    ri = jnp.einsum(eq, xr, wi, precision=_PRECISION)
    ir = jnp.einsum(eq, xi, wr, precision=_PRECISION)
    return jax.lax.complex(rr - ii, ri + ir)


# --- contraction zoo (complex activations x complex weights) ---

def compl_mul1d(x, w):
    return _cplx_einsum("bix,io->box", x, w)


def compl_mul2d(x, w):
    return _cplx_einsum("bixy,io->boxy", x, w)


def compl_muladd2d(x, w, b):
    return compl_mul2d(x, w) + b


def compl_exp_mul2d(x, w):
    """l-dependent channel mixing (per-l dense)."""
    return _cplx_einsum("bixy,xio->boxy", x, w)


def compl_exp_muladd2d(x, w, b):
    return compl_exp_mul2d(x, w) + b


def contract_diagonal(x, w):
    return _cplx_einsum("bixy,ioxy->boxy", x, w)


# Pallas kernel toggle for the dhconv contraction (validated per-backend;
# interpret-mode parity is pinned by tests/test_pallas_kernels.py)
_USE_PALLAS_DHCONV = False


def enable_pallas_kernels(flag: bool = True):
    global _USE_PALLAS_DHCONV
    _USE_PALLAS_DHCONV = flag


def contract_dhconv(x, w):
    if _USE_PALLAS_DHCONV:
        from makani_tpu.ops.pallas_kernels import contract_dhconv_pallas
        return contract_dhconv_pallas(x, w, False)
    return _cplx_einsum("bixy,iox->boxy", x, w)


def contract_dhconv_stacked(x, w):
    """dhconv on stacked-real l-major layouts: x (2, B, L, C, M) x
    w (2, L, C, O) -> (2, B, L, O, M); plane 0 = real, plane 1 = imag.

    The layout twin of contract_dhconv used by SpectralConv's stacked
    coefficient pipeline (ops/sht.py coefficient-engine switch): "pallas"
    runs the multi-pass VMEM-accumulating kernel, "stacked" the equivalent
    XLA einsums (CPU-testable, and a layout-only ablation on TPU)."""
    from makani_tpu.ops import sht as _sht
    if _sht.get_coeff_engine() == "pallas" and jax.default_backend() != "cpu":
        from makani_tpu.ops import pallas_mm
        return pallas_mm.dhconv(x, w, _sht._coeff_passes())
    eq = "blcm,lco->blom"
    rr = jnp.einsum(eq, x[0], w[0], precision=_PRECISION)
    ii = jnp.einsum(eq, x[1], w[1], precision=_PRECISION)
    if _USE_3M:
        cross = jnp.einsum(eq, x[0] + x[1], w[0] + w[1], precision=_PRECISION)
        return jnp.stack([rr - ii, cross - rr - ii])
    ri = jnp.einsum(eq, x[0], w[1], precision=_PRECISION)
    ir = jnp.einsum(eq, x[1], w[0], precision=_PRECISION)
    return jnp.stack([rr - ii, ri + ir])


def contract_sep_diagonal(x, w):
    return _cplx_einsum("bixy,ixy->bixy", x, w)


def contract_sep_dhconv(x, w):
    return _cplx_einsum("bixy,ix->bixy", x, w)


def contract_rank(x, w, a, b):
    xr = _cplx_einsum("bixy,ior->borxy", x, w)
    # contract the rank dimension with the two positional factors
    ar = jnp.einsum("borxy,xr->borxy", xr, a.astype(xr.dtype))
    br = jnp.einsum("borxy,yr->boxy", ar, b.astype(xr.dtype))
    return br


CONTRACT_HANDLES = {
    ("diagonal", False): contract_diagonal,
    ("dhconv", False): contract_dhconv,
    ("diagonal", True): contract_sep_diagonal,
    ("dhconv", True): contract_sep_dhconv,
}


def get_contract_fun(operator_type, separable=False):
    """Dispatch matching the reference factorization helper
    (ref: makani/models/common/factorizations.py:202-247)."""
    key = (operator_type, separable)
    if key not in CONTRACT_HANDLES:
        raise ValueError(f"Unsupported operator type {operator_type} (separable={separable})")
    return CONTRACT_HANDLES[key]
