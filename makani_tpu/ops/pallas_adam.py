"""Fused Adam + stochastic-rounding parameter update as one Pallas kernel.

The optimizer stage of the flagship train step is pure HBM streaming over
the 572.5M-parameter state. The unfused XLA lowering (optax-style
update -> apply chain, utils/optimizers.scale_by_adam_lowmem +
``p - lr * u`` in the Trainer) measured ~49 ms/step of "loop fusions" in
the round-4 trace — ~3x the traffic floor — because the f32 update tensor
is materialized between the two stages and the dither hash's u32
intermediates break fusion.

This kernel performs the whole per-leaf update in one pass over VMEM
tiles:

    read  g(f32), mu(bf16), nu(bf16), p(f32)
    mu'  = b1*mu + (1-b1)*g            (f32 math)
    nu'  = b2*nu + (1-b2)*g*g
    u    = (mu'/bc1) / (sqrt(nu'/bc2) + eps)
    p'   = p*(1 - lr*wd) - lr*u
    write p'(f32), SR(mu')(bf16), SR(nu')(bf16)

= 20 B/element of HBM traffic, the floor. SR() is the same counter-hash
stochastic rounding as the XLA path (identical hash constants on the same
flat element index), so the kernel is BIT-EQUIVALENT to
scale_by_adam_lowmem + apply and the round-4 convergence qualification
carries over unchanged (tests/test_pallas_adam.py pins this).

Used by the Trainer when ``optimizer_fused: true`` and by bench.py under
BENCH_FUSED=1. Single-device only: a pallas_call cannot be partitioned by
GSPMD, so model-parallel meshes fall back to the XLA path (same
auto-disable rule as the pallas coefficient engine).

Ref context: the reference relies on apex FusedAdam/FusedLAMB for exactly
this fusion on CUDA (makani/utils/trainer.py:452-472).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# flat leaves are processed as (rows, LANE) tiles; 8 sublanes x 128 lanes
# is the f32 native tile, and ~10 live (ROWS_PER_BLOCK, LANE) buffers stay
# well under the ~16 MB VMEM budget at 1 MB per f32 block
LANE = 128
ROWS_PER_BLOCK = 2048


def _dither_u16_block(idx_u32, salt):
    """The utils/optimizers counter-hash dither on a block of flat element
    indices (identical constants -> identical bits)."""
    h = idx_u32 * jnp.uint32(0x9E3779B1) ^ salt
    h = (h ^ (h >> 15)) * jnp.uint32(0x85EBCA6B)
    h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
    return (h ^ (h >> 16)) & jnp.uint32(0xFFFF)


def _sround_bf16(x, idx_u32, salt):
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    bits = (bits + _dither_u16_block(idx_u32, salt)) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.bfloat16)


def _adam_kernel(scalf_ref, scalu_ref, p_ref, g_ref, mu_ref, nu_ref,
                 po_ref, muo_ref, nuo_ref, *,
                 b1, b2, eps, wd, stochastic, moment_bf16):
    i = pl.program_id(0)
    lr = scalf_ref[0]
    bc1 = scalf_ref[1]
    bc2 = scalf_ref[2]

    g = g_ref[...].astype(jnp.float32)
    mu = b1 * mu_ref[...].astype(jnp.float32) + (1.0 - b1) * g
    nu = b2 * nu_ref[...].astype(jnp.float32) + (1.0 - b2) * (g * g)
    u = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
    p = p_ref[...].astype(jnp.float32)
    po_ref[...] = (p * (1.0 - lr * wd) - lr * u).astype(po_ref.dtype)

    if moment_bf16 and stochastic:
        rows, lanes = mu.shape
        base = (i * ROWS_PER_BLOCK * LANE).astype(jnp.uint32)
        idx = (jax.lax.broadcasted_iota(jnp.uint32, (rows, lanes), 0)
               * np.uint32(lanes)
               + jax.lax.broadcasted_iota(jnp.uint32, (rows, lanes), 1) + base)
        muo_ref[...] = _sround_bf16(mu, idx, scalu_ref[0])
        nuo_ref[...] = _sround_bf16(nu, idx, scalu_ref[1])
    else:
        muo_ref[...] = mu.astype(muo_ref.dtype)
        nuo_ref[...] = nu.astype(nuo_ref.dtype)


def _fused_leaf_update(p, g, mu, nu, scal_f, scal_u, *,
                       b1, b2, eps, wd, stochastic, interpret=False):
    """One-leaf fused update. Flattens to (rows, 128); the tail is padded
    (dither indices match the XLA path's unpadded flat iota for every real
    element because padding lives past the data)."""
    shape, pdtype, mdtype = p.shape, p.dtype, mu.dtype
    n = int(np.prod(shape)) if shape else 1
    rows = -(-n // LANE)
    pad = rows * LANE - n

    def flat(x, dt):
        x = x.reshape(-1).astype(dt)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), dt)])
        return x.reshape(rows, LANE)

    pf = flat(p, jnp.float32)
    gf = flat(g, jnp.float32)
    muf = flat(mu, mdtype)
    nuf = flat(nu, mdtype)

    grid = -(-rows // ROWS_PER_BLOCK)
    moment_bf16 = mdtype == jnp.bfloat16

    kern = functools.partial(
        _adam_kernel, b1=float(b1), b2=float(b2), eps=float(eps),
        wd=float(wd), stochastic=stochastic, moment_bf16=moment_bf16)

    block = lambda: pl.BlockSpec((ROWS_PER_BLOCK, LANE), lambda i: (i, 0))
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    po, muo, nuo = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[smem(), smem(), block(), block(), block(), block()],
        out_specs=[block(), block(), block()],
        out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANE), mdtype),
                   jax.ShapeDtypeStruct((rows, LANE), mdtype)],
        # p->p', mu->mu', nu->nu': state is updated in place, residency flat
        input_output_aliases={2: 0, 4: 1, 5: 2},
        interpret=interpret,
    )(scal_f, scal_u, pf, gf, muf, nuf)

    unflat = lambda x, dt: x.reshape(-1)[:n].reshape(shape).astype(dt)
    return unflat(po, pdtype), unflat(muo, mdtype), unflat(nuo, mdtype)


def fused_adam_apply(params, grads, state, lr, *, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=0.0, stochastic_rounding=True, seed=1234,
                     interpret=None):
    """Apply one fused Adam(W) step.

    ``state`` is any NamedTuple with count/mu/nu fields
    (utils/optimizers._LowMemAdamState or optax.ScaleByAdamState);
    returns (new_params, new_state) with the state type preserved.
    Matches scale_by_adam_lowmem + ``p*(1-lr*wd) - lr*u`` bit-for-bit
    (bf16 moments) / to f32 round-off (f32 moments)."""
    if interpret is None:
        # the Mosaic kernel needs real TPU hardware; CPU (tests, virtual
        # meshes) runs the interpreter
        interpret = jax.default_backend() == "cpu"
    count = state.count + 1
    cf = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** cf
    bc2 = 1.0 - b2 ** cf
    base = (jnp.uint32(seed) ^ count.astype(jnp.uint32)) * jnp.uint32(0x9E3779B1)

    flat_g, treedef = jax.tree.flatten(grads)
    flat_p = treedef.flatten_up_to(params)
    flat_mu = treedef.flatten_up_to(state.mu)
    flat_nu = treedef.flatten_up_to(state.nu)

    scal_f = jnp.stack([jnp.asarray(lr, jnp.float32), bc1, bc2])

    new_p, new_mu, new_nu = [], [], []
    for i, (p, g, mu, nu) in enumerate(zip(flat_p, flat_g, flat_mu, flat_nu)):
        salt_mu = (base ^ jnp.uint32((2 * i * 0x68E31DA4 + 0xB5297A4D)
                                     & 0xFFFFFFFF)) * jnp.uint32(0x1B56C4E9)
        salt_nu = (base ^ jnp.uint32(((2 * i + 1) * 0x68E31DA4 + 0xB5297A4D)
                                     & 0xFFFFFFFF)) * jnp.uint32(0x1B56C4E9)
        po, muo, nuo = _fused_leaf_update(
            p, g, mu, nu, scal_f, jnp.stack([salt_mu, salt_nu]),
            b1=b1, b2=b2, eps=eps, wd=weight_decay,
            stochastic=stochastic_rounding, interpret=interpret)
        new_p.append(po)
        new_mu.append(muo)
        new_nu.append(nuo)

    new_state = state._replace(
        count=count,
        mu=jax.tree.unflatten(treedef, new_mu),
        nu=jax.tree.unflatten(treedef, new_nu))
    return jax.tree.unflatten(treedef, new_p), new_state
