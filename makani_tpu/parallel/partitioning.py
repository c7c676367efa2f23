"""Parameter partitioning rules for tensor (channel) parallelism.

The reference annotates every parameter with `is_shared_mp` / `sharded_dims_mp`
(ref: SURVEY §2.3 protocol; e.g. dhconv weights sharded over "h" at
makani/models/common/spectral_convolution.py:104-112, DistributedMLP weights
split over fin/fout at makani/mpu/layers.py:222-401). Here the same protocol
is expressed as path-pattern -> PartitionSpec rules applied to the flax param
tree; jit in/out shardings do the rest (GSPMD inserts the reduce/gather
collectives that the reference implements as autograd ops).
"""

import re
from typing import Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.parallel import comm


# (pattern, spec-for-matching-param). Patterns match the "/"-joined param path.
# Specs follow the reference's fin/fout ping-pong: embed activations live on
# "fin", MLP/encoder hidden layers on "fout"; spectral weights are sharded
# over the spatial axes of their mode dims ("h" for l, "w" for m).
_RULES = [
    # block MLP / encoder-decoder hidden layers: out-dim fout, in-dim fin
    (r".*(mlp|encoder|decoder)/(fc1|fwd_\d+)/weight$", lambda s: P("fout", "fin")),
    (r".*(mlp|encoder|decoder)/(fc1|fwd_\d+)/bias$", lambda s: P("fout")),
    (r".*(mlp|encoder|decoder)/(fc2|out)/weight$", lambda s: P("fin", "fout")),
    (r".*(mlp|encoder|decoder)/(fc2|out)/bias$", lambda s: P("fin")),
    # spectral conv weights: (i, o, l[, m], 2) - i over fin (row-parallel: the
    # SHT leaves activation channels sharded over fin, so matching the
    # contracted dim lets the weight stay put and GSPMD insert the psum —
    # the reference's reduce_from_parallel_region), l over h, m over w
    (r".*filter/weight$", lambda s: P("fin", None, "h", "w", None) if len(s) == 5
     else P("fin", None, "h", None)),
    # 1x1 skips: out over fin (keeps embed layout), in replicated
    (r".*(inner_skip|outer_skip)/weight$", lambda s: P("fin", None)),
    # direct position embedding: SFNO (1, C, H, W) -> spatial dims over h/w;
    # ViT/AFNO token layout (1, N, C) -> embed dim over fin
    (r".*pos_embed$", lambda s: P(None, None, "h", "w") if len(s) == 4
     else P(None, None, "fin")),
    (r".*pos_embed_[rc]$", lambda s: P(None, None, "h", "w")),
    # --- ViT head-parallel attention (ref: makani/mpu/layers.py:454-524:
    # qkv column-parallel with heads over the matmul group, proj
    # row-parallel). flax Dense kernels are (in, out): embed activations
    # live on fin, heads/hidden ride fout, proj/fc2 contract fout back
    # (GSPMD inserts the psum = reduce_from_parallel_region).
    (r".*attn/qkv/kernel$", lambda s: P("fin", "fout")),
    (r".*attn/qkv/bias$", lambda s: P("fout")),
    (r".*attn/proj/kernel$", lambda s: P("fout", "fin")),
    (r".*attn/proj/bias$", lambda s: P("fin")),
    (r".*mlp_fc1/kernel$", lambda s: P("fin", "fout")),
    (r".*mlp_fc1/bias$", lambda s: P("fout")),
    (r".*mlp_fc2/kernel$", lambda s: P("fout", "fin")),
    (r".*mlp_fc2/bias$", lambda s: P("fin")),
    (r".*head/kernel$", lambda s: P("fin", None)),
    # --- PatchEmbed (ref: DistributedPatchEmbed, layers.py:404-451):
    # conv weight (embed, in_chans, ph, pw) — embed channels over fin
    (r".*patch_embed/weight$", lambda s: P("fin")),
    (r".*patch_embed/bias$", lambda s: P("fin")),
    # --- AFNO v2 block-diagonal spectral MLP (ref: DistributedAFNO2Dv2,
    # layers.py:544-643): blocks split over fin, matching the channel
    # layout c = num_blocks * block_size sharded over fin
    (r".*filter/w[12]$", lambda s: P("fin")),
    (r".*filter/b[12]$", lambda s: P(None, "fin")),
    (r".*skip_weight$", lambda s: P("fin", None)),
    (r".*head_weight$", lambda s: P(None, "fin")),
]


def _fit_spec(spec: P, shape, mesh) -> P:
    """Drop sharding on dims the mesh axes do not divide evenly: jit/device
    boundary shardings require divisibility (uneven tiling is only supported
    for in-graph intermediates, where GSPMD pads). E.g. the 73-channel
    encoder/decoder boundary dims and odd lmax dims stay replicated."""
    if mesh is None:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    out = []
    for s, entry in zip(shape, entries):
        if entry is None:
            out.append(None)
            continue
        axes = entry if isinstance(entry, tuple) else (entry,)
        parts = 1
        for a in axes:
            parts *= int(mesh.shape[a])
        out.append(entry if s % parts == 0 else None)
    return P(*out)


def _match_spec(path: str, shape, mesh) -> P:
    for pattern, fn in _RULES:
        if re.match(pattern, path):
            spec = fn(tuple(shape))
            # drop axes that exceed the tensor rank
            if len(spec) > len(shape):
                spec = P(*spec[: len(shape)])
            return _fit_spec(spec, shape, mesh)
    return P()


def spec_for_path(path: str, shape, mesh=None) -> P:
    shape = tuple(shape)
    # params under an nn.scan (sfnonet scan_layers) carry a leading stacked
    # LAYER axis; rules are written for the unstacked shape, so match on
    # shape[1:] and keep the layer axis replicated — otherwise e.g. the
    # `filter/weight` rule would put "fin" on the layer dim.
    if "scan_blocks/" in path and shape:
        inner = _match_spec(path, shape[1:], mesh)
        return P(None, *inner)
    return _match_spec(path, shape, mesh)


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = ["/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
             for kp, _ in flat]
    leaves = [v for _, v in flat]
    return paths, leaves, treedef


def get_param_specs(params, mesh=None):
    """Param tree -> PartitionSpec tree (same structure)."""
    mesh = mesh or comm.get_mesh()
    paths, leaves, treedef = _flatten_with_paths(params)
    specs = [spec_for_path(p, l.shape, mesh) for p, l in zip(paths, leaves)]
    return jax.tree_util.tree_unflatten(treedef, specs)


def get_param_shardings(params, mesh=None):
    mesh = mesh or comm.get_mesh()
    specs = get_param_specs(params, mesh)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_tree(tree, shardings):
    """Reshard a pytree onto the given shardings via a jitted identity.

    Unlike jax.device_put, jit out_shardings accept UNEVENLY divisible dims
    (GSPMD pads internally) — required for e.g. 73 data channels over fin=2
    at the encoder boundary of the flagship config. No donation: aliasing
    across a resharding changes per-device buffer sizes and is rejected.

    Inputs COMMITTED to a device set that differs from the target mesh
    (e.g. orbax-restored arrays pinned to one device) are rejected by jit;
    round-trip those through host numpy (uncommitted) and retry."""
    import numpy as np

    try:
        return jax.jit(lambda t: t, out_shardings=shardings)(tree)
    except ValueError as e:
        # Only the committed-device mismatch is retryable; a genuine bad-spec
        # ValueError must propagate as-is (the host round-trip below
        # materializes the ENTIRE tree — multi-GB for flagship params+Adam
        # state — and would pay that cost just to re-raise).
        msg = str(e).lower()
        if not ("device" in msg or "committed" in msg):
            raise
        host = jax.tree.map(np.asarray, tree)
        return jax.jit(lambda t: t, out_shardings=shardings)(host)


def get_opt_state_shardings(opt_state, params, mesh=None):
    """Match optimizer-state leaves to param shardings by shape: moment
    buffers mirror their parameter's sharding, scalars replicate."""
    mesh = mesh or comm.get_mesh()
    paths, leaves, _ = _flatten_with_paths(params)
    by_shape = {}
    for p, l in zip(paths, leaves):
        by_shape.setdefault(tuple(l.shape), spec_for_path(p, l.shape, mesh))

    opt_paths, opt_leaves, opt_treedef = _flatten_with_paths(opt_state)
    shardings = []
    for path, leaf in zip(opt_paths, opt_leaves):
        shape = tuple(getattr(leaf, "shape", ()))
        # moment trees repeat the param path suffix; reuse path rules first
        m = re.search(r"(model/.*)$", path)
        if m is not None and shape:
            spec = spec_for_path(m.group(1), shape, mesh)
        else:
            spec = by_shape.get(shape, P()) if shape else P()
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(opt_treedef, shardings)
