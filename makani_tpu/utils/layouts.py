"""Auto memory-layout compilation helpers.

XLA's default convention materializes jit arguments in row-major layouts; the
SFNO's dominant parameters (the dhconv spectral weights, ~1.6 GB at edim 320)
then get relaid out toward the batched-matmul layout inside EVERY step
(~27 ms/step measured on a v5e). Compiling with AUTO input/output layouts
lets layout assignment pick the layouts the matmuls want; donated state fed
back through the step stays in those layouts, so the relayout happens once.

The reference needs no equivalent: torch parameters are persistent buffers
whose layout cuBLAS consumes directly. Under jit, layouts are a per-program
contract — this module owns that contract.
"""

import jax


def reput_tree(tree, formats):
    """device_put each leaf into the given Format, leaf by leaf so peak extra
    memory is one leaf (a whole-tree put would double the residency of
    multi-GB parameter/optimizer state)."""
    leaves, treedef = jax.tree.flatten(tree)
    fmt_leaves = jax.tree.flatten(formats)[0]
    out = []
    for leaf, fmt in zip(leaves, fmt_leaves):
        if getattr(leaf, "format", None) == fmt:
            out.append(leaf)
            continue
        new = jax.device_put(leaf, fmt)
        new.block_until_ready()
        del leaf
        out.append(new)
    return jax.tree.unflatten(treedef, out)


def compile_with_auto_layouts(fn, example_args, donate_argnums=()):
    """Compile fn with XLA-chosen input/output layouts.

    Returns (compiled, input_formats) where input_formats is a per-argument
    tuple of Format pytrees: pass persistent state through ``reput_tree``
    once, and device_put fresh per-step data directly into its format.
    Donated arguments alias their outputs, so state round-trips through the
    step without further relayouts.
    """
    from jax.experimental.layout import Format, Layout

    auto = Format(Layout.AUTO)
    jitted = jax.jit(
        fn,
        donate_argnums=donate_argnums,
        in_shardings=tuple(auto for _ in example_args),
        out_shardings=auto,
    )
    # AUTO lowering requires abstract arguments (concrete committed arrays
    # carry a layout that conflicts with the AUTO request)
    abstract = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), example_args)
    compiled = jitted.lower(*abstract).compile()
    return compiled, compiled.input_formats[0]
