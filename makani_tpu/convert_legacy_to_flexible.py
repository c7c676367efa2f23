"""Checkpoint format converter CLI (parity with ref:
makani/convert_legacy_to_flexible.py).

In makani_tpu, orbax checkpoints are "flexible" by construction (global
logical arrays, resharding on restore). This CLI therefore converts
*reference* PyTorch legacy checkpoints into makani_tpu orbax checkpoints —
see makani_tpu/tools/convert_torch_checkpoint.py for the mapping.
"""

from makani_tpu.tools.convert_torch_checkpoint import convert  # noqa: F401

if __name__ == "__main__":
    import runpy
    runpy.run_module("makani_tpu.tools.convert_torch_checkpoint", run_name="__main__")
