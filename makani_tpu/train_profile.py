"""Profiling training CLI (parity with ref: makani/train_profile.py).

The reference duplicates the trainer with cudaProfilerStart/Stop windows for
nsys; on TPU the same capability is the jax profiler trace, so this
entrypoint is the train CLI with profiling defaulted on (--profile 20 unless
overridden). Inspect the xplane trace under <exp_dir>/profile with
TensorBoard's profile plugin.
"""

import sys

from makani_tpu.train import main

if __name__ == "__main__":
    if not any(a.startswith("--profile") for a in sys.argv[1:]):
        sys.argv.append("--profile")
        sys.argv.append("20")
    main()
