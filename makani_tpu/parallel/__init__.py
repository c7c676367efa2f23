from makani_tpu.parallel import comm
