from makani_tpu.utils.yparams import ParamsBase, YParams
