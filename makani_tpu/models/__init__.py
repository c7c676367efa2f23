from makani_tpu.models import common
from makani_tpu.models import networks
