from onet_tpu.ops.math import log1pexp
from onet_tpu.ops.normalize import minmax_per_frame, minmax_per_array, complement
