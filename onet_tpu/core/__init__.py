from onet_tpu.core.policy import Policy, DEFAULT, BF16_COMPUTE
from onet_tpu.core.prng import RngStream
from onet_tpu.core.mesh import make_mesh, replicated, batch_sharding
