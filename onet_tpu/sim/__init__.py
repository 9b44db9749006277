from onet_tpu.sim.targets import place_gaussian_targets
from onet_tpu.sim.rayleigh import rayleigh_frames, generate_rayleigh_dataset
from onet_tpu.sim.kdist import KDistSimulator, kdist_frames
