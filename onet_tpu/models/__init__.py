from onet_tpu.models.unet import (
    unet_init, unet_apply, unet_apply_stacked, param_count,
)
from onet_tpu.models.onet import (
    onet_init,
    onet_forward,
    compute_loss,
    predict_label,
    OnetOutput,
)
