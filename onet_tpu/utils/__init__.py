from onet_tpu.utils.summary import (
    count_parameters, model_summary, parameter_statistics,
    compare_parameter_trees, get_scr,
)
from onet_tpu.core.config import config_to_str
from onet_tpu.utils.profiling import (
    StepTimer, trace, hlo_breakdown, category_breakdown,
)
