from .benchmark import device_time, throughput
from .checkpoint_convert import (
    convert_state_dict,
    load_pytorch_checkpoint,
    merge_into_variables,
)
from .pretrained import (
    PRETRAINED_URLS,
    download_checkpoint,
    load_pretrained,
)
from .profiling import MetricLogger, StepTimer, annotate, enable_xla_dump, trace
