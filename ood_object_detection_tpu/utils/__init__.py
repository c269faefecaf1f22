from .benchmark import device_time, throughput
from .checkpoint_convert import (
    convert_state_dict,
    load_pytorch_checkpoint,
    merge_into_variables,
)
from .profiling import MetricLogger, StepTimer, annotate, enable_xla_dump, trace
