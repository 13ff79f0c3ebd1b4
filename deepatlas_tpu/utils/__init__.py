"""Utilities: config persistence, visualization, profiling, logging."""
from .config import (ParameterDict, load_jason_to_dict, load_json_to_dict,
                     save_dict_to_json)
from .profiling import (ThroughputMeter, annotate, device_memory_stats, sync,
                        trace)
from . import visualize

__all__ = ["ParameterDict", "save_dict_to_json", "load_json_to_dict",
           "load_jason_to_dict", "visualize", "ThroughputMeter", "annotate",
           "device_memory_stats", "sync", "trace"]
