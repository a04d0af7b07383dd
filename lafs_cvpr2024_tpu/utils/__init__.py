from .logging import (
    AverageMeter,
    JSONLLogger,
    MetricLogger,
    SmoothedValue,
    TensorBoardWriter,
    need_save,
)
from .profiling import Throughput, benchmark, cost_analysis, count_params, model_complexity, trace
from .retrieval import PCA, compute_ap, compute_map

__all__ = [
    "AverageMeter",
    "JSONLLogger",
    "MetricLogger",
    "SmoothedValue",
    "TensorBoardWriter",
    "need_save",
    "Throughput",
    "benchmark",
    "cost_analysis",
    "count_params",
    "model_complexity",
    "trace",
    "PCA",
    "compute_ap",
    "compute_map",
]
