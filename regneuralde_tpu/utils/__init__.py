"""Logging, metrics, and distribution utilities (reference: src/utils.jl,
src/metrics.jl)."""

from regneuralde_tpu.utils.logging import AverageMeter, table_logger
from regneuralde_tpu.utils.distributions import BatchedMultiVariateNormal
from regneuralde_tpu.utils.metrics import accuracy, loglikelihood

__all__ = [
    "AverageMeter",
    "table_logger",
    "BatchedMultiVariateNormal",
    "accuracy",
    "loglikelihood",
]
