"""Observability utilities: TensorBoard logging, structured logs, profiling."""

from spectralmc_tpu.utils.tensorboard_writer import TensorBoardLogger, log_chain_to_tensorboard
from spectralmc_tpu.utils.profiling import profile_trace

__all__ = ["TensorBoardLogger", "log_chain_to_tensorboard", "profile_trace"]
