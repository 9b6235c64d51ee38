"""Training orchestrator: the fused Sobol→MC→FFT→CVNN→Adam step."""

from spectralmc_tpu.training.trainer import (
    CommitPlan,
    FinalAndIntervalCommit,
    FinalCommit,
    GbmCVNNPricer,
    GbmCVNNPricerConfig,
    IntervalCommit,
    NoCommit,
    PricePrediction,
    StepMetrics,
    TrainingConfig,
    TrainingResult,
    build_training_config,
)

__all__ = [
    "CommitPlan",
    "FinalAndIntervalCommit",
    "FinalCommit",
    "GbmCVNNPricer",
    "GbmCVNNPricerConfig",
    "IntervalCommit",
    "NoCommit",
    "PricePrediction",
    "StepMetrics",
    "TrainingConfig",
    "TrainingResult",
    "build_training_config",
]
