"""Analytic FLOP accounting for the fused train step (MFU/roofline).

The sim kernels all carry speed-of-light checks (docs/performance.md); this
module extends the same discipline to the MXU-bound half of the train step —
the complex matmuls and the FFT — so the published steps/s figures come with
a utilization statement instead of an unfalsifiable rate. The reference
publishes raw steps/s only (its benchmark harness times
``gbm_trainer.train()`` wall clock and nothing else), so this exceeds parity.

Counting conventions (stated so the numbers are reproducible):

* A real ``[B, in] @ [in, out]`` matmul is ``2*B*in*out`` FLOPs
  (multiply+add), the standard MXU accounting.
* A ComplexLinear stores ``w_re``/``w_im`` and computes 4 real dots
  (models/cvnn.py); each 2-D weight leaf therefore appears in 2 forward
  dots → ``4*B*in*out`` forward FLOPs per leaf, summed over both leaves of
  each complex weight gives the familiar ``8*B*in*out`` per complex matmul.
* Backward re-uses each weight twice (input-grad and weight-grad dots of the
  same shape) → total fwd+bwd = 3x forward. Adam and the activations are
  VPU elementwise noise at these shapes and are not counted.
* An N-point complex FFT is ``5*N*log2(N)`` FLOPs (Cooley–Tukey convention).
  The DFT-linearity reduction (ops/spectrum.py::payoff_spectrum) means ONE
  FFT per contract, not one per MC row.
"""

from __future__ import annotations

import math

import jax

from spectralmc_tpu.core.aliases import PyTree

#: Peak MXU throughput of one TPU v5e (v5 lite) chip in FLOP/s, bf16 inputs
#: with f32 accumulation — the denominator for MFU. Under
#: ``jax_default_matmul_precision="highest"`` each f32 matmul lowers to a
#: 6-pass bf16 product (bf16_6x), so the *hardware* is 6x busier than the
#: nominal f32 FLOP count suggests; report the pass multiplier alongside.
V5E_PEAK_BF16_FLOPS: float = 197e12


def matmul_forward_flops(params: PyTree, batch_size: int) -> int:
    """Forward MXU FLOPs of one CVNN apply at ``batch_size`` rows.

    Walks the params pytree: every 2-D leaf of shape ``(in, out)`` is a real
    weight used by 2 forward dots (see module conventions).
    """
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if getattr(leaf, "ndim", 0) == 2:
            d_in, d_out = int(leaf.shape[0]), int(leaf.shape[1])
            total += 4 * batch_size * d_in * d_out
    return total


def train_step_matmul_flops(params: PyTree, batch_size: int) -> int:
    """Fwd+bwd MXU FLOPs of one fused train step (3x forward)."""
    return 3 * matmul_forward_flops(params, batch_size)


def fft_flops(batch_size: int, network_size: int) -> int:
    """FLOPs of the per-contract spectrum FFTs in one train step."""
    return batch_size * int(5 * network_size * math.log2(network_size))


def sim_path_steps(
    batch_size: int, rows: int, cols: int, timesteps: int
) -> int:
    """MC path-steps simulated per train step (the VPU-bound segment).

    Path-steps, not FLOPs: the sim's currency is the per-step log-Euler
    update whose speed-of-light is HBM/VPU-bound and already characterized
    by the kernel benches (docs/performance.md) — comparing the step's sim
    segment against the standalone kernel rate is the honest roofline for
    this segment, not an MXU FLOP count.
    """
    return batch_size * rows * cols * timesteps


def mfu(
    matmul_flops_per_step: float,
    steps_per_sec: float,
    *,
    peak_flops: float = V5E_PEAK_BF16_FLOPS,
) -> tuple[float, float]:
    """(achieved TFLOP/s, fraction of peak) for a measured step rate."""
    achieved = matmul_flops_per_step * steps_per_sec
    return achieved / 1e12, achieved / peak_flops
