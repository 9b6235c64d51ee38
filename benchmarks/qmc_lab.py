"""QMC sampling-path ablation lab (run on a real TPU: `python benchmarks/qmc_lab.py`).

Names where the SOBOL_BB sampling cost lives, stage by stage, at the
headline MC shape (64 steps x 2M paths). Stages (each includes the ones
above it):

  sobol_bits   — split-table scrambled Sobol uint32 points, [d, count]
                 (ops/sobol.py::sobol_uint32_t; round 3's per-point
                 32-term masked XOR reduce was 59% of the whole cost)
  +ndtri(old)  — the round-3 inverse CDF (double-branch rational)
  +erfinv      — the shipped inverse (sqrt(2)*erf_inv; ops/qmc.py::_inv_cdf)
  full_normals — + the Brownian-bridge contraction (a plain [T,d]@[d,count]
                 MXU matmul in the dimension-major layout — near-free)
  asian_walk   — a full path-dependent SOBOL_BB sim (Asian geometric):
                 generation + the timestep scan every non-terminal payoff
                 pays (bench.py's qmc_pathgen_path_steps_per_sec)
  terminal     — the TERMINAL SOBOL_BB sim: the exact bridge shortcut
                 (only Sobol dimension 0 is live; ops/gbm.py) — bench.py's
                 qmc_path_steps_per_sec
  pseudo_xla   — the pseudo XLA scan at the same shape, for scale

Round-4 v5e numbers at reps-sized timing (best-of-3, scan+float
discipline, reps per benchmarks/_timing.py's sizing note; the rebuild's
first numbers carried the reps=10 tunnel artifact): round 3 shipped
18.7 ms full_normals / 19.7 ms terminal sim (6.8e9 path-steps/s). Fresh
run: sobol_bits 0.33 ms, +erfinv 1.76 ms (vs 6.90 with the old ndtri),
full_normals 5.27 ms — the bridge MATMUL is now the binding generation
op at ~3.5 ms (~2.7x its ~1.3 ms HBM bound; "near-free" was an artifact
of the under-repped first measurement) — asian_walk 12.4 ms (1.09e10
path-steps/s), terminal shortcut 0.38 ms (3.6e11, ~13x ABOVE the pseudo
scan's 4.93 ms / 2.73e10).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from benchmarks._timing import lab_parser, rate_line

T, R, C = 64, 8192, 256


def main() -> None:
    args = lab_parser(__doc__.splitlines()[0], default_reps=200).parse_args()
    rows = 1024 if args.quick else R
    count = rows * C
    print(f"device: {jax.devices()[0].device_kind}; shape {T}x{rows}x{C}")

    from spectralmc_tpu.ops.gbm import (
        PathScheme,
        PayoffKind,
        SamplingKind,
        simulate_terminal_rows,
        simulate_underlier_rows,
    )
    from spectralmc_tpu.ops.qmc import _qmc_tables, qmc_effective_normals, qmc_sobol_dims
    from spectralmc_tpu.ops.sobol import sobol_uint32_t

    contract = jnp.array([100.0, 100.0, 1.0, 0.03, 0.01, 0.25], jnp.float32)
    sdims = qmc_sobol_dims(T, 1)
    dnp, snp = _qmc_tables(sdims, 31)
    directions = jnp.asarray(dnp)
    host_shift = jnp.asarray(snp)

    def sobol_bits(k):
        ds = jax.random.bits(jax.random.split(k)[0], (sdims,), dtype=jnp.uint32)
        return sobol_uint32_t(directions, host_shift ^ ds, 0, count)

    from spectralmc_tpu.ops.qmc import _inv_cdf

    def bits_ndtri(k):
        # round-3 inverse (kept for the ablation): ndtri's double-branch
        # rational — measured 2.2x the shipped erf_inv polynomial
        bits = sobol_bits(k)
        u = ((bits >> jnp.uint32(8)).astype(jnp.float32) + jnp.float32(0.5)) * jnp.float32(
            2.0**-24
        )
        return jax.scipy.special.ndtri(u)

    def bits_erfinv(k):
        return _inv_cdf(sobol_bits(k))  # the shipped inverse

    def xla_bridge(k):
        # the pre-round-4.2 pipeline: normals matrix materialized to HBM
        # around the bridge matmul (kept for the ablation; the public
        # generator below fuses all three stages into one Pallas kernel)
        ds = jax.random.bits(jax.random.split(k)[0], (sdims,), dtype=jnp.uint32)
        bits = sobol_uint32_t(directions, host_shift ^ ds, 0, count)
        z = _inv_cdf(bits).reshape(T, 1, count)
        from spectralmc_tpu.ops.qmc import brownian_bridge_matrix

        bb = jnp.asarray(brownian_bridge_matrix(T), jnp.float32)
        return jax.lax.dot_general(
            bb, z, (((1,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST
        )

    def full_normals(k):
        # the PUBLIC generator: on TPU this is the fused Pallas kernel
        # (ops/qmc_pallas.py) — sobol bits -> erf_inv -> bridge with only
        # the output touching HBM, bit-identical to xla_bridge
        return qmc_effective_normals(
            k, timesteps=T, rows=rows, cols=C, dtype=jnp.float32, mc_seed=31
        )

    def asian_walk(k):
        return simulate_underlier_rows(
            k, contract, timesteps=T, rows=rows, cols=C, dtype=jnp.float32,
            scheme=PathScheme.LOG_EULER, payoff=PayoffKind.ASIAN_GEOMETRIC,
            sampling=SamplingKind.SOBOL_BB, mc_seed=31,
        )

    def terminal(k):
        return simulate_terminal_rows(
            k, contract, timesteps=T, rows=rows, cols=C, dtype=jnp.float32,
            scheme=PathScheme.LOG_EULER, sampling=SamplingKind.SOBOL_BB, mc_seed=31,
        )

    def pseudo_xla(k):
        return simulate_terminal_rows(
            k, contract, timesteps=T, rows=rows, cols=C, dtype=jnp.float32,
            scheme=PathScheme.LOG_EULER,
        )

    work = T * count
    for name, fn in (
        ("sobol_bits", sobol_bits),
        ("+ndtri(old)", bits_ndtri),
        ("+erfinv", bits_erfinv),
        ("xla_bridge", xla_bridge),
        ("full_normals", full_normals),
        ("asian_walk", asian_walk),
        ("terminal", terminal),
        ("pseudo_xla", pseudo_xla),
    ):
        rate_line(name, fn, jax.random.PRNGKey(4), work=work, reps=args.reps,
                  calls=args.calls)


if __name__ == "__main__":
    main()
