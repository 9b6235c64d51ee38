"""The fused train step as a pure, reusable function factory.

This is the heart of the framework (SURVEY §7 stage 6): ONE traced program
per batch doing Sobol sampling → vmapped GBM Monte-Carlo → FFT spectrum →
CVNN forward/backward → Adam update, with zero host transfers. The reference
spreads this across a host loop with per-contract CUDA kernel launches, cuFFT
calls and a DLPack hop (``/root/reference/src/spectralmc/gbm_trainer.py:1532-1597``).

Exposed as a factory so the single-chip trainer (``trainer.py``), the sharded
trainer (``parallel/trainer.py``), the graft entry point and the benchmark
all build from the same numerics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from jax.typing import DTypeLike

from spectralmc_tpu.core.aliases import PyTree

import jax
import jax.numpy as jnp
import optax
from pydantic import BaseModel, ConfigDict

from spectralmc_tpu.models.factory import CVNN
from spectralmc_tpu.ops.dispatch import (  # noqa: F401 — re-exported seam
    contract_class,
    contract_dim,
    make_mean_target,
    make_underlier_simulator,
)
from spectralmc_tpu.ops.gbm import (
    ForwardNormalization,
    SimulationParams,
    terminal_to_prices,
)
from spectralmc_tpu.ops.sobol import scale_to_bounds, sobol_unit
from spectralmc_tpu.ops.spectrum import payoff_spectrum

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8

Carry = dict[str, Any]
BatchFn = Callable[[Carry, None], tuple[Carry, tuple[jax.Array, jax.Array]]]


class LRScheduleConfig(BaseModel):
    """Warmup + cosine-decay learning-rate schedule (checkpoint-transparent).

    No reference counterpart (it trains at a fixed Adam lr,
    gbm_trainer.py:1513-1528); measured on the bench quality workload a
    high-peak warmup-cosine more than halves the char-fn pricing MAE
    (docs/performance.md). The schedule position is the optimizer step
    count, which already lives in the typed Adam snapshot — on resume,
    ``restore_into_optax`` re-syncs the schedule cell from the same count,
    so resume ≡ continuous holds with no new checkpoint state.
    """

    model_config = ConfigDict(frozen=True, extra="forbid")

    peak: float
    decay_steps: int
    warmup_steps: int = 0
    end_value: float = 0.0


def schedule_rates(
    lr_schedule: LRScheduleConfig, start_count: int, length: int
) -> "optax.GradientTransformation":
    """The ACTUAL per-step learning rates for metrics/TensorBoard.

    Evaluates the same optax schedule the optimizer applies at counts
    ``start_count .. start_count+length-1`` (the optimizer count equals the
    trainer's global step by construction), so logged curves show the real
    warmup/decay instead of the constant config rate.
    """
    import numpy as np

    fn = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr_schedule.peak,
        warmup_steps=lr_schedule.warmup_steps,
        decay_steps=lr_schedule.decay_steps,
        end_value=lr_schedule.end_value,
    )
    return np.asarray(fn(jnp.arange(start_count, start_count + length)))


def make_optimizer(
    learning_rate: float, lr_schedule: LRScheduleConfig | None = None
) -> optax.GradientTransformation:
    """The reference's Adam settings (gbm_trainer.py:1513-1528), with an
    optional warmup-cosine schedule replacing the constant rate."""
    if lr_schedule is not None:
        rate: optax.Schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr_schedule.peak,
            warmup_steps=lr_schedule.warmup_steps,
            decay_steps=lr_schedule.decay_steps,
            end_value=lr_schedule.end_value,
        )
    else:
        rate = learning_rate
    return optax.adam(rate, b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS)


@dataclass(frozen=True)
class SobolTable:
    """Device-resident Sobol constants (directions/shift/bounds columns)."""

    directions: jax.Array
    shift: jax.Array
    lower: jax.Array
    upper: jax.Array


def make_mc_spectrum(
    sim: SimulationParams,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """One contract's characteristic-function target: MC → FFT → batch mean."""
    dtype = sim.precision.to_jnp()
    base_key = jax.random.PRNGKey(sim.mc_seed)
    normalize = sim.normalization == ForwardNormalization.MEAN
    simulate = make_underlier_simulator(sim, rows=sim.batches_per_mc_run)
    mean_target = make_mean_target(sim)

    def mc_spectrum(draw_index: jax.Array, contract: jax.Array) -> jax.Array:
        key = jax.random.fold_in(base_key, draw_index)
        rows = simulate(key, contract)
        prices = terminal_to_prices(
            rows.reshape(-1),
            contract,
            normalize=normalize,
            dtype=dtype,
            mean_target=mean_target(contract),
            term=sim.term,
        )
        return payoff_spectrum(
            prices.put_payoffs,
            batches=sim.batches_per_mc_run,
            network_size=sim.network_size,
        )

    return mc_spectrum


def grad_inf_norm(grads: PyTree) -> jax.Array:
    """Max-abs over all leaves — the reference's ``clip_grad_norm_(inf)`` metric."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jax.tree_util.tree_reduce(
        jnp.maximum, [jnp.max(jnp.abs(g)) for g in leaves], jnp.asarray(0.0)
    )


def make_input_normalizer(
    table: SobolTable, *, enabled: bool, dtype: DTypeLike
) -> Callable[[jax.Array], jax.Array]:
    """Affine map of contract features onto [0, 1] from the Sobol bounds.

    Raw contract features span two orders of magnitude (spot ~1e2 vs rate
    ~1e-2), which conditions the CVNN's first layer badly — the measured
    char-fn pricing MAE plateaus ~4x higher without this. The map is a pure
    function of the (checkpointed) domain bounds, so resume determinism is
    unaffected; degenerate bounds (lower == upper) pass through at 0.
    """
    if not enabled:
        return lambda x: x
    lower = table.lower.astype(dtype)
    span = table.upper.astype(dtype) - lower
    safe_span = jnp.where(span == 0, jnp.asarray(1.0, dtype), span)

    def normalize(x: jax.Array) -> jax.Array:
        return (x - lower) / safe_span

    return normalize


def make_fused_batch(
    model: CVNN,
    sim: SimulationParams,
    table: SobolTable,
    *,
    batch_size: int,
    learning_rate: float,
    contract_chunk: int | None = None,
    normalize_inputs: bool = False,
    lr_schedule: LRScheduleConfig | None = None,
) -> BatchFn:
    """Build the single-device fused batch function.

    Carry: ``{params, bn_state, opt_state, sobol_skip: u32, mc_skip: u32}``.
    Returns ``(new_carry, (loss, grad_inf_norm))`` — jit/scan-composable.

    ``contract_chunk`` bounds the MC working set: the per-contract spectrum
    targets are computed ``chunk`` contracts at a time under ``lax.map``
    instead of one big ``vmap``, so production batches whose simulated rows
    exceed HBM (BASELINE config 3: 8k contracts x 1M paths needs ~34 GB live
    if vmapped) stream through in O(chunk x paths) memory. Chunking is
    bit-transparent — each contract's program is unchanged; only scheduling
    differs.
    """
    dtype = sim.precision.to_jnp()
    mc_spectrum = make_mc_spectrum(sim)
    optimizer = make_optimizer(learning_rate, lr_schedule)
    lower = table.lower.astype(dtype)
    upper = table.upper.astype(dtype)
    normalize_fn = make_input_normalizer(table, enabled=normalize_inputs, dtype=dtype)
    if contract_chunk is not None and batch_size % contract_chunk:
        raise ValueError(
            f"batch_size {batch_size} not divisible by contract_chunk {contract_chunk}"
        )

    def spectrum_targets(draws: jax.Array, contracts: jax.Array) -> jax.Array:
        if contract_chunk is None or contract_chunk >= batch_size:
            return jax.vmap(mc_spectrum)(draws, contracts)
        chunks = batch_size // contract_chunk
        mapped = jax.lax.map(
            lambda args: jax.vmap(mc_spectrum)(*args),
            (
                draws.reshape(chunks, contract_chunk),
                contracts.reshape(chunks, contract_chunk, contracts.shape[-1]),
            ),
        )
        return mapped.reshape(batch_size, sim.network_size)

    def one_batch(carry: Carry, _: None) -> tuple[Carry, tuple[jax.Array, jax.Array]]:
        params, bn_state = carry["params"], carry["bn_state"]
        opt_state = carry["opt_state"]
        sobol_skip, mc_skip = carry["sobol_skip"], carry["mc_skip"]

        unit = sobol_unit(table.directions, table.shift, sobol_skip, batch_size, dtype)
        contracts = scale_to_bounds(unit, lower, upper)  # [B, 6]
        draws = mc_skip + jnp.arange(batch_size, dtype=jnp.uint32)
        specs = spectrum_targets(draws, contracts)  # [B, network] complex
        inputs = normalize_fn(contracts)  # MC keeps raw market units

        def loss_fn(p: PyTree, s: PyTree) -> tuple[jax.Array, PyTree]:
            out_re, out_im, new_s = model.apply(
                p, s, inputs, jnp.zeros_like(inputs), train=True
            )
            # MSE(re) + MSE(im) vs FFT targets (reference gbm_trainer.py:827-835)
            loss = jnp.mean(jnp.square(out_re - specs.real.astype(dtype))) + jnp.mean(
                jnp.square(out_im - specs.imag.astype(dtype))
            )
            return loss, new_s

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, bn_state)
        grad_norm = grad_inf_norm(grads)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_carry = {
            "params": new_params,
            "bn_state": new_bn,
            "opt_state": new_opt,
            "sobol_skip": sobol_skip + jnp.uint32(batch_size),
            "mc_skip": mc_skip + jnp.uint32(batch_size),
        }
        return new_carry, (loss.astype(jnp.float32), grad_norm.astype(jnp.float32))

    return one_batch
