"""The sharded fused train step: shard_map over (batch, paths) mesh axes.

Numerics contract vs the single-device step (``training/step.py``):

* **Contracts** are identical — Sobol points are a pure function of the global
  skip index, and shard ``i`` of the ``batch`` axis samples indices
  ``[skip + i*local_B, skip + (i+1)*local_B)``.
* **MC normals** are identical bit-for-bit — ``simulate_terminal_rows`` keys
  normals by global row index, and a ``paths``-shard owning rows
  ``[j*local_rows, (j+1)*local_rows)`` passes ``row_offset`` accordingly.
* **Spectra** equal the single-device values up to summation order: local
  FFT row-sums are ``psum``-reduced over the ``paths`` axis.
* **Gradients** equal the global batch mean up to reduction order: per-shard
  means are ``pmean``-reduced over the ``batch`` axis.
* **Batch-norm** batch statistics are computed per ``batch``-shard (standard
  DP BatchNorm semantics, documented deviation — the reference is
  single-device and silent on this, SURVEY §7 "hard parts"). Running stats
  are pmean-merged across shards so the carried state stays replicated.

The NN forward/backward is intentionally replicated along the ``paths`` axis
(the CVNN is tiny next to the MC), which makes the only per-step collectives
one ``psum`` (spectra) and one ``pmean`` (grads/loss) — both riding ICI.
"""

from __future__ import annotations

from typing import Callable

from spectralmc_tpu.core.aliases import PyTree

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from spectralmc_tpu.models.factory import CVNN
from spectralmc_tpu.ops.gbm import ForwardNormalization, SimulationParams
from spectralmc_tpu.ops.sobol import scale_to_bounds, sobol_unit
from spectralmc_tpu.ops.spectrum import local_spectrum_sum
from spectralmc_tpu.parallel.mesh import MeshSpec
from spectralmc_tpu.training.step import (
    Carry,
    LRScheduleConfig,
    SobolTable,
    grad_inf_norm,
    make_input_normalizer,
    make_mean_target,
    make_optimizer,
    make_underlier_simulator,
)


def make_sharded_batch(
    model: CVNN,
    sim: SimulationParams,
    table: SobolTable,
    *,
    batch_size: int,
    learning_rate: float,
    spec: MeshSpec,
    normalize_inputs: bool = False,
    contract_chunk: int | None = None,
    lr_schedule: LRScheduleConfig | None = None,
) -> Callable[[Carry, None], tuple[Carry, tuple[jax.Array, jax.Array]]]:
    """Per-device body of one fused batch; call under ``shard_map``.

    ``contract_chunk`` bounds each device's MC working set the same way the
    single-device step does (``training/step.py``): the per-shard contract
    slice streams ``chunk`` contracts at a time under ``lax.map``.
    Bit-transparent; required when the per-shard rows exceed HBM.
    """
    dp = spec.batch_size_divisor
    mc = spec.paths_divisor
    if batch_size % dp != 0:
        raise ValueError(f"batch_size {batch_size} not divisible by batch axis {dp}")
    if sim.batches_per_mc_run % mc != 0:
        raise ValueError(
            f"batches_per_mc_run {sim.batches_per_mc_run} not divisible by paths axis {mc}"
        )
    local_b = batch_size // dp
    # chunk >= local_b degrades to the plain vmap (same as the single-device
    # step when chunk >= batch); only a PARTIAL chunking needs divisibility.
    if contract_chunk is not None and contract_chunk < local_b and local_b % contract_chunk:
        raise ValueError(
            f"per-shard batch {local_b} not divisible by contract_chunk {contract_chunk}"
        )
    local_rows = sim.batches_per_mc_run // mc
    dtype = sim.precision.to_jnp()
    normalize = sim.normalization == ForwardNormalization.MEAN
    base_key = jax.random.PRNGKey(sim.mc_seed)
    optimizer = make_optimizer(learning_rate, lr_schedule)
    lower = table.lower.astype(dtype)
    upper = table.upper.astype(dtype)
    dp_axis, mc_axis = spec.batch_axis, spec.paths_axis

    # the paths axis rides into the simulator: the AMERICAN kinds psum their
    # LSMC regression moments over it so every shard applies the identical
    # exercise policy (pathwise-independent simulators ignore it)
    simulate = make_underlier_simulator(sim, rows=local_rows, axis_name=mc_axis)
    mean_target_contract = make_mean_target(sim)
    normalize_fn = make_input_normalizer(table, enabled=normalize_inputs, dtype=dtype)

    def mc_spectrum_local(draw: jax.Array, contract: jax.Array, mc_idx: jax.Array) -> jax.Array:
        key = jax.random.fold_in(base_key, draw)
        rows = simulate(key, contract, mc_idx * jnp.uint32(local_rows))
        flat = rows.reshape(-1)
        strike, maturity, rate = (
            contract[1].astype(dtype),
            contract[2].astype(dtype),
            contract[3].astype(dtype),
        )
        df = jnp.exp(-rate * maturity)
        if normalize:
            global_mean = jax.lax.pmean(jnp.mean(flat), mc_axis)
            flat = flat * (mean_target_contract(contract) / global_mean)
        put = df * jnp.maximum(strike - flat, 0.0)
        local_sum = local_spectrum_sum(
            put, batches=local_rows, network_size=sim.network_size
        )
        return jax.lax.psum(local_sum, mc_axis) / sim.batches_per_mc_run

    def one_batch(carry: Carry, _: None) -> tuple[Carry, tuple[jax.Array, jax.Array]]:
        params, bn_state = carry["params"], carry["bn_state"]
        opt_state = carry["opt_state"]
        sobol_skip, mc_skip = carry["sobol_skip"], carry["mc_skip"]
        dp_idx = jax.lax.axis_index(dp_axis).astype(jnp.uint32)
        mc_idx = jax.lax.axis_index(mc_axis).astype(jnp.uint32)

        start = sobol_skip + dp_idx * jnp.uint32(local_b)
        unit = sobol_unit(table.directions, table.shift, start, local_b, dtype)
        contracts = scale_to_bounds(unit, lower, upper)  # [local_b, 6]
        draws = mc_skip + dp_idx * jnp.uint32(local_b) + jnp.arange(local_b, dtype=jnp.uint32)
        spectrum_one = lambda d, c: mc_spectrum_local(d, c, mc_idx)  # noqa: E731
        if contract_chunk is None or contract_chunk >= local_b:
            specs = jax.vmap(spectrum_one)(draws, contracts)
        else:
            chunks = local_b // contract_chunk
            specs = jax.lax.map(
                lambda args: jax.vmap(spectrum_one)(*args),
                (
                    draws.reshape(chunks, contract_chunk),
                    contracts.reshape(chunks, contract_chunk, contracts.shape[-1]),
                ),
            ).reshape(local_b, sim.network_size)
        inputs = normalize_fn(contracts)  # MC keeps raw market units

        def loss_fn(p: PyTree, s: PyTree) -> tuple[jax.Array, PyTree]:
            out_re, out_im, new_s = model.apply(
                p, s, inputs, jnp.zeros_like(inputs), train=True
            )
            loss = jnp.mean(jnp.square(out_re - specs.real.astype(dtype))) + jnp.mean(
                jnp.square(out_im - specs.imag.astype(dtype))
            )
            return loss, new_s

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, bn_state)
        loss = jax.lax.pmean(loss, dp_axis)
        grads = jax.lax.pmean(grads, dp_axis)
        # keep BN running stats replicated across contract shards
        new_bn = jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, dp_axis), new_bn)
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


def make_sharded_segment(
    model: CVNN,
    sim: SimulationParams,
    table: SobolTable,
    *,
    batch_size: int,
    learning_rate: float,
    spec: MeshSpec,
    length: int,
    normalize_inputs: bool = False,
    contract_chunk: int | None = None,
    lr_schedule: LRScheduleConfig | None = None,
) -> Callable[[Carry], tuple[Carry, tuple[jax.Array, jax.Array]]]:
    """Jitted ``shard_map``-wrapped scan over ``length`` sharded batches.

    The whole segment lives inside one ``shard_map`` so per-batch collectives
    stay inside the compiled loop — the host sees one dispatch per segment.
    Carry leaves are replicated (``P()``); metrics come back replicated too.
    """
    one_batch = make_sharded_batch(
        model,
        sim,
        table,
        batch_size=batch_size,
        learning_rate=learning_rate,
        spec=spec,
        normalize_inputs=normalize_inputs,
        contract_chunk=contract_chunk,
        lr_schedule=lr_schedule,
    )

    def scanned(carry: Carry) -> tuple[Carry, tuple[jax.Array, jax.Array]]:
        return jax.lax.scan(one_batch, carry, None, length=length)

    sharded = jax.shard_map(
        scanned,
        mesh=spec.mesh,
        in_specs=(P(),),
        out_specs=(P(), (P(), P())),
        check_vma=False,
    )
    return jax.jit(sharded)
