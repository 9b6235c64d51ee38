"""Spectrum estimator tests (parity: reference FFT path in gbm_trainer.py:806-817)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spectralmc_tpu.ops.spectrum import (
    local_spectrum_sum,
    payoff_spectrum,
    spectrum_to_price,
)


def test_spectrum_matches_numpy_fft() -> None:
    rng = np.random.default_rng(0)
    payoffs = rng.uniform(size=(8 * 32,)).astype(np.float32)
    spec = np.asarray(payoff_spectrum(jnp.asarray(payoffs), batches=8, network_size=32))
    ref = np.fft.fft(payoffs.reshape(8, 32), axis=1).mean(axis=0)
    np.testing.assert_allclose(spec, ref, rtol=1e-5, atol=1e-5)


def test_price_roundtrip_through_spectrum() -> None:
    rng = np.random.default_rng(1)
    payoffs = rng.uniform(size=(16 * 64,)).astype(np.float64)
    spec = payoff_spectrum(jnp.asarray(payoffs), batches=16, network_size=64)
    price = complex(spectrum_to_price(spec))
    assert abs(price.real - payoffs.mean()) < 1e-12
    assert abs(price.imag) < 1e-12


def test_sharded_spectrum_equals_global() -> None:
    """psum-reduced per-device spectra == single-device batch mean (SURVEY §2.9 DP design)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("paths",))
    batches, network = 16, 32
    rng = np.random.default_rng(2)
    payoffs = jnp.asarray(rng.uniform(size=(batches * network,)))

    def local(p):
        return local_spectrum_sum(p, batches=batches // 8, network_size=network)

    def sharded(p):
        return jax.lax.psum(local(p), "paths") / batches

    fn = shard_map(sharded, mesh=mesh, in_specs=P("paths"), out_specs=P())
    got = np.asarray(fn(payoffs))
    want = np.asarray(payoff_spectrum(payoffs, batches=batches, network_size=network))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)
