"""Numeric engines: RNG streams, Sobol QMC, GBM Monte-Carlo, FFT spectrum, analytic oracle."""
