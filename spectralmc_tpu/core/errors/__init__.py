"""Frozen error ADTs, one module per subsystem.

Capability parity with ``/root/reference/src/spectralmc/errors/*`` — each
subsystem exposes frozen dataclass errors plus a union alias, so failures are
data (carried in ``Result``) rather than exceptions.
"""
