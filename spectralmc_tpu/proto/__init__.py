"""Protobuf wire-format schemas (parity: reference proto/__init__.py shim).

Generated *_pb2 modules are committed; regenerate with tools/regen_proto.py.
"""

from spectralmc_tpu.proto import common_pb2, models_pb2, simulation_pb2, tensors_pb2, training_pb2

__all__ = ["common_pb2", "models_pb2", "simulation_pb2", "tensors_pb2", "training_pb2"]
