"""Constraint system layer (circuit builder, gates, gadget library)."""

from . import gadgets  # noqa: F401  (attaches gadget methods to PlonkCircuit)
