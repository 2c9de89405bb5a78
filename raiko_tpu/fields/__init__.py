"""Finite-field arithmetic over limb-sliced integer arrays (JAX/TPU)."""
