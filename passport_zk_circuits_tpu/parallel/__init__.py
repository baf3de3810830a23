"""Mesh/sharding utilities: batch-axis SPMD over TPU slices."""
