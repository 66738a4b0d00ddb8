"""TPU-native Sequential Convex Programming engine for multi-vehicle
collision-free path planning.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
``jankammeth/BA-path-planning`` package: same public API surface
(``SCP``, ``generate_positions``, ``make_boxplot`` — reference
``src/path_planning/__init__.py:1-5``) plus the batched, sharded TPU API.
"""

__version__ = "0.1.0"
