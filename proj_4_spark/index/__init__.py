"""Discrete-global-grid cell indexes (S2, H3) as vectorized NumPy
encoders producing LongType cell-id columns."""
