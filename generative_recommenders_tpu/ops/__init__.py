"""Ops layer: jagged/padded libraries, masks, norms, HSTU attention
(XLA executable spec + Pallas TPU kernels), fused compute, positional op."""
