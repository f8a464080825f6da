"""Hand-written TPU kernels (Pallas) for the hot server-side ops."""
