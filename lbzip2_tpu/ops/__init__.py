"""Device kernels (JAX/XLA/Pallas) for the per-block bzip2 stack."""
