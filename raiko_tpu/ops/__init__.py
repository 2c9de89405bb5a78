"""TPU compute kernels (JAX + Pallas): hashing, NTT, MSM, Merkle, FRI."""
