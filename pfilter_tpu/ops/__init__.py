"""Pure compute kernels (jnp / Pallas) for the TPU-native PFilter engine."""
