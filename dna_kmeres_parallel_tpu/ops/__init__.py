"""Device compute: encoding, histograms, distances — jnp paths and Pallas kernels."""
