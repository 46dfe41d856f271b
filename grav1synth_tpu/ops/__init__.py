"""Device-side grain math: synthesis kernels, photon noise, estimation."""
