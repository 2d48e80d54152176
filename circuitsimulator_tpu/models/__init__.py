"""Device models: vectorized evaluation + NR linearization."""
