"""Ray Data stages: callable classes for ``map_batches`` actor pools and
vectorized batch functions for stateless tasks."""
