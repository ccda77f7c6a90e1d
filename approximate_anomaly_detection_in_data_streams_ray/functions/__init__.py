"""Vectorized per-batch kernels: hashing, sketches, text analysis, distance.

The reference's scalar functions (Euclidean distance `MCODBase.java:229-239`,
dot product `DataObj.java:51-59`, LSH hash `HashFunction.java:13-40`) map to
numpy/pyarrow.compute kernels here; everything operates on whole Arrow
batches, never row-at-a-time.
"""
