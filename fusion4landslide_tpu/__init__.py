"""fusion4landslide_tpu — TPU-native point-cloud deformation-monitoring framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
gseg-ethz/fusion4landslide (terrestrial-laser-scanning landslide monitoring):
given two co-registered point-cloud epochs, estimate a dense 3D displacement
vector field (DVF) with one of four method pipelines:

- ``fusion`` / ``fusion_3d``  — superpoint partition + coarse-to-fine matching
- ``rgb_guided``              — dense 2D image matching lifted to 3D
- ``f2s3``                    — per-point learned descriptors + kNN + outlier filtering
- ``piecewise_icp``           — octree-cell centroid matching baseline

Everything between "points in HBM" and "DVF out" is fixed-shape, jit-compiled
JAX; hot kernels (blocked kNN / top-k) are Pallas; multi-tile execution shards
over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
