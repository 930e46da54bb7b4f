"""Operational cold-start control: compile the production kernel set
before tile 0.

On the TPU backend, Mosaic (Pallas) kernels compile per shape bucket and
are memoized only in-process (the persistent XLA cache does not retain
them), so a cold run would otherwise interleave minutes-long kernel
compiles with the first tiles' compute. ``prewarm_*`` run one all-zeros
batch through the jitted sharded step at the production bucket shapes:
every kernel the epoch run will touch compiles up front, and all
subsequent batches execute warm. Drivers expose this as ``--prewarm``
(or config ``prewarm: true``).

The zeros batch is masked empty, so the warm-up step does no meaningful
work and writes nothing.
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["prewarm_fusion3d_sharded", "prewarm_f2s3_sharded"]


def _zero_batch(n_dev: int, N: int, M: int):
    import jax
    import jax.numpy as jnp

    src = jnp.zeros((n_dev, N, 3), jnp.float32)
    tgt = jnp.zeros((n_dev, M, 3), jnp.float32)
    smask = jnp.zeros((n_dev, N), bool).at[:, :8].set(True)
    tmask = jnp.zeros((n_dev, M), bool).at[:, :8].set(True)
    keys = jax.random.split(jax.random.PRNGKey(0), n_dev)
    return src, smask, tgt, tmask, keys


def prewarm_fusion3d_sharded(
    step,
    n_dev: int,
    N: int,
    M: int,
    *,
    pix_cap: int | None = None,
    n_image_pairs: int = 1,
    logger=None,
) -> float:
    """Compile a ``make_sharded_fusion3d_step`` program (and every Mosaic
    kernel inside) on an empty batch. Pass ``pix_cap`` for a step built
    with ``with_image_inputs=True`` (full RGB+3D fusion). Returns the
    compile wall time."""
    import jax.numpy as jnp

    src, smask, tgt, tmask, keys = _zero_batch(n_dev, N, M)
    scal = lambda v, dt=jnp.float32: jnp.full((n_dev,), v, dt)
    args = (
        src, smask, tgt, tmask, keys,
        scal(10.0), scal(0.1), scal(0.0),
        scal(10, jnp.int32), scal(10, jnp.int32), scal(0.5), scal(0.15),
    )
    if pix_cap is not None:
        eye4 = jnp.broadcast_to(
            jnp.eye(4, dtype=jnp.float32), (n_dev, n_image_pairs, 4, 4)
        )
        args = args + (
            jnp.zeros((n_dev, n_image_pairs, pix_cap, 4), jnp.float32),
            jnp.zeros((n_dev, n_image_pairs), jnp.int32),
            jnp.broadcast_to(
                jnp.eye(3, dtype=jnp.float32), (n_dev, 3, 3)
            ),
            eye4,
            eye4,
            jnp.zeros((n_dev, 3), jnp.float32),
            scal(5.0),
        )
    t0 = time.perf_counter()
    out = step(*args)
    np.asarray(out.valid[:1, :1])
    dt = time.perf_counter() - t0
    if logger:
        logger.info(
            "prewarm: fusion sharded step compiled for (%d, %d/%d) "
            "in %.1f s", n_dev, N, M, dt,
        )
    return dt


def prewarm_f2s3_sharded(
    step, n_dev: int, N: int, M: int, *, logger=None
) -> float:
    """Compile a ``make_sharded_f2s3_step`` program on an empty batch."""
    import jax.numpy as jnp

    src, smask, tgt, tmask, keys = _zero_batch(n_dev, N, M)
    t0 = time.perf_counter()
    out = step(
        src, smask, tgt, tmask, keys,
        jnp.zeros((n_dev,), jnp.float32),
        jnp.zeros((n_dev,), jnp.float32),
    )
    np.asarray(out.keep[:1, :1])
    dt = time.perf_counter() - t0
    if logger:
        logger.info(
            "prewarm: f2s3 sharded step compiled for (%d, %d/%d) in %.1f s",
            n_dev, N, M, dt,
        )
    return dt
