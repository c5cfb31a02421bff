"""Collective-communication helpers (reference ``pcdet/utils/commu_utils.py``).

The reference wraps torch.distributed (pickle-tensor all_gather:50,
reduce_dict:114, average_reduce_value:143).  Under JAX, collectives INSIDE a
jitted program are just ``jax.lax.psum/pmean`` over a mesh axis — these
helpers cover the reference's HOST-side use cases (metric reduction, ordered
result gathering) for multi-process deployments, degrading to no-ops in the
single-process case.
"""

import jax
import jax.numpy as jnp
import numpy as np


def get_world_size():
    return jax.process_count()


def get_rank():
    return jax.process_index()


def all_gather(data_list):
    """Gather a list of numpy arrays from every process (reference
    all_gather:50).  Single-process: identity."""
    if jax.process_count() == 1:
        return [data_list]
    from jax.experimental import multihost_utils
    flat = np.concatenate([np.ravel(np.asarray(x)) for x in data_list])
    gathered = multihost_utils.process_allgather(flat)
    return list(gathered)


def average_reduce_value(value):
    """Mean of a scalar across processes (reference :143)."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils
    vals = multihost_utils.process_allgather(jnp.asarray(float(value)))
    return float(np.mean(np.asarray(vals)))


def reduce_dict(d, average=True):
    """Mean/sum-reduce every value of a scalar dict (reference :114)."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in d.items()}
    return {k: average_reduce_value(v) if average else
            average_reduce_value(v) * jax.process_count()
            for k, v in d.items()}


# in-jit collectives (the data-parallel training path)
def psum(x, axis_name="data"):
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name="data"):
    return jax.lax.pmean(x, axis_name)


def concat_all_gather(x, axis_name="data"):
    """(reference concat_all_gather:172) in-jit all-gather along the mesh."""
    return jax.lax.all_gather(x, axis_name, tiled=True)


def merge_results_dist(result_part, size, tmpdir=None):
    """Ordered multi-process eval-result merge (reference
    ``common_utils.merge_results_dist:229-251``).  The reference pickles
    each rank's part to a shared filesystem and rank 0 interleaves
    ``zip(*parts)`` back to dataset order; here the pickled parts ride a
    padded-uint8 ``process_allgather`` (no NFS rendezvous) and EVERY
    process gets the ordered list (the reference returns None off-rank-0).
    ``tmpdir`` is accepted for signature parity and unused."""
    if jax.process_count() == 1:
        return list(result_part)[:size]
    import itertools
    import pickle
    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(list(result_part)), np.uint8)
    # int32 on purpose: JAX's default x64-disabled config would silently
    # downcast an int64 here anyway; assert instead of wrapping negative
    assert blob.size < 2 ** 31, \
        f"result part too large to gather in one blob ({blob.size} B); " \
        "split the eval into smaller result chunks"
    sizes = np.asarray(multihost_utils.process_allgather(
        jnp.asarray([blob.size], jnp.int32))).ravel()
    m = int(sizes.max())
    pad = np.zeros(m, np.uint8)
    pad[:blob.size] = blob
    gathered = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(pad)))
    parts = [pickle.loads(gathered[i, :int(sizes[i])].tobytes())
             for i in range(gathered.shape[0])]
    ordered = []
    for tup in itertools.zip_longest(*parts):
        ordered.extend(t for t in tup if t is not None)
    return ordered[:size]
