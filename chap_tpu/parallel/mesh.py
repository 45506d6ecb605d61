"""Device mesh + sharding policy.

The reference is single-GPU (SURVEY.md §2.3: no DDP/NCCL anywhere); scaling
over a TPU pod is this rebuild's first-class addition. Policy:

  - one (optionally 2D) mesh: inner ``data`` axis rides ICI within a slice;
    an optional outer ``dcn`` axis spans slices (multi-slice data parallel).
  - params + optimizer state replicated; batches sharded on the batch dim.
  - the train step is a plain jitted function with NamedSharding-annotated
    inputs — XLA inserts the psum gradient reduction over ICI by itself
    (no hand-written collectives in the data-parallel path).
  - evaluation rides the same mesh: 2D slice-eval chunks are device_put with
    batch-dim sharding (eval2d.predict_volume), and the 3D sliding-window
    engine shards each volume's patch grid over every device, merging the
    per-device score/count maps with ONE psum per volume
    (eval/sliding_window.SlidingWindowEngine(mesh=...)).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data_axis: str = "data"
    dcn_axis: str = "dcn"
    dcn_size: int = 1


def build_mesh(num_devices: int = 0, spec: MeshSpec = MeshSpec(),
               devices: Optional[Sequence[Any]] = None) -> Mesh:
    """Mesh over all (or the first N) visible devices.

    dcn_size > 1 splits devices into an outer DCN axis for multi-slice
    data-parallel; within a slice the data axis maps onto ICI neighbours.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    n = len(devs)
    if spec.dcn_size > 1:
        assert n % spec.dcn_size == 0
        arr = np.array(devs).reshape(spec.dcn_size, n // spec.dcn_size)
        return Mesh(arr, axis_names=(spec.dcn_axis, spec.data_axis))
    return Mesh(np.array(devs), axis_names=(spec.data_axis,))


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Shard dim `batch_axis` across ALL mesh axes (dcn x data collapse onto
    the batch), replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = tuple(mesh.axis_names) if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """device_put a pytree of [B,...] arrays with batch-dim sharding."""
    def put(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))
    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


# ---------------------------------------------------------------------------
# Multi-host (multi-process) input: on a real pod each host process only
# loads ITS slice of the global batch; jax.make_array_from_process_local_data
# assembles the per-process local arrays into one globally-sharded jax.Array
# without any cross-host gather. This is what makes the DCN outer axis usable
# beyond one host. In a single-process run it degrades to a plain sharded
# device_put, so trainers call it unconditionally.
# ---------------------------------------------------------------------------

def process_sharded_batch(mesh: Mesh, local_batch: Any, batch_axis: int = 0
                          ) -> Any:
    """Assemble a pytree of PER-PROCESS local [B_local, ...] arrays into
    global batch-sharded arrays (global B = B_local * process_count)."""
    def put(x):
        sharding = batch_sharding(mesh, np.ndim(x), batch_axis)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.tree.map(put, local_batch)


class ProcessLocalBatchSampler:
    """Wrap a global batch sampler so each process yields only ITS contiguous
    slice of every batch — the rows this process must load from disk.

    The slice is CONTIGUOUS in the global batch because
    make_array_from_process_local_data places process p's local rows at the
    global positions of p's devices (device order = global row order): a
    contiguous per-process slice is exactly what reassembles to the
    sampler's global [labeled ; unlabeled] two-stream layout."""

    def __init__(self, sampler, process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.sampler = sampler
        self.rank = (jax.process_index() if process_index is None
                     else process_index)
        self.world = (jax.process_count() if process_count is None
                      else process_count)

    def __len__(self):
        return len(self.sampler)

    def __iter__(self):
        for batch in self.sampler:
            b = len(batch)
            assert b % self.world == 0, \
                f"global batch {b} must divide over {self.world} processes"
            per = b // self.world
            yield batch[self.rank * per:(self.rank + 1) * per]
