"""Multi-host (DCN) support.

The reference is strictly single-process (SURVEY.md §2.3); this layer is new
design for pod-scale runs: `jax.distributed` process bootstrap, global mesh
construction spanning hosts (ICI within a slice, DCN across), per-host data
sharding, and cross-host metric aggregation.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Dict[str, int]:
    """Bootstrap jax.distributed when running multi-process; no-op for a
    single process. Returns {process_index, process_count, local_devices,
    global_devices}."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def host_data_slice(global_batch: int) -> slice:
    """The contiguous slice of a global batch this host should load —
    per-host data loading so no host reads the full corpus."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def all_hosts_mean(value: float) -> float:
    """Average a host-local scalar metric across processes (DCN allgather);
    identity for a single process."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(value))
    return float(np.mean(gathered))


def all_hosts_mean_tree(tree):
    """Average a pytree of host-local scalar metrics across processes —
    one allgather per leaf batch (multihost_utils handles pytrees)."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(float, tree)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(
        jax.tree_util.tree_map(np.asarray, tree))
    return jax.tree_util.tree_map(lambda g: float(np.mean(g)), gathered)


class HostShardedDataset:
    """View of a dataset restricted to this host's strided shard — per-host
    data loading so no host reads the full corpus. Strided (not contiguous)
    so every host sees every intensity class even in class-grouped listings.

    Composes with any dataset exposing __len__/load (HazyImageDataset,
    FilteredDataset, DetectionDataset)."""

    def __init__(self, base, index: Optional[int] = None,
                 count: Optional[int] = None):
        self.base = base
        self.index = jax.process_index() if index is None else index
        self.count = jax.process_count() if count is None else count
        self.indices = list(range(self.index, len(base), self.count))

    def __len__(self):
        return len(self.indices)

    def load(self, idx: int):
        return self.base.load(self.indices[idx])


def shard_loader_for_host(loader):
    """Rewrap a DataLoader's dataset with this host's shard (identity for a
    single process). The loader keeps its batch size: each host contributes
    `batch` samples to a global batch of `batch * process_count`."""
    if jax.process_count() == 1:
        return loader
    from adam_dehaze_tpu.data.dataset import DataLoader
    ds = HostShardedDataset(loader.dataset)
    # Derive the per-host seed from the loader's configured seed so the
    # multi-host shuffle order stays reproducible from config['seed'].
    base_seed = getattr(loader, "seed", 0) or 0
    return DataLoader(ds, batch_size=loader.batch_size,
                      shuffle=loader.shuffle, num_workers=loader.num_workers,
                      drop_remainder=loader.drop_remainder,
                      seed=base_seed + 1000 * jax.process_index())
