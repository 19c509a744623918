"""Real multi-process (2-host simulation) tests for parallel/multihost.py.

Spawns two Python processes that bootstrap jax.distributed over localhost
(the DCN analogue) on the CPU backend, shard a dataset per host, and
aggregate metrics across hosts. Single-process sharding invariants are
tested in-process.
"""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from adam_dehaze_tpu.parallel.multihost import HostShardedDataset


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def load(self, idx):
        return {"v": np.float32(idx)}


def test_host_sharding_partition():
    """Strided shards partition the dataset: disjoint, complete, balanced."""
    base = _ToyDataset(23)
    shards = [HostShardedDataset(base, index=i, count=4) for i in range(4)]
    seen = []
    for s in shards:
        seen.extend(s.indices)
        assert len(s) in (5, 6)
        # every shard can actually load
        assert s.load(0)["v"] == s.indices[0]
    assert sorted(seen) == list(range(23))


_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid = sys.argv[1], int(sys.argv[2])

    from adam_dehaze_tpu.parallel import multihost
    info = multihost.initialize(coordinator_address=f"localhost:{port}",
                                num_processes=2, process_id=pid)
    assert info["process_count"] == 2, info

    # Per-host data slice of a global batch
    sl = multihost.host_data_slice(8)
    assert sl == slice(pid * 4, pid * 4 + 4), sl

    # Cross-host metric aggregation over DCN (allgather)
    m = multihost.all_hosts_mean(float(pid))
    assert abs(m - 0.5) < 1e-6, m
    t = multihost.all_hosts_mean_tree({"a": float(pid), "b": 2.0 * pid})
    assert abs(t["a"] - 0.5) < 1e-6 and abs(t["b"] - 1.0) < 1e-6, t

    # Host-sharded dataset: the two hosts see disjoint halves
    class Toy:
        def __len__(self):
            return 10
        def load(self, i):
            return i
    ds = multihost.HostShardedDataset(Toy())
    assert ds.indices == list(range(pid, 10, 2)), ds.indices
    print(f"WORKER_OK {pid}")
""")


@pytest.mark.slow
def test_two_process_dcn_aggregation(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # one device per process
    env["PYTHONPATH"] = "/root/repo"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [subprocess.Popen([sys.executable, str(script), str(port), str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out


def test_get_dataloader_is_host_sharded(tmp_path, monkeypatch):
    """get_dataloader/get_detection_dataloader transparently restrict to
    this host's shard when running multi-process (identity single-process):
    simulated 2-host run sees half the samples, disjoint across hosts."""
    import jax

    from adam_dehaze_tpu.data.dataset import get_dataloader
    from adam_dehaze_tpu.data.preprocessing import generate_synthetic_dataset

    root = str(tmp_path / "corpus")
    generate_synthetic_dataset(root, n_per_class=8, size=16, seed=0)
    cfg = {"dataset": {"train_path": root, "val_path": root, "test_path": root,
                       "img_size": 16, "batch_size": 2, "num_workers": 1},
           "seed": 0}

    full = get_dataloader(cfg, "train")
    n_full = len(full.dataset)
    assert n_full > 0

    seen = []
    for pid in (0, 1):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        shard = get_dataloader(cfg, "train")
        assert len(shard.dataset) in (n_full // 2, (n_full + 1) // 2)
        seen.extend(shard.dataset.indices)
    assert sorted(seen) == list(range(n_full))
