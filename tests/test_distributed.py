"""Multi-host input sharding + jax.distributed smoke (VERDICT round-1 #5/#8).

1. Host-side shard coverage: with ``shard_count`` N, the N loaders' epochs
   must cover the dataset disjointly and exhaustively, with one consistent
   global permutation (SURVEY.md §2.11 host-side input sharding layer).
2. A real 2-process ``jax.distributed`` smoke on CPU: both processes
   initialise through ``parallel/distributed.initialize``, see the global
   device view, and assemble a process-spanning global array.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from pitchextractor_tpu.data.loader import DataLoader

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _IndexDataset:
    """Returns its own indices so batches reveal exactly what was sampled."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return int(i)


def _epoch_indices(loader):
    return [int(i) for batch in loader for i in batch]


def test_loader_shard_coverage_disjoint_exhaustive():
    n, shards, bs = 64, 4, 4
    loaders = [
        DataLoader(
            _IndexDataset(n),
            batch_size=bs,
            shuffle=True,
            drop_last=True,
            num_workers=0,
            collate_fn=lambda items: np.asarray(items),
            shard_index=k,
            shard_count=shards,
        )
        for k in range(shards)
    ]
    per_shard = [_epoch_indices(ld) for ld in loaders]
    for k, idx in enumerate(per_shard):
        assert len(idx) == n // shards, (k, len(idx))
        assert len(set(idx)) == len(idx)  # no duplicates within a shard
    union = set().union(*map(set, per_shard))
    assert union == set(range(n))  # exhaustive
    assert sum(map(len, per_shard)) == n  # disjoint
    # every loader reports the sharded length
    assert all(len(ld) == (n // shards) // bs for ld in loaders)


def test_loader_shard_permutation_consistent_across_epochs():
    """Shards slice the SAME global permutation (seeded by epoch), so
    coverage stays disjoint every epoch, and epochs differ from each other."""
    n, shards = 32, 2
    make = lambda k: DataLoader(
        _IndexDataset(n),
        batch_size=4,
        shuffle=True,
        drop_last=True,
        num_workers=0,
        collate_fn=lambda items: np.asarray(items),
        shard_index=k,
        shard_count=shards,
    )
    a, b = make(0), make(1)
    ep1 = [_epoch_indices(a), _epoch_indices(b)]
    ep2 = [_epoch_indices(a), _epoch_indices(b)]
    assert set(ep1[0]) | set(ep1[1]) == set(range(n))
    assert set(ep2[0]) | set(ep2[1]) == set(range(n))
    assert not (set(ep1[0]) & set(ep1[1]))
    assert ep1[0] != ep2[0]  # reshuffled between epochs


_SMOKE_SCRIPT = textwrap.dedent(
    """
    import os, sys
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from pitchextractor_tpu.parallel.distributed import initialize

    pid = int(sys.argv[1]); port = sys.argv[2]
    initialize(coordinator_address=f"127.0.0.1:{{port}}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2, jax.devices()
    assert len(jax.local_devices()) == 1

    # global array spanning both processes (the input-pipeline contract:
    # per-host shards assemble into one logical batch)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    local = np.full((1, 4), float(jax.process_index() + 1), np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, global_shape=(2, 4)
    )
    assert garr.shape == (2, 4)

    # loader shard defaults must follow the process topology
    from pitchextractor_tpu.data import loader as loader_mod

    assert (jax.process_index(), jax.process_count()) == (pid, 2)
    print("SMOKE-OK", pid, flush=True)
    """
)


@pytest.mark.slow
def test_jax_distributed_two_process_smoke(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "smoke.py"
    script.write_text(_SMOKE_SCRIPT.format(repo=REPO_ROOT))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"SMOKE-OK {pid}" in out


def test_pallas_kernels_under_dp_mesh_loss_parity(monkeypatch):
    """Round-3 #7: the Pallas recurrence kernels must compile and execute
    under a sharded (pure-DP) mesh — they wrap themselves in shard_map over
    the data axis (ops/lstm_pallas.set_sharding_mesh, installed by the
    Trainer).  Interpret mode stands in for the TPU kernel on the simulated
    8-device CPU mesh; loss must match the scan path on the same batch."""
    import jax

    import pitchextractor_tpu.models.jdc as jdc_mod
    import pitchextractor_tpu.models.sequence as seq
    import pitchextractor_tpu.ops.lstm_pallas as lstm_mod
    from tests.test_train import _synthetic_batches, _tiny_trainer
    from pitchextractor_tpu.parallel import make_mesh

    assert len(jax.devices()) == 8
    batches = _synthetic_batches(n_batches=2, B=16, T=24)

    mesh = make_mesh()  # (8, 1) pure DP
    ref_trainer = _tiny_trainer(batches, batches[:1], mesh=mesh)
    ref = ref_trainer._train_epoch()
    lstm_mod.set_sharding_mesh(None)

    monkeypatch.setattr(lstm_mod, "_INTERPRET", True)
    monkeypatch.setattr(seq, "_lstm_use_pallas", lambda: True)
    monkeypatch.setattr(jdc_mod, "_lstm_use_pallas", lambda: True)
    # H=16 in TINY_SEQ isn't lane-aligned on hardware, but interpret mode has
    # no tiling (lane_aligned() is True under _INTERPRET)
    try:
        pal_trainer = _tiny_trainer(batches, batches[:1], mesh=mesh)
        assert lstm_mod._ACTIVE_MESH is mesh  # Trainer installed the mesh
        pal = pal_trainer._train_epoch()
    finally:
        lstm_mod.set_sharding_mesh(None)

    np.testing.assert_allclose(pal["train/loss"], ref["train/loss"], rtol=2e-3)
