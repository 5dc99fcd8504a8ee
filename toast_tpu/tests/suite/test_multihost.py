"""Multi-process (multi-host analog) execution tests.

Launches real OS processes that form a ``jax.distributed`` cluster on the
CPU backend, splits them into observation groups with ``Comm``, simulates
disjoint observations per group, and reduces the binned map across
processes — the reference's group-parallel pattern
(``ref:src/toast/mpi.py:113-272``, ``ref:src/toast/dist.py:49``) driven
end-to-end over the DCN-analog (process collectives) rather than mocks.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import toast_tpu as _tt

# directory containing the toast_tpu package (repo root, or site-packages
# for an installed copy) — inserted into worker sys.path
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(_tt.__file__)))

_WORKER = r"""
import json
import os
import sys

sys.path.insert(0, os.environ["TOAST_TPU_REPO"])

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from toast_tpu import ops
from toast_tpu.models import (
    Data,
    SpaceSite,
    Telescope,
    create_satellite_schedule,
    fake_hexagon_focalplane,
)
from toast_tpu.parallel import Comm, multihost
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity
from datetime import datetime, timezone

nproc = int(os.environ["TOAST_NUM_PROCESSES"])
rank = int(os.environ["TOAST_PROCESS_ID"])
multihost.initialize()
assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == rank

# one process per group: two groups each own half the observations
comm = Comm(groupsize=1)
assert comm.ngroups == nproc

fp = fake_hexagon_focalplane(
    n_pix=2,
    sample_rate=Quantity(10.0, u.Hz),
    psd_net=Quantity(0.05, u.K_sqrt_s),
)
tele = Telescope("mh", focalplane=fp, site=SpaceSite("L2"))
schedule = create_satellite_schedule(
    prefix="mh",
    mission_start=datetime(2027, 1, 1, tzinfo=timezone.utc),
    observation_time=Quantity(120.0, u.second),
    gap_time=Quantity(0.0, u.second),
    num_observations=4,
    prec_period=Quantity(10.0, u.minute),
    spin_period=Quantity(2.0, u.minute),
)

data = Data(comm)
ops.SimSatellite(telescope=tele, schedule=schedule, hwp_rpm=6.0).apply(data)

# each group must own a disjoint subset covering all observations
names = sorted(ob.name for ob in data.obs)
all_names = sorted(n for grp in comm.allgather(names) for n in grp)
assert len(all_names) == 4, all_names
assert len(set(all_names)) == 4, all_names

ops.DefaultNoiseModel().apply(data)
det_pointing = ops.PointingDetectorSimple()
pixels = ops.PixelsHealpix(
    nside=16, detector_pointing=det_pointing, create_dist="pix_dist"
)
weights = ops.StokesWeights(
    mode="IQU", detector_pointing=det_pointing, hwp_angle="hwp_angle"
)
ops.SimNoise().apply(data)

cov_and_hits = ops.CovarianceAndHits(
    pixel_dist="pix_dist", pixel_pointing=pixels, stokes_weights=weights
)
cov_and_hits.apply(data)
binner = ops.BinMap(
    pixel_dist="pix_dist",
    covariance=cov_and_hits.covariance,
    pixel_pointing=pixels,
    stokes_weights=weights,
)
binner.apply(data)

out = {
    "rank": rank,
    "hits": np.asarray(data[cov_and_hits.hits].numpy()).sum(axis=-1).tolist(),
    "map_sum": float(np.abs(np.asarray(data[binner.binned].numpy())).sum()),
}
with open(os.environ["TOAST_MH_OUT"] + f".{rank}", "w") as f:
    json.dump(out, f)
"""


_REDIST_WORKER = r"""
import json
import os
import sys

sys.path.insert(0, os.environ["TOAST_TPU_REPO"])

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from toast_tpu.parallel import multihost
from toast_tpu.parallel.mesh import DET_AXIS, SAMP_AXIS, MeshDist

nproc = int(os.environ["TOAST_NUM_PROCESSES"])
rank = int(os.environ["TOAST_PROCESS_ID"])
multihost.initialize()
assert jax.process_count() == nproc

n_det, n_samp = 4, 12
devs = np.asarray(jax.devices()[: nproc])

# det-major layout: each process owns n_det/nproc detector rows
mesh_det = Mesh(devs.reshape(nproc, 1), (DET_AXIS, SAMP_AXIS))
dist_det = MeshDist(mesh_det)
full = (np.arange(n_det * n_samp, dtype=np.float32)).reshape(n_det, n_samp)
local_rows = full[rank * (n_det // nproc) : (rank + 1) * (n_det // nproc)]
arr = jax.make_array_from_process_local_data(
    dist_det.detdata_sharding(), local_rows, full.shape
)

# global det <-> samp transpose: reshard onto a samp-major mesh (the
# reference's MPI_Alltoallv redistribution, observation_dist.py:807)
mesh_samp = Mesh(devs.reshape(1, nproc), (DET_AXIS, SAMP_AXIS))
dist_samp = MeshDist(mesh_samp)
out = dist_samp.reshard(arr, dist_samp.detdata_sharding())

# every process must now hold ALL detectors for its sample slice
shards = [s for s in out.addressable_shards]
assert len(shards) == 1
block = np.asarray(shards[0].data)
cols = n_samp // nproc
expect = full[:, rank * cols : (rank + 1) * cols]
np.testing.assert_array_equal(block, expect)

# and back: round trip restores the det-major content exactly
back = dist_det.reshard(out, dist_det.detdata_sharding())
blk2 = np.asarray(back.addressable_shards[0].data)
np.testing.assert_array_equal(blk2, local_rows)

with open(os.environ["TOAST_MH_OUT"] + f".{rank}", "w") as f:
    json.dump({"ok": True}, f)
"""


_A2A_WORKER = r"""
import json
import os
import sys

sys.path.insert(0, os.environ["TOAST_TPU_REPO"])

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from toast_tpu.parallel import Comm, multihost
from toast_tpu.pixels import PixelData, PixelDistribution

nproc = int(os.environ["TOAST_NUM_PROCESSES"])
rank = int(os.environ["TOAST_PROCESS_ID"])
multihost.initialize()
comm = Comm()

n_submap, nps = 48, 64
# overlapping hit sets: each process hits its own third plus a shared band
mine = np.arange(rank * 12, rank * 12 + 16) % n_submap
dist = PixelDistribution(
    n_pix=n_submap * nps, n_submap=n_submap, local_submaps=np.unique(mine),
    comm=comm,
)

rng = np.random.default_rng(100 + rank)
vals = np.zeros((n_submap * nps, 3), dtype=np.float32)
for s in np.unique(mine):
    vals[s * nps : (s + 1) * nps] = rng.normal(
        size=(nps, 3)
    ).astype(np.float32)

pd_a = PixelData(dist, n_value=3)
pd_a.set_numpy(vals)
pd_b = PixelData(dist, n_value=3)
pd_b.set_numpy(vals)

pd_a.sync_allreduce()
pd_b.sync_alltoallv()

# reference semantics: after alltoallv each process holds the globally
# reduced values in its LOCAL (hit) submaps; non-hit submaps stay zero
a = pd_a.numpy().reshape(n_submap, nps, 3)
b = pd_b.numpy().reshape(n_submap, nps, 3)
hit_mask = np.zeros(n_submap, dtype=bool)
hit_mask[np.unique(mine)] = True
np.testing.assert_allclose(a[hit_mask], b[hit_mask], rtol=0, atol=1e-6)
assert np.all(b[~hit_mask] == 0.0)

vol = pd_b.last_sync_volume
assert vol["transport"] == "p2p", vol
assert vol["alltoallv_bytes"] < vol["allreduce_bytes"] / 2, vol
# true receive accounting: phase 1 owners receive other hitters'
# contributions, phase 2 hitters receive their reduced non-owned submaps
owner = dist._owner_cache[1]
all_hit = dist._owner_cache[2]
blocks_in = int(
    (all_hit[:, owner == rank].sum() - all_hit[rank, owner == rank].sum())
    + (hit_mask & (owner != rank)).sum()
)
blk = nps * 3 * 4
lo = blocks_in * blk
hi = blocks_in * (blk + 4) + 8 * 2 * (nproc - 1)
assert lo <= vol["alltoallv_bytes"] <= hi, (vol, blocks_in)

with open(os.environ["TOAST_MH_OUT"] + f".{rank}", "w") as f:
    json.dump({"ok": True, "volume": vol}, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("nproc", [2])
def test_two_process_redistribution(tmp_path, nproc):
    """Global det<->samp transpose across processes (reference
    ``observation_dist.redistribute``): reshard moves every detector row
    to the process owning its sample columns and back, bit-exactly."""
    port = _free_port()
    outbase = str(tmp_path / "rd_out")
    script = tmp_path / "rd_worker.py"
    script.write_text(_REDIST_WORKER)
    procs = []
    for rank in range(nproc):
        env = dict(os.environ)
        env.update(
            TOAST_TPU_REPO=_REPO,
            TOAST_COORDINATOR=f"127.0.0.1:{port}",
            TOAST_NUM_PROCESSES=str(nproc),
            TOAST_PROCESS_ID=str(rank),
            TOAST_MH_OUT=outbase,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )
        env.pop("JAX_PLATFORM_NAME", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    for rank in range(nproc):
        with open(f"{outbase}.{rank}") as f:
            assert json.load(f)["ok"]


@pytest.mark.parametrize("nproc", [2])
def test_two_process_group_sim_and_binning(tmp_path, nproc):
    port = _free_port()
    outbase = str(tmp_path / "mh_out")
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for rank in range(nproc):
        env = dict(os.environ)
        env.update(
            TOAST_TPU_REPO=_REPO,
            TOAST_COORDINATOR=f"127.0.0.1:{port}",
            TOAST_NUM_PROCESSES=str(nproc),
            TOAST_PROCESS_ID=str(rank),
            TOAST_MH_OUT=outbase,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        env.pop("JAX_PLATFORM_NAME", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = []
    for rank in range(nproc):
        with open(f"{outbase}.{rank}") as f:
            results.append(json.load(f))

    # hit maps were synced across processes: all ranks hold the global sum
    hits = [np.asarray(r["hits"]) for r in results]
    for h in hits[1:]:
        np.testing.assert_array_equal(hits[0], h)
    # 4 obs x (1 + 120 s x 10 Hz) samples x 4 dets of global hits
    assert hits[0].sum() == 4 * 1201 * 4
    # binned noise maps are identical on every process after allreduce
    sums = [r["map_sum"] for r in results]
    assert all(s > 0 for s in sums)
    np.testing.assert_allclose(sums, sums[0], rtol=1e-6)


@pytest.mark.parametrize("nproc", [2])
def test_two_process_alltoallv_map_sync(tmp_path, nproc):
    """Owner-based submap sync equals the dense allreduce with less
    transferred volume (reference Alltoallv path, ``pixels.py:878-970``)."""
    port = _free_port()
    outbase = str(tmp_path / "a2a_out")
    script = tmp_path / "a2a_worker.py"
    script.write_text(_A2A_WORKER)
    procs = []
    for rank in range(nproc):
        env = dict(os.environ)
        env.update(
            TOAST_TPU_REPO=_REPO,
            TOAST_COORDINATOR=f"127.0.0.1:{port}",
            TOAST_NUM_PROCESSES=str(nproc),
            TOAST_PROCESS_ID=str(rank),
            TOAST_MH_OUT=outbase,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )
        env.pop("JAX_PLATFORM_NAME", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    for rank in range(nproc):
        with open(f"{outbase}.{rank}") as f:
            res = json.load(f)
            assert res["ok"]
            assert res["volume"]["alltoallv_bytes"] < res["volume"]["allreduce_bytes"]
