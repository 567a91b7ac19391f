"""Multi-process (DCN-regime) scale-out: REAL jax.distributed processes.

Functional gate for SURVEY.md §2.3's communication-backend row: the
channel-sharded receiver executes over a mesh spanning OS processes
(jax.distributed + cross-process runtime — the same machinery a TPU pod
uses over DCN), with the time-axis halo structurally confined to each
process's local devices.  The timed ≥95%-efficiency measurement lives in
scripts/multihost_scaling.py -> SCALING_r3.json (timing gates would flake
in CI on this shared host; the efficiency artifact is produced offline,
with the raw and contention-controlled numbers gated separately).
"""

import importlib.util
import os
import sys

import pytest

_SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                       "multihost_scaling.py")


def _load():
    spec = importlib.util.spec_from_file_location("multihost_scaling",
                                                  _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(autouse=True)
def _tiny_workload(monkeypatch):
    # keep the subprocess workers fast: constants are env-overridable and
    # inherited by the spawned worker processes
    monkeypatch.setenv("SDR_SCALING_CH", "2")
    monkeypatch.setenv("SDR_SCALING_BLOCKS", "4")
    monkeypatch.setenv("SDR_SCALING_REPS", "1")
    monkeypatch.setenv("SDR_SCALING_ROUNDS", "2")


class TestMultiProcessMesh:
    def test_2proc_channel_mesh_runs(self):
        """Two real jax.distributed processes run the channel-sharded
        receiver over one global mesh; finite throughput from both."""
        mod = _load()
        r = mod._run_config(2, local_devices=1,
                            ncores=os.cpu_count() or 1, timeout_s=420.0)
        assert r["num_processes"] == 2
        assert r["global_devices"] == 2
        assert r["channels_global"] == 4
        assert r["aggregate_samples_per_s"] > 0
        assert r["halo_confined_to_host"]

    def test_2proc_2dev_2d_mesh_halo_local(self):
        """2 processes x 2 local devices: the (ch x time) grid keeps every
        time row on ONE process, so halo ppermutes never cross DCN."""
        mod = _load()
        r = mod._run_config(2, local_devices=2,
                            ncores=os.cpu_count() or 1, timeout_s=420.0)
        assert r["global_devices"] == 4
        assert r["halo_confined_to_host"]
        assert r["aggregate_samples_per_s"] > 0

    def test_2proc_cross_process_halo(self):
        """The halo ppermute EXECUTED across the process boundary
        (VERDICT r4 #3): mesh transposed so every time row spans both
        processes, and the linear arms still bit-match a contiguous run
        — the correctness claim behind the 'halo stays on ICI' policy,
        now validated rather than assumed."""
        mod = _load()
        r = mod._run_time_axis(2, local_devices=2,
                               ncores=os.cpu_count() or 1,
                               timeout_s=600.0, cross=True)
        assert r["mesh_shape"] == {"ch": 2, "time": 2}
        assert not r["halo_intra_process"]      # it really crossed DCN
        assert r["fm_max_abs_err_vs_contiguous"] == 0.0
        assert r["mono_rel_rms_vs_contiguous"] < 1e-4
        assert r["aggregate_samples_per_s"] > 0

    def test_2proc_time_axis_sharded_receiver(self):
        """The TIME-SHARDED receiver itself under jax.distributed
        (VERDICT r2 #6): halo ppermute provably intra-process, and the
        sharded outputs match a contiguous run of the same channel —
        fm_demod exactly, mono within the kept-region gate."""
        mod = _load()
        r = mod._run_time_axis(2, local_devices=2,
                               ncores=os.cpu_count() or 1, timeout_s=600.0)
        assert r["mesh_shape"] == {"ch": 2, "time": 2}
        assert r["halo_intra_process"]
        assert r["fm_max_abs_err_vs_contiguous"] == 0.0
        assert r["mono_rel_rms_vs_contiguous"] < 1e-4
        assert r["aggregate_samples_per_s"] > 0
