"""Multi-process distributed decode: real `jax.distributed` processes on
localhost reproduce the single-process stats bit-exactly.

This is the validation the virtual 8-device in-process mesh
(test_sharded.py) cannot give: separate interpreters, a real coordinator,
gloo cross-process collectives, per-process mmap slicing of the capture
file, and `make_array_from_single_device_arrays` global assembly
(shard/distributed.py) — the pod path with everything but the TPU chips.
The reference reader is strictly single-process (SURVEY.md section 2.5).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.io.tracefile import write_trace
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.shard.launch import run_local
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory

CFG = ReaderConfig(max_events=256)


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    tr = synthesize_inventory(CFG, [Tag.with_id(27, seed=7)], n_rounds=6,
                              seed=5)
    path = str(tmp_path_factory.mktemp("dist") / "cap.bin")
    write_trace(path, tr.iq)
    stats, _ = decode_capture(jnp.asarray(tr.iq), CFG)
    expected = {
        "n_queries": int(stats.n_queries),
        "n_epc_correct": int(stats.n_epc_correct),
        "round": int(stats.cur_inventory_round),
        "tag_reads": {
            str(t): int(np.asarray(stats.tag_reads)[t])
            for t in np.nonzero(np.asarray(stats.tag_reads))[0]
        },
    }
    assert expected["n_epc_correct"] == tr.expected_epc_pass
    return path, expected


@pytest.mark.parametrize("num_processes,devs", [(2, 2), (4, 1)])
def test_multiprocess_matches_single(capture, num_processes, devs):
    path, expected = capture
    rec = run_local(path, num_processes=num_processes, cpu_devices=devs,
                    events_per_shard=64, max_events=CFG.max_events,
                    timeout=300.0)
    assert rec["num_processes"] == num_processes
    assert rec["n_devices"] == num_processes * devs
    # JSON round-trips tag ids as strings.
    got_reads = {str(k): v for k, v in rec["tag_reads"].items()}
    assert (rec["n_queries"], rec["n_epc_correct"], rec["round"]) == (
        expected["n_queries"], expected["n_epc_correct"], expected["round"])
    assert got_reads == expected["tag_reads"]
