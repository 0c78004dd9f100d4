# Build / test / bench entry points (the reference's `cmake; make install`
# equivalent, reference README.md:33-38).

PY ?= python
CPU_ENV = env -u PYTHONPATH JAX_PLATFORMS=cpu \
          XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: all native test test-quick bench bench-configs bench-scaling dryrun \
        distributed scaling-model false-accept install clean

all: native

# Ahead-of-time build of the C++ streaming engine (engine.py also builds
# it on demand at first use).
native: gen2_rfid_tpu/native/libgen2_stream.so

gen2_rfid_tpu/native/libgen2_stream.so: gen2_rfid_tpu/native/gen2_stream.cc
	g++ -O3 -march=native -shared -fPIC -std=c++17 $< -o $@

test:
	$(PY) -m pytest tests/ -q

# Quick tier: deselects tests marked slow (>=12 s; see tests/conftest.py
# SLOW_TESTS).  ~<10 min on the 2-core host vs ~40 min full.
test-quick:
	$(PY) -m pytest tests/ -q -m "not slow"

bench:
	$(PY) bench.py

bench-configs:
	$(PY) bench_configs.py

bench-scaling:
	$(CPU_ENV) $(PY) bench_scaling.py

# Evidence artifacts: pod-scaling efficiency model (SCALING_r05.json +
# docs/SCALING.md tables) and the softfix false-accept campaign.
scaling-model:
	$(CPU_ENV) $(PY) tools/scaling_model.py

false-accept:
	$(CPU_ENV) $(PY) tools/softfix_false_accept.py

# Multi-process distributed validation: N real jax.distributed worker
# processes on localhost (gloo CPU collectives) must reproduce the
# single-process decode bit-exactly (shard/launch.py).
distributed:
	$(CPU_ENV) $(PY) -m gen2_rfid_tpu.apps.reader simulate /tmp/dist_cap.bin \
	    --rounds 6 --tags 27 --seed 5
	env -u PYTHONPATH $(PY) tools/run_distributed.py /tmp/dist_cap.bin \
	    --num-processes 2 --cpu-devices-per-proc 4 \
	    --expect-json '{"n_epc_correct": 6, "n_queries": 6, "round": 7}'

dryrun:
	$(CPU_ENV) $(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

install:
	$(PY) -m pip install -e .

clean:
	rm -f gen2_rfid_tpu/native/libgen2_stream.so
