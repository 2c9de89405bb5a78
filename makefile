# raiko-tpu make targets (reference makefile:1-17 analog).
# TARGET selects the prover backend for test/bench where applicable
# (native | tee | tpu_stark | tpu_shard), mirroring the reference's
# TARGET=risc0|sp1|sgx|native.

PY ?= python
TARGET ?= native

install:
	$(PY) -m pip install -e .

native:
	$(MAKE) -C native

test:
	$(PY) -m pytest tests/ -x -q -m "not slow"

test-all:
	$(PY) -m pytest tests/ -x -q

test-multichip:
	$(PY) -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

test-multihost:
	$(PY) tools/multihost_sim.py --nprocs 2

bench:
	$(PY) bench.py

serve:
	$(PY) -m raiko_tpu.host.cli --port 8080

NETWORK ?= taiko_a7
BLOCK ?= 1

prove-block:
	$(PY) tools/prove_block.py $(NETWORK) $(TARGET) $(BLOCK)

fmt:
	$(PY) -m black raiko_tpu tests tools 2>/dev/null || true

.PHONY: install native test test-all test-multichip test-multihost bench serve prove-block fmt
